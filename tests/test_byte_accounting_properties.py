"""Property-based checks on the v2-style byte accounting: planned bytes are
monotone in the predicate threshold and bounded by [footer, file size]."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_near_storage_compute_spark.plans.metrics import (
    dataset_size,
    footer_bytes,
    planned_scan_bytes,
)

LI = "/root/testdata/sf0.01/lineitem.parquet"


@settings(max_examples=30, deadline=None)
@given(
    t1=st.floats(min_value=0, max_value=120000, allow_nan=False),
    t2=st.floats(min_value=0, max_value=120000, allow_nan=False),
)
def test_planned_bytes_monotone_in_threshold(t1, t2):
    lo, hi = sorted((t1, t2))
    cols = ["l_extendedprice"]
    b_lo = planned_scan_bytes(LI, cols, [("l_extendedprice", ">", lo)])
    b_hi = planned_scan_bytes(LI, cols, [("l_extendedprice", ">", hi)])
    assert b_lo >= b_hi  # higher threshold → fewer surviving row groups
    fb = footer_bytes(LI)
    assert fb <= b_hi and b_lo <= dataset_size([LI])


@settings(max_examples=10, deadline=None)
@given(
    cols=st.sets(
        st.sampled_from(
            ["l_orderkey", "l_quantity", "l_extendedprice", "l_shipdate"]
        ),
        min_size=1,
        max_size=4,
    )
)
def test_planned_bytes_monotone_in_projection(cols):
    some = planned_scan_bytes(LI, sorted(cols))
    full = planned_scan_bytes(LI, None)
    assert footer_bytes(LI) < some <= full
