"""Property-based differential: the v1 query shape (filter + 5 aggregates)
must match DuckDB for RANDOM thresholds and columns, not just the ladder
constants."""

from __future__ import annotations

import math

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_near_storage_compute_spark.operators.scan_agg import scan_filter_agg

LI = "/root/testdata/sf0.001/lineitem.parquet"
SF = "/root/testdata/sf0.001"


def _duck():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{LI}'")
    return con


def _close(a, b, rel=1e-9):
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) or math.isnan(b):
            return math.isnan(a) and math.isnan(b)
        return abs(a - b) <= rel * max(1.0, abs(a), abs(b))
    return a == b


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    threshold=st.floats(min_value=0, max_value=120000, allow_nan=False).map(
        lambda x: round(x, 2)
    ),
    column=st.sampled_from(["l_extendedprice", "l_quantity", "l_discount"]),
)
def test_random_threshold_flagship(threshold, column, spark):
    got = scan_filter_agg(spark, SF, threshold, column=column).collect()[0]
    want = (
        _duck()
        .execute(
            f"SELECT SUM({column}), AVG({column}), MIN({column}),"
            f" MAX({column}), COUNT({column})"
            f" FROM lineitem WHERE {column} > {threshold}"
        )
        .fetchone()
    )
    pairs = [
        (got.sum_price, want[0]),
        (got.avg_price, want[1]),
        (got.min_price, want[2]),
        (got.max_price, want[3]),
        (float(got.count_price), float(want[4])),
    ]
    for g, w in pairs:
        assert _close(g, w), (threshold, column, pairs)
