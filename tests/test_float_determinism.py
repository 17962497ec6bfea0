"""Partition-order invariance for the float-fragile contracts.

Double addition is order-dependent, so any multi-level or post-shuffle
SUM/AVG of doubles can change in the last ulps when the shuffle layout
changes — the failure mode that flaked ``join_outer_full`` in the round-4
driver window (a few-ulp drift at 1.6e9 magnitude, outside the driver's
hash epsilon, invisible to the local 9-digit rounding of the day).

Each contract here runs twice with different ``spark.sql.shuffle.
partitions`` and must produce BIT-IDENTICAL output (``repr`` equality on
every float) — engine exactness by construction, not tolerance. The full
registry-wide version of this check is ``tools/float_exactness_audit.py``
(run per-round); this pytest pins the contracts the audit ever flagged
plus the big-magnitude aggregate chains the verdict called out.
"""

from __future__ import annotations

from parquet_near_storage_compute_spark.registry import all_queries

#: Flagged UNSTABLE by the round-5 audit (fixed since), in the danger zone
#: (≥1e-14 drift, fixed since), or a ≥1e9-magnitude multi-level sum chain.
PINNED = [
    "join_outer_full",
    "snowset_retrieval_rate",
    "snowset_selectivity_distribution",
    "snowset_selectivity_distribution_sql",
    "udaf_geomean",
    "udf_grouped_map_zscore",
    "join_broadcast_inner",
    "join_multiway",
    "agg_pricing_summary",
    "agg_reaggregate",
    "source_jsonl_scan",
    "events_retention_cohorts",
    "time_ewma",
]


def _rows(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(repr(r[i]) for i in order) for r in df.collect()]
    return sorted(rows)


def test_pinned_contracts_are_partition_order_invariant(spark, sf_dir):
    qs = all_queries()
    original = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        for name in PINNED:
            fn = qs[name]
            spark.conf.set("spark.sql.shuffle.partitions", "5")
            a = _rows(fn(spark, sf_dir))
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            b = _rows(fn(spark, sf_dir))
            assert a == b, f"{name}: output depends on shuffle partitioning"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", original)
