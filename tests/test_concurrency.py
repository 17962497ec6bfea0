"""Concurrent query execution on one SparkSession: the registry's queries
must be safe to run from multiple threads (shared conf pinning is
idempotent; no query mutates global state another query depends on)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor

from parquet_near_storage_compute_spark.registry import all_queries

NAMES = [
    "v1_flagship",
    "agg_pricing_summary",
    "join_broadcast_inner",
    "window_running_total",
    "dedup_exact",
    "text_token_counts",
    "time_tumbling_hourly",
    "scalar_string_ops",
]


def test_concurrent_queries(spark, sf_dir):
    qs = all_queries()

    def run(name: str) -> tuple[str, int]:
        return name, qs[name](spark, sf_dir).count()

    with ThreadPoolExecutor(max_workers=4) as pool:
        results = dict(pool.map(run, NAMES * 2))
    assert len(results) == len(NAMES)
    assert all(n >= 1 for n in results.values())
