"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``parquet_near_storage_compute_spark``; this module
is a thin adapter.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The v1 engine's headline shape (``v1/src/main.rs:218-225``): filter on the
    fact column + SUM/AVG/MIN/MAX/COUNT over it, here at the ~50% selectivity
    rung of the ladder.
    """
    from parquet_near_storage_compute_spark.operators.scan_agg import (
        LADDER,
        scan_filter_agg,
    )

    return scan_filter_agg(spark, SMOKE_SF_DIR, LADDER["p50"])


def _fresh_cache(fn: Callable[[SparkSession, str], DataFrame]):
    """Drop frames persisted by PREVIOUS contracts before building the
    next one (ADVICE r7: operators persist their reused intermediates —
    the code table, the group frame — but a long-lived driver session
    sweeping all 183 contracts would otherwise accumulate every cached
    frame; MEMORY_AND_DISK eviction prevents failure but adds memory
    pressure and spill churn). Clearing between contracts changes no
    result: each query (re)builds and (re)persists what it needs."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.catalog.clearCache()
        return fn(spark, sf_dir)

    wrapped.__name__ = getattr(fn, "__name__", "query")
    wrapped.__doc__ = fn.__doc__
    return wrapped


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from parquet_near_storage_compute_spark.registry import all_queries

    return {n: _fresh_cache(f) for n, f in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/aliases)."""
    from parquet_near_storage_compute_spark.registry import all_oracles

    return all_oracles()
