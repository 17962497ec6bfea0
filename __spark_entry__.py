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


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from parquet_near_storage_compute_spark.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each query (same column names/aliases)."""
    from parquet_near_storage_compute_spark.registry import all_oracles

    return all_oracles()
