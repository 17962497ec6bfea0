"""Snowset SQL parity: the reference's two golden analytical queries.

Re-expresses ``datasets/snowset/query_selectivity_distribution.sql`` and
``datasets/snowset/retrieval_rate.sql`` over the driver's star schema
(FIXTURES.md mapping: ``warehouseId`` → ``l_suppkey``, ``scanBytes`` →
``l_extendedprice``, ``scanFiles``/``scanAssignedFiles`` → ``l_quantity``,
``scanOriginalFiles`` → ``1 + l_tax``).

Scale design (100 TB): the per-warehouse estimate CTE aggregates the fact
table down to one row per warehouse — small enough to broadcast — so the
fact×estimate join is a BroadcastHashJoin with no fact-side shuffle. The
percentage-of-total step runs on the bucketed counts (≤101 rows), where a
driver-side window over a single partition is free. The only full shuffles
are the two group-bys on the warehouse key, which AQE coalesces.

Note: ``retrieval_rate.sql:29`` in the reference has a syntax slip (a second
``SUM(...)`` without a comma); we implement the intended single weighted
average (SURVEY.md §7.3).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.tables import load_table, register_views


def _warehouse_size_estimates(li: DataFrame) -> DataFrame:
    """CTE ``warehouse_size_estimates`` (query_selectivity_distribution.sql:3-13)."""
    est = (
        F.col("l_extendedprice")
        / F.nullif(F.col("l_quantity"), F.lit(0.0))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    return li.groupBy("l_suppkey").agg(F.max(est).alias("estimated_warehouse_size"))


def selectivity_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``query_selectivity_distribution.sql`` as a DataFrame chain.

    CTE chain: size estimates → per-row selectivity ratio (CASE guard) →
    LEAST/CEIL bucketing → bucket counts → percentage of total (the
    reference's 1-row cross join, here a window over the tiny counts DF).
    """
    li = load_table(spark, sf_dir, "lineitem")
    ws = _warehouse_size_estimates(li)

    ratio = F.when(
        F.col("estimated_warehouse_size") > 0,
        F.col("l_extendedprice") / F.col("estimated_warehouse_size"),
    ).otherwise(F.lit(None))
    bucket = F.least(F.ceil(ratio * 100), F.lit(100).cast("long")).cast("long")

    bucketed = (
        li.join(F.broadcast(ws), "l_suppkey", "inner")
        .withColumn("selectivity_bucket", bucket)
    )
    counts = bucketed.groupBy("selectivity_bucket").agg(
        F.count(F.lit(1)).alias("query_count")
    )
    total_w = Window.partitionBy()
    return (
        counts.withColumn(
            "query_percentage",
            F.col("query_count") * 100.0 / F.sum("query_count").over(total_w),
        )
        .orderBy("selectivity_bucket")
    )


def selectivity_distribution_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same query through the spark.sql surface (CTEs verbatim, S8 parity) —
    proves the reference SQL runs nearly unchanged on Spark SQL."""
    register_views(spark, sf_dir)
    return spark.sql(_SELECTIVITY_SQL)


_SELECTIVITY_SQL = """
    WITH warehouse_size_estimates AS (
      SELECT l_suppkey,
             MAX((l_extendedprice / NULLIF(l_quantity, 0)) * (1 + l_tax))
               AS estimated_warehouse_size
      FROM lineitem GROUP BY l_suppkey
    ),
    query_selectivity AS (
      SELECT q.l_suppkey, q.l_extendedprice, ws.estimated_warehouse_size,
             CASE WHEN ws.estimated_warehouse_size > 0
                  THEN q.l_extendedprice / ws.estimated_warehouse_size
                  ELSE NULL END AS selectivity_ratio
      FROM lineitem q
      JOIN warehouse_size_estimates ws ON q.l_suppkey = ws.l_suppkey
    ),
    bucketed_selectivity AS (
      SELECT *, CAST(LEAST(CEIL(selectivity_ratio * 100), 100) AS BIGINT)
               AS selectivity_bucket
      FROM query_selectivity
    ),
    query_counts AS (
      SELECT selectivity_bucket, CAST(COUNT(*) AS BIGINT) AS query_count
      FROM bucketed_selectivity GROUP BY selectivity_bucket
    ),
    total_queries AS (SELECT SUM(query_count) AS total FROM query_counts)
    SELECT qc.selectivity_bucket,
           qc.query_count,
           CAST((qc.query_count * 100e0) / tq.total AS DOUBLE) AS query_percentage
    FROM query_counts qc, total_queries tq
    ORDER BY qc.selectivity_bucket
"""


def retrieval_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``retrieval_rate.sql`` (intended semantics): weighted average of
    scanbytes-per-size by estimated size, with the /14*365/12 scaling chain.

    Engine exactness (round 5; the float audit caught this one
    partition-order UNSTABLE): (a) the per-suppkey price sum runs as an
    INTEGER sum of round(price·100) cents — prices are exact 2-decimal
    values, so round() lands on the true integer cents in both engines
    and long addition is order-independent (and ~2× faster than the
    DECIMAL sum it replaces, measured under the noop sink); (b) the
    final weighted average folds the per-key terms SEQUENTIALLY in
    l_suppkey order (collect a sorted struct array, ``F.aggregate``),
    mirrored by the oracle's ``list_reduce`` over l_suppkey-ordered
    lists, instead of an order-dependent double SUM. The collected array
    is one row per SUPPLIER (a dimension, bounded) — fine at any corpus
    scale."""
    li = load_table(spark, sf_dir, "lineitem")
    ws = _warehouse_size_estimates(li)
    per_size = (
        li.join(F.broadcast(ws), "l_suppkey", "inner")
        .groupBy("l_suppkey", "estimated_warehouse_size")
        .agg(
            (
                F.sum(
                    F.round(F.col("l_extendedprice") * 100, 0).cast("long")
                ).cast("double")
                / F.lit(100.0)
                / F.nullif(F.col("estimated_warehouse_size"), F.lit(0.0))
            ).alias("scanbytes_per_estimated_size")
        )
    )
    arr = per_size.agg(
        F.sort_array(
            F.collect_list(
                F.struct(
                    "l_suppkey",
                    "estimated_warehouse_size",
                    "scanbytes_per_estimated_size",
                )
            )
        ).alias("xs")
    )
    num = F.aggregate(
        "xs",
        F.lit(0.0),
        lambda acc, x: acc
        + x["scanbytes_per_estimated_size"] * x["estimated_warehouse_size"],
    )
    den = F.aggregate(
        "xs", F.lit(0.0), lambda acc, x: acc + x["estimated_warehouse_size"]
    )
    return arr.select(
        (num / den / 14 * 365 / 12).alias(
            "weighted_avg_gb_read_per_warehouse_size"
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "snowset_selectivity_distribution": selectivity_distribution,
    "snowset_selectivity_distribution_sql": selectivity_distribution_sql,
    "snowset_retrieval_rate": retrieval_rate,
}

_SELECTIVITY_ORACLE = """
    WITH warehouse_size_estimates AS (
      SELECT l_suppkey,
             MAX((l_extendedprice / NULLIF(l_quantity, 0)) * (1 + l_tax))
               AS estimated_warehouse_size
      FROM lineitem GROUP BY l_suppkey
    ),
    query_selectivity AS (
      SELECT q.l_suppkey, q.l_extendedprice, ws.estimated_warehouse_size,
             CASE WHEN ws.estimated_warehouse_size > 0
                  THEN q.l_extendedprice / ws.estimated_warehouse_size
                  ELSE NULL END AS selectivity_ratio
      FROM lineitem q
      JOIN warehouse_size_estimates ws ON q.l_suppkey = ws.l_suppkey
    ),
    bucketed_selectivity AS (
      SELECT *, CAST(LEAST(CEIL(selectivity_ratio * 100), 100) AS BIGINT)
               AS selectivity_bucket
      FROM query_selectivity
    ),
    query_counts AS (
      SELECT selectivity_bucket, CAST(COUNT(*) AS BIGINT) AS query_count
      FROM bucketed_selectivity GROUP BY selectivity_bucket
    ),
    total_queries AS (SELECT SUM(query_count) AS total FROM query_counts)
    SELECT qc.selectivity_bucket,
           qc.query_count,
           CAST((qc.query_count * 100e0) / tq.total AS DOUBLE) AS query_percentage
    FROM query_counts qc, total_queries tq
    ORDER BY qc.selectivity_bucket
"""

ORACLE_SQL: dict[str, str] = {
    "snowset_selectivity_distribution": _SELECTIVITY_ORACLE,
    "snowset_selectivity_distribution_sql": _SELECTIVITY_ORACLE,
    # per-key integer cents sums + a sequential l_suppkey-ordered fold
    # for the weighted average — bit-identical to the Spark chain's
    # sort_array + F.aggregate (see retrieval_rate's exactness note)
    "snowset_retrieval_rate": """
        WITH warehouse_sizes AS (
          SELECT l_suppkey,
                 MAX((l_extendedprice / NULLIF(l_quantity, 0)) * (1 + l_tax))
                   AS estimated_warehouse_size
          FROM lineitem GROUP BY l_suppkey
        ),
        gb_read_per_size AS (
          SELECT ws.l_suppkey, ws.estimated_warehouse_size,
                 (CAST(SUM(CAST(round(s.l_extendedprice * 100) AS BIGINT))
                       AS DOUBLE) / 100e0
                  / NULLIF(ws.estimated_warehouse_size, 0))
                   AS scanbytes_per_estimated_size
          FROM lineitem s
          JOIN warehouse_sizes ws ON s.l_suppkey = ws.l_suppkey
          GROUP BY ws.l_suppkey, ws.estimated_warehouse_size
        ),
        ordered AS (
          SELECT
            list(scanbytes_per_estimated_size * estimated_warehouse_size
                 ORDER BY l_suppkey) AS nums,
            list(estimated_warehouse_size ORDER BY l_suppkey) AS dens
          FROM gb_read_per_size
        )
        SELECT CAST(
                 list_reduce(list_prepend(0e0, nums), (a, b) -> a + b)
                 / list_reduce(list_prepend(0e0, dens), (a, b) -> a + b)
                 / 14 * 365 / 12 AS DOUBLE)
               AS weighted_avg_gb_read_per_warehouse_size
        FROM ordered
    """,
}
