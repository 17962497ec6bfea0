"""Sorts / limits / set operations / scalar-function surface.

Covers SURVEY.md §2.6 (O1 ORDER BY + the LIMIT/top-k the reference lacks),
§2.7 (set operations — absent in reference, Spark built-ins), and §2.8
(F1-F5 scalar functions: arithmetic, CEIL, LEAST, NULLIF, CASE WHEN).

Scale design: global top-k uses ``orderBy(...).limit(k)`` which Spark
compiles to TakeOrderedAndProject — per-partition heap + driver merge of k
rows, never a global sort. Set operations on key columns are map-side
distinct-able; union-all is a zero-shuffle concatenation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.tables import load_table


def order_by_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1 + top-k: highest-value lineitems, deterministic tiebreaks,
    TakeOrderedAndProject physical plan."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.orderBy(
            F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"
        )
        .select("l_orderkey", "l_linenumber", "l_extendedprice")
        .limit(10)
    )


def union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL: nation keys from customers and suppliers, tagged + counted."""
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    u = cust.select(
        F.col("c_nationkey").alias("nationkey"), F.lit("customer").alias("side")
    ).unionAll(
        sup.select(F.col("s_nationkey").alias("nationkey"), F.lit("supplier"))
    )
    return u.groupBy("nationkey", "side").agg(F.count(F.lit(1)).alias("n"))


def intersect_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nation keys present on both sides."""
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).intersect(
        sup.select(F.col("s_nationkey").alias("nationkey"))
    )


def except_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): customer nations with no supplier."""
    cust = load_table(spark, sf_dir, "customer")
    sup = load_table(spark, sf_dir, "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).exceptAll(
        sup.select(F.col("s_nationkey").alias("nationkey"))
    ).distinct()


def case_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7/F2/F3/F4: CASE WHEN + CEIL + LEAST + NULLIF bucketing chain — the
    scalar-function cluster of query_selectivity_distribution.sql:19-33."""
    orders = load_table(spark, sf_dir, "orders")
    ratio = F.col("o_totalprice") / F.nullif(
        F.lit(500000.0), F.lit(0.0)
    )  # NULLIF guard mirrors the reference's div-by-zero idiom
    bucket = F.least(F.ceil(ratio * 10), F.lit(10).cast("long")).cast("long")
    labeled = orders.withColumn(
        "price_bucket",
        F.when(F.col("o_totalprice") > 0, bucket).otherwise(F.lit(None)),
    )
    return labeled.groupBy("price_bucket").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("o_totalprice").alias("sum_price"),
    )


def arithmetic_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1: the reference's /14*365/12 scaling chain (retrieval_rate.sql:29)
    applied per row then aggregated."""
    orders = load_table(spark, sf_dir, "orders")
    scaled = F.col("o_totalprice") / 14 * 365 / 12
    return orders.agg(
        F.sum(scaled).alias("sum_scaled"),
        F.avg(scaled + F.lit(1.0) - F.lit(1.0)).alias("avg_scaled"),
    )


def correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated scalar subquery via spark.sql — Catalyst decorrelates it
    into a join (SURVEY §4 'free upgrades': the reference has no subquery
    machinery at all). Orders whose total exceeds 3× the average total of
    their own customer's orders."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 3 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
        """
    )


def lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT (round 4): the two
    priciest lineitems of every high-value order — the 'top-N per outer
    row' idiom SQL users reach for before they know window functions.
    Catalyst decorrelates it (DecorrelateInnerQuery): the executed plan is
    a row_number window over the lineitem side + an equi-join on the
    correlation key — no per-outer-row re-execution, no nested loop, and
    at 100 TB it scales exactly like the window form
    (window_topk_per_group). DuckDB runs the identical LATERAL text."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM orders o,
        LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) t
        WHERE o.o_totalprice > 400000
        ORDER BY o.o_orderkey, l_extendedprice DESC, l_linenumber
        """
    )


def pivot_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT: events wide per user-bucket × event_type (explicit value list
    so the plan needs no extra distinct pass — the 100 TB form)."""
    ev = load_table(spark, sf_dir, "events")
    types = ["click", "view", "purchase", "signup", "error"]
    return (
        ev.withColumn("user_bucket", F.col("user_id") % 10)
        .groupBy("user_bucket")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
    )


def unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT/melt: lineitem measure columns to long form, then aggregate
    per measure (df.unpivot → one narrow generate, no shuffle until agg)."""
    li = load_table(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ["l_orderkey"],
        ["l_quantity", "l_discount", "l_tax"],
        "measure",
        "value",
    )
    return long.groupBy("measure").agg(
        F.sum("value").alias("total"),
        F.avg("value").alias("mean"),
        F.count(F.lit(1)).alias("n"),
    )


def distinct_rows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-row DISTINCT (dropDuplicates over every column)."""
    ev = load_table(spark, sf_dir, "events").select("event_type", "user_id")
    return ev.distinct()


def merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest-wins MERGE/upsert over plain parquet (SCD type 1).

    The CDC-apply pattern for engines without a transactional table format:
    current state (even event_ids) and an update batch (odd event_ids) are
    unioned — a zero-shuffle concatenation — and one window pass per key
    keeps the newest version by (ts, event_id). At 100 TB the union's
    window shuffle is the whole cost, and it partitions by the merge key,
    so writing the result ``partitionBy``/``bucketBy`` that same key makes
    the NEXT merge's window reuse the layout; updates touch only the
    partitions they land in (the classic copy-on-write merge). Versions
    per key ride along from the same window (no second aggregate).

    Outputs are integral (ids, cents, counts) — engine-exact.
    """
    ev = load_table(spark, sf_dir, "events")
    cols = ["user_id", "event_id", "event_type", "value", "ts"]
    base = ev.filter(F.col("event_id") % 2 == 0).select(*cols)
    updates = ev.filter(F.col("event_id") % 2 == 1).select(*cols)
    merged = base.unionByName(updates)
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    wc = Window.partitionBy("user_id")
    return (
        merged.withColumn("rn", F.row_number().over(w))
        .withColumn("n_versions", F.count(F.lit(1)).over(wc))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("last_event_id"),
            F.col("event_type").alias("last_event_type"),
            F.floor(F.col("value") * 100).alias("last_value_cents"),
            "n_versions",
        )
    )


def scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD type-2 history: turn a change stream into validity intervals.

    `relational_merge_upsert` keeps only the CURRENT state (type 1); type
    2 keeps every version with [valid_from, valid_to) bounds — the
    warehouse pattern for "what did this row look like on date X". One
    window pass per key: valid_to = the NEXT version's timestamp (lead),
    NULL for the open current version. At 100 TB this is the same single
    merge-key shuffle as the upsert; the history table appends versions
    and only the previously-open row per key gets its valid_to closed
    (partition by key → touched partitions only). Timestamps travel as
    formatted strings (module convention); is_current is an integer flag.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fmt = "yyyy-MM-dd HH:mm:ss"
    return (
        ev.select("user_id", "event_id", "event_type", "ts")
        .withColumn("next_ts", F.lead("ts").over(w))
        .select(
            "user_id",
            "event_id",
            F.col("event_type").alias("state"),
            F.date_format("ts", fmt).alias("valid_from"),
            F.date_format("next_ts", fmt).alias("valid_to"),
            F.when(F.col("next_ts").isNull(), F.lit(1)).otherwise(F.lit(0)).alias(
                "is_current"
            ),
        )
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "relational_merge_upsert": merge_upsert,
    "relational_scd2_history": scd2_history,
    "relational_correlated_subquery": correlated_subquery,
    "relational_lateral_topn": lateral_topn,
    "relational_pivot": pivot_counts,
    "relational_unpivot": unpivot_measures,
    "relational_distinct_rows": distinct_rows,
    "sort_limit_topk": order_by_limit,
    "setop_union_all": union_all_counts,
    "setop_intersect": intersect_keys,
    "setop_except": except_keys,
    "scalar_case_bucket": case_bucket,
    "scalar_arithmetic_chain": arithmetic_chain,
}

ORACLE_SQL: dict[str, str] = {
    "relational_scd2_history": """
        SELECT user_id, event_id,
               event_type AS state,
               strftime(ts, '%Y-%m-%d %H:%M:%S') AS valid_from,
               strftime(LEAD(ts) OVER w, '%Y-%m-%d %H:%M:%S') AS valid_to,
               CASE WHEN LEAD(ts) OVER w IS NULL THEN 1 ELSE 0 END
                 AS is_current
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "relational_merge_upsert": """
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_event_type,
               CAST(floor(value * 100) AS BIGINT) AS last_value_cents,
               n_versions
        FROM (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_versions
          FROM events
        ) WHERE rn = 1
    """,
    "relational_lateral_topn": """
        SELECT o.o_orderkey, t.l_linenumber, t.l_extendedprice
        FROM orders o,
        LATERAL (
          SELECT l_linenumber, l_extendedprice FROM lineitem
          WHERE l_orderkey = o.o_orderkey
          ORDER BY l_extendedprice DESC, l_linenumber LIMIT 2
        ) t
        WHERE o.o_totalprice > 400000
        ORDER BY o.o_orderkey, l_extendedprice DESC, l_linenumber
    """,
    "relational_correlated_subquery": """
        SELECT o_orderkey, o_custkey, o_totalprice
        FROM orders o
        WHERE o_totalprice > 3 * (
          SELECT AVG(o2.o_totalprice) FROM orders o2
          WHERE o2.o_custkey = o.o_custkey
        )
    """,
    "relational_pivot": """
        SELECT user_id % 10 AS user_bucket,
               CAST(COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS BIGINT)
                 AS click,
               CAST(COUNT(CASE WHEN event_type = 'view' THEN 1 END) AS BIGINT)
                 AS view,
               CAST(COUNT(CASE WHEN event_type = 'purchase' THEN 1 END) AS BIGINT)
                 AS purchase,
               CAST(COUNT(CASE WHEN event_type = 'signup' THEN 1 END) AS BIGINT)
                 AS signup,
               CAST(COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS BIGINT)
                 AS error
        FROM events GROUP BY 1
    """,
    "relational_unpivot": """
        WITH long AS (
          SELECT 'l_quantity' AS measure, l_quantity AS value FROM lineitem
          UNION ALL SELECT 'l_discount', l_discount FROM lineitem
          UNION ALL SELECT 'l_tax', l_tax FROM lineitem
        )
        SELECT measure,
               CAST(SUM(value) AS DOUBLE) AS total,
               CAST(AVG(value) AS DOUBLE) AS mean,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM long GROUP BY measure
    """,
    "relational_distinct_rows": """
        SELECT DISTINCT event_type, user_id FROM events
    """,
    "sort_limit_topk": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 10
    """,
    "setop_union_all": """
        WITH u AS (
          SELECT c_nationkey AS nationkey, 'customer' AS side FROM customer
          UNION ALL
          SELECT s_nationkey AS nationkey, 'supplier' AS side FROM supplier
        )
        SELECT nationkey, side, CAST(COUNT(*) AS BIGINT) AS n
        FROM u GROUP BY nationkey, side
    """,
    "setop_intersect": """
        SELECT c_nationkey AS nationkey FROM customer
        INTERSECT
        SELECT s_nationkey AS nationkey FROM supplier
    """,
    "setop_except": """
        SELECT DISTINCT nationkey FROM (
          SELECT c_nationkey AS nationkey FROM customer
          EXCEPT ALL
          SELECT s_nationkey AS nationkey FROM supplier
        )
    """,
    "scalar_case_bucket": """
        WITH labeled AS (
          SELECT o_totalprice,
                 CASE WHEN o_totalprice > 0
                      THEN CAST(LEAST(CEIL(o_totalprice / NULLIF(500000.0, 0) * 10),
                                      10) AS BIGINT)
                      ELSE NULL END AS price_bucket
          FROM orders
        )
        SELECT price_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(o_totalprice) AS DOUBLE) AS sum_price
        FROM labeled GROUP BY price_bucket
    """,
    "scalar_arithmetic_chain": """
        SELECT CAST(SUM(o_totalprice / 14 * 365 / 12) AS DOUBLE) AS sum_scaled,
               CAST(AVG(o_totalprice / 14 * 365 / 12 + 1.0 - 1.0) AS DOUBLE)
                   AS avg_scaled
        FROM orders
    """,
}
