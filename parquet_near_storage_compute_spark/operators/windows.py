"""Window functions (SURVEY.md §2.5: absent in the reference, provided as
first-class engine surface via Spark's native window exec).

All orderings carry unique tiebreak keys so results are deterministic and
oracle-comparable.

Scale design: window partitions key on user/supplier/group columns — the
shuffle is one hash exchange per window spec, and partitions are bounded by
per-key cardinality (no global sort over data). Global-order operators
(ntile) use the two-phase range-shard + offsets plan; the only
single-partition windows run post-aggregation on tiny frames (per-shard
counts here, percentage-of-total in joins.py).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.tables import load_table


def topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number: top-3 lineitems by price within each returnflag.

    Two-phase (salted) top-k: a single window over 3 giant groups serializes
    into 3 tasks; instead each (group, salt) slice computes a local top-3,
    then the global window ranks only groups × salts × 3 rows. The global
    top-3 is always contained in some slice's local top-3, so results are
    identical — this is the partial-aggregation idea applied to ranking.

    Measured alternative, rejected for scale (r3): a groupBy local phase
    (``collect_list`` → ``array_sort`` → ``slice(…,1,3)``) runs ~35%
    faster at sf0.1 (0.78s vs 1.21s, identical output) but holds
    n/(groups·salts) rows as ONE in-memory array per group — unbounded in
    data size (at 100 TB a (flag, salt) group is billions of rows; object
    hash agg's sort fallback spills groups, not the inside of a group).
    The window form's local sort spills externally, so it keeps bounded
    memory at any scale; the 2-exchange cost is the price of that bound."""
    li = load_table(spark, sf_dir, "lineitem").select(
        # project before the window: the exchange carries 4 columns, not 11
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    n_salt = 16
    order = [F.col("l_extendedprice").desc(), "l_orderkey", "l_linenumber"]
    # salt is engine-internal (it only slices the local phase; results are
    # salt-independent), so the cheap native hash beats crc32-over-string
    local_w = Window.partitionBy(
        "l_returnflag", F.pmod(F.hash("l_orderkey"), F.lit(n_salt))
    ).orderBy(*order)
    final_w = Window.partitionBy("l_returnflag").orderBy(*order)
    return (
        li.withColumn("lrn", F.row_number().over(local_w))
        .filter(F.col("lrn") <= 3)
        .withColumn("rn", F.row_number().over(final_w))
        .filter(F.col("rn") <= 3)
        .select("l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice", "rn")
    )


def rank_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank vs dense_rank over order priorities per status (with ties)."""
    orders = load_table(spark, sf_dir, "orders")
    per_prio = orders.groupBy("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return per_prio.select(
        "o_orderstatus",
        "o_orderpriority",
        "n",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
    )


def lag_lead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead: per-user event deltas ordered by time."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        "value",
        F.lag("value", 1).over(w).alias("prev_value"),
        F.lead("value", 1).over(w).alias("next_value"),
        (F.col("value") - F.lag("value", 1).over(w)).alias("delta"),
    )


def moving_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame spec: rolling 3-row sum per user (ROWS BETWEEN 2 PRECEDING)."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-2, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id", F.sum("value").over(w).alias("moving_sum3")
    )


def running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative sum: running spend per customer by order date.

    Bit-exact since r10 (VERDICT r9 #6): the cumulative sum runs over
    integer CENTS (the price column is 2-decimal money), so the result is
    independent of the engine's accumulation tree — a windowed double SUM
    drifted ~2e-16 vs DuckDB, whose segment-tree window aggregation sums
    in a different order than Spark's sequential running accumulator even
    for a fully-ordered frame. One final cents/100.0 division per row is
    a single exactly-determined float op. Cents stay < 2^53 until a
    single customer's cumulative spend exceeds ~$90 T, so the device is
    100 TB-safe."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.round(F.col("o_totalprice") * 100).cast("long")
    return orders.select(
        "o_orderkey",
        "o_custkey",
        (F.sum(cents).over(w) / 100.0).alias("running_spend"),
    )


NTILE_K = 4
NTILE_SHARDS = 32  # range shards; set ≈ cluster parallelism at 100 TB


def global_positions(
    df: DataFrame, order: list, shards: int = NTILE_SHARDS
) -> DataFrame:
    """Exact global row position over a total order WITHOUT a
    single-partition sort — the distributed zipWithIndex pattern, reusable
    by any global-order operator.

    ``repartitionByRange`` splits the total order into contiguous range
    shards; a window PARTITIONED BY shard computes local row numbers in
    parallel; per-shard counts (a tiny ≤``shards``-row frame) turn into
    cumulative offsets via a window over that tiny frame (the
    join_window_pct precedent — single-partition is fine over ≤32 rows);
    a broadcast join adds offset + local rank = exact 1-based global
    position. Both branches reuse the one range exchange
    (ReusedExchange). ``order`` must be a strict total order (include a
    unique tiebreak column) for per-row determinism.

    Output: the input columns plus ``p`` (1-based global position) and
    ``n_total``."""
    reserved = {"shard", "lrn", "offset", "cnt", "p", "n_total"}
    clash = reserved & set(df.columns)
    if clash:
        raise ValueError(
            f"global_positions: input columns collide with internal names "
            f"{sorted(clash)}; rename them first"
        )
    sharded = df.repartitionByRange(shards, *order).withColumn(
        "shard", F.spark_partition_id()
    )
    local_w = Window.partitionBy("shard").orderBy(*order)
    local = sharded.withColumn("lrn", F.row_number().over(local_w))
    counts = sharded.groupBy("shard").agg(F.count(F.lit(1)).alias("cnt"))
    prefix_w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, -1
    )
    total_w = Window.orderBy("shard").rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = counts.select(
        "shard",
        F.coalesce(F.sum("cnt").over(prefix_w), F.lit(0)).alias("offset"),
        F.sum("cnt").over(total_w).alias("n_total"),
    )
    return (
        local.join(F.broadcast(offsets), "shard")
        .withColumn("p", F.col("lrn") + F.col("offset"))
        .drop("shard", "lrn", "offset")
    )


def exact_ntile(
    df: DataFrame,
    order: list,
    k: int,
    shards: int = NTILE_SHARDS,
    out_col: str = "bucket",
) -> DataFrame:
    """SQL-standard ``ntile(k)`` over a global order — EXACT semantics,
    scale-safe plan (an ``ntile(k) OVER (ORDER BY …)`` window's empty
    partition spec forces every row through one single-partition
    WindowExec task; this builds on ``global_positions`` instead).

    The bucket falls out arithmetically from the global position: the
    first n mod k buckets take ⌈n/k⌉ rows, the rest ⌊n/k⌋ — integer `div`
    throughout (exact past 2^53, cf. ADVICE r2 on double division).
    q = 0 (n < k) stays in the first CASE branch, so the ELSE's DIV q
    never sees zero."""
    ranked = global_positions(df, order, shards)
    bucket = F.expr(
        f"CAST(CASE WHEN p <= (n_total % {k}) * (n_total DIV {k} + 1) "
        f"THEN (p - 1) DIV (n_total DIV {k} + 1) "
        f"ELSE (n_total % {k}) + "
        f"(p - (n_total % {k}) * (n_total DIV {k} + 1) - 1) "
        f"DIV (n_total DIV {k}) END + 1 AS INT)"
    )
    return ranked.withColumn(out_col, bucket).drop("p", "n_total")


def ntile_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile: quartile assignment of customers by account balance — the
    r2 form was a global-sort window; round 3 runs the exact two-phase
    plan (``exact_ntile``), bit-identical output, no full-data
    single-partition exchange anywhere."""
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_acctbal"
    )
    order = [F.col("c_acctbal").desc(), F.col("c_custkey").asc()]
    return exact_ntile(cust, order, NTILE_K, out_col="quartile").select(
        "c_custkey", "c_acctbal", "quartile"
    )


def first_last_nth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value / last_value / nth_value over a full-partition frame:
    cheapest and priciest order per customer plus the second order's price."""
    orders = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_custkey",
        F.first_value("o_totalprice").over(w).alias("cheapest"),
        F.last_value("o_totalprice").over(w).alias("priciest"),
        F.nth_value("o_totalprice", 2).over(w).alias("second_cheapest"),
    )


def percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist: customer balance percentile within segment."""
    cust = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return cust.select(
        "c_custkey",
        "c_mktsegment",
        F.percent_rank().over(w).alias("bal_percent_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


def mode_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mode: most frequent event_type per user (count-then-rank
    with a lexicographic tiebreak — both engines agree, unlike native mode()
    whose tie choice is engine-defined)."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    w = Window.partitionBy("user_id").orderBy(F.col("n").desc(), "event_type")
    return (
        counts.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select("user_id", F.col("event_type").alias("mode_event"), "n")
    )


#: Trailing range-frame width in days.
RANGE_FRAME_DAYS = 30


def range_frame_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE-frame windowed aggregate — the value-based frame the rest of
    the window family (ROWS frames, ranks) doesn't cover: per order, the
    same customer's spend over the trailing 30 days. RANGE frames include
    ALL ties of the current order value, so same-day orders see each other
    symmetrically — semantics a ROWS frame cannot express.

    Scale shape: one hash exchange on o_custkey + per-partition sort —
    identical shuffle profile to every partitioned window. The order key is
    an integer day number (date arithmetic, no timestamps in the output)."""
    o = load_table(spark, sf_dir, "orders")
    day = F.datediff(F.col("o_orderdate"), F.lit("1970-01-01").cast("date"))
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(day)
        .rangeBetween(-RANGE_FRAME_DAYS, 0)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        day.cast("int").alias("day"),
        F.sum("o_totalprice").over(w).alias("spend_30d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n_orders_30d"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "window_first_last_nth": first_last_nth,
    "window_percent_rank_cume": percent_rank_cume,
    "window_mode_per_group": mode_per_group,
    "window_topk_per_group": topk_per_group,
    "window_rank_dense_rank": rank_dense_rank,
    "window_lag_lead": lag_lead,
    "window_moving_sum": moving_sum,
    "window_running_total": running_total,
    "window_ntile": ntile_buckets,
    "window_range_frame": range_frame_trailing,
}

ORACLE_SQL: dict[str, str] = {
    "window_range_frame": f"""
        SELECT o_orderkey, o_custkey,
               CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS INT)
                 AS day,
               CAST(SUM(o_totalprice) OVER w AS DOUBLE) AS spend_30d,
               CAST(COUNT(*) OVER w AS BIGINT) AS n_orders_30d
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY date_diff('day', DATE '1970-01-01', o_orderdate)
                     RANGE BETWEEN {RANGE_FRAME_DAYS} PRECEDING
                           AND CURRENT ROW)
    """,
    "window_first_last_nth": """
        SELECT o_orderkey, o_custkey,
               CAST(FIRST_VALUE(o_totalprice) OVER w AS DOUBLE) AS cheapest,
               CAST(LAST_VALUE(o_totalprice) OVER w AS DOUBLE) AS priciest,
               CAST(NTH_VALUE(o_totalprice, 2) OVER w AS DOUBLE)
                 AS second_cheapest
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    "window_percent_rank_cume": """
        SELECT c_custkey, c_mktsegment,
               CAST(PERCENT_RANK() OVER w AS DOUBLE) AS bal_percent_rank,
               CAST(CUME_DIST() OVER w AS DOUBLE) AS bal_cume_dist
        FROM customer
        WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
    "window_mode_per_group": """
        WITH counts AS (
          SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY user_id, event_type
        )
        SELECT user_id, event_type AS mode_event, n FROM (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                       ORDER BY n DESC, event_type) AS rk
          FROM counts
        ) WHERE rk = 1
    """,
    "window_topk_per_group": """
        SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
               CAST(rn AS INT) AS rn
        FROM (
          SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                 ROW_NUMBER() OVER (PARTITION BY l_returnflag
                                    ORDER BY l_extendedprice DESC,
                                             l_orderkey, l_linenumber) AS rn
          FROM lineitem
        ) WHERE rn <= 3
    """,
    "window_rank_dense_rank": """
        WITH per_prio AS (
          SELECT o_orderstatus, o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
          FROM orders GROUP BY o_orderstatus, o_orderpriority
        )
        SELECT o_orderstatus, o_orderpriority, n,
               CAST(RANK() OVER (PARTITION BY o_orderstatus
                                 ORDER BY n DESC, o_orderpriority) AS INT) AS rnk,
               CAST(DENSE_RANK() OVER (PARTITION BY o_orderstatus
                                       ORDER BY n DESC, o_orderpriority) AS INT)
                   AS drnk
        FROM per_prio
    """,
    "window_lag_lead": """
        SELECT event_id, user_id, value,
               LAG(value, 1) OVER w AS prev_value,
               LEAD(value, 1) OVER w AS next_value,
               CAST(value - LAG(value, 1) OVER w AS DOUBLE) AS delta
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
    "window_moving_sum": """
        SELECT event_id, user_id,
               CAST(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                    AS DOUBLE) AS moving_sum3
        FROM events
    """,
    "window_running_total": """
        -- integer-cents running sum (r10): order-free integer addition,
        -- one exactly-determined /100.0 per row — bit-exact vs Spark
        SELECT o_orderkey, o_custkey,
               CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS BIGINT) / 100.0
                   AS running_spend
        FROM orders
    """,
    "window_ntile": """
        SELECT c_custkey, c_acctbal,
               CAST(NTILE(4) OVER (ORDER BY c_acctbal DESC, c_custkey) AS INT)
                   AS quartile
        FROM customer
    """,
}
