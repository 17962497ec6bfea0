"""Aggregation operators: A1-A11 parity + the grouped/statistical surface.

The reference's aggregation engine is five streaming ops over one column with
an implicit single group (``Aggregator`` trait, ``v1/src/main.rs:1246-1343``)
plus SQL-layer GROUP BYs (``query_selectivity_distribution.sql:4-12,37-45``).
Spark expresses all of it as partial→final HashAggregates; grouping sets /
rollup / cube / distinct / percentiles are the built-in extensions the
reference lacks (SURVEY.md §2.4 "absent" list).

Scale design: every group-by here keys on low-cardinality columns
(returnflag×linestatus = 6 groups, suppkey ≈ #suppliers), so map-side partial
aggregation collapses the shuffle to #groups×#tasks rows. The re-aggregate
query chains two aggs — the second input is already tiny. Nothing collects to
the driver.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.tables import load_table


def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8: the classic grouped aggregate (TPC-H Q1 shape) — group by
    returnflag/linestatus with sums, averages and counts over expressions."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(disc_price).alias("sum_disc_price"),
            F.sum(charge).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def agg_over_expression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9: aggregates over arithmetic expressions — the reference's
    ``MAX((scanBytes / NULLIF(scanFiles,0)) * scanOriginalFiles)`` and the
    ``SUM(a*b)/SUM(b)`` weighted average (retrieval_rate.sql:27-29)."""
    li = load_table(spark, sf_dir, "lineitem")
    est = (
        F.col("l_extendedprice")
        / F.nullif(F.col("l_quantity"), F.lit(0.0))
        * (1 + F.col("l_tax"))
    )
    return li.agg(
        F.max(est).alias("max_est"),
        (
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity")
        ).alias("weighted_avg_price"),
    )


def reaggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A11: aggregate of an aggregate (CTE chain
    query_selectivity_distribution.sql:46-51) — global stats over
    per-supplier sums.

    The contract is made representation-stable by summing exact integer
    cents×100: double accumulation order differs between engines (Spark
    partial/final vs DuckDB) in the last ulps, which fails an exact value
    hash. Prices carry 2 decimals, so ``round(price·10⁴)`` is an integer
    with ~1e-9 relative slack from any rounding boundary — both engines
    produce the same long, long sums are exact and order-independent, and
    the final /1e4 + /n are identical IEEE double ops. (A DECIMAL(38,4)
    sum is equally exact but ~5× slower through the aggregate hot path —
    measured 1.46s vs 0.26s at sf0.1 — so the integer form is the one that
    survives 100 TB.) Headroom: 10⁴-scaled cents sum to ~2e15 at sf0.1,
    ~2e18 at sf100 — inside int64; beyond that, split the sum by key range
    or fall back to the decimal form.
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 10000).cast("long")
    per_supp = li.groupBy("l_suppkey").agg(F.sum(cents).alias("supp_cents"))
    totals = per_supp.agg(
        F.sum("supp_cents").alias("total_cents"),
        F.count(F.lit(1)).alias("n_supp"),
    )
    return totals.select(
        (F.col("total_cents") / 10000.0).alias("total"),
        ((F.col("total_cents") / 10000.0) / F.col("n_supp")).alias("avg_per_supp"),
        F.col("n_supp"),
    )


def distinct_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT aggregates (beyond reference, SURVEY §2.4 absent list)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_returnflag", "l_linestatus").alias("n_flag_status"),
        F.sum_distinct(F.col("l_linenumber").cast("long")).alias("sum_distinct_ln"),
    )


def rollup_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (beyond reference)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def cube_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (beyond reference)."""
    ev = load_table(spark, sf_dir, "events").withColumn(
        "user_bucket", F.col("user_id") % 2
    )
    return ev.cube("event_type", "user_bucket").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("value").alias("sum_value"),
    )


def stats_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates (beyond reference): stddev/var/corr/covar."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.stddev_samp("l_extendedprice").alias("std_price"),
        F.var_samp("l_quantity").alias("var_qty"),
        F.corr("l_extendedprice", "l_quantity").alias("corr_price_qty"),
        F.covar_samp("l_extendedprice", "l_discount").alias("covar_price_disc"),
    )


def percentile_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (beyond reference); matches DuckDB
    quantile_cont."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.percentile("l_extendedprice", 0.5).alias("p50_price"),
        F.percentile("l_extendedprice", 0.9).alias("p90_price"),
        F.percentile("l_quantity", 0.25).alias("p25_qty"),
    )


def grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (the general form of rollup/cube) via SQL."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               SUM(l_quantity) AS sum_qty,
               COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


def min_max_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by: the order id carrying each customer's highest and
    lowest total (no (customer, total) ties in this data, so the pick is
    deterministic; with ties you'd rank with an explicit tiebreak instead —
    see window_mode_per_group)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.groupBy("o_custkey").agg(
        F.max_by("o_orderkey", "o_totalprice").alias("best_order"),
        F.min_by("o_orderkey", "o_totalprice").alias("worst_order"),
        F.max("o_totalprice").alias("best_total"),
    )


def collect_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic collection aggregates: sorted distinct event types and
    bounded top-values per user (collect_set sorted so both engines agree
    on order). The sorted set is serialized to a comma-joined scalar — an
    array<string> column is not hashable by the driver's pandas
    canonicalizer, and the join loses nothing once the order is fixed."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        F.array_join(F.array_sort(F.collect_set("event_type")), ",").alias(
            "event_types"
        ),
        F.size(F.collect_set("event_type")).alias("n_types"),
    )


def approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL-sketch distinct count, expressed as an oracle-checkable contract:
    raw sketch counts differ across engines, so the query emits the exact
    counts plus a within-5% accuracy boolean for each sketch. The sketch is
    pinned to rsd=0.01 (typical error ~1%) so the 5% contract bound has
    real margin — the default rsd=0.05 can exceed 5% at small
    cardinalities. The oracle returns the same exact counts and literal
    TRUE. The raw sketch values are asserted separately in
    ``tests/test_aggregates.py``."""
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    )
    within = lambda a, e: (  # noqa: E731
        F.abs(F.col(a) - F.col(e)) / F.col(e) < F.lit(0.05)
    )
    return agg.select(
        "exact_orders",
        "exact_parts",
        within("approx_orders", "exact_orders").alias("orders_within_5pct"),
        within("approx_parts", "exact_parts").alias("parts_within_5pct"),
    )


#: Fixed-width histogram over l_extendedprice: 5k-wide bins, final bin
#: open-ended (prices run 901..105k at every SF — TPC-H's price formula is
#: scale-invariant, so the bin layout holds at any SF).
HIST_BIN_WIDTH = 5000.0
HIST_MAX_BIN = 23


def histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram — the distribution profile a pipeline
    materializes per numeric column (the binned counterpart of
    profile_columns' min/max). Bucket assignment is a narrow map; one
    partial+final aggregate on ≤ 24 keys — at 100 TB the shuffle carries
    #bins × #tasks rows, nothing else."""
    li = load_table(spark, sf_dir, "lineitem")
    bucket = F.least(
        F.floor(F.col("l_extendedprice") / HIST_BIN_WIDTH),
        F.lit(HIST_MAX_BIN).cast("long"),
    ).cast("int")
    return (
        li.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("l_extendedprice").alias("sum_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
        )
        .orderBy("bucket")
    )


def bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT distinct counts via mergeable bitmaps (Spark 3.5+
    ``bitmap_construct_agg`` family) — the third leg of the distinct-count
    triangle: exact groupBy-distinct shuffles every key,
    `sketch_hll_distinct`/`sketch_kmv_distinct` trade exactness for
    constant size, and bitmaps keep EXACTNESS while staying mergeable —
    each (group, 32k-id bucket) collapses to one bitmap blob, partial
    aggregation ORs bitmaps map-side, and rollups across groups are
    `bitmap_or_agg` over the blobs with no re-scan (the ClickHouse/Doris
    exact-distinct design). State is O(id-range/8) bytes per group —
    dense-id domains only; arbitrary strings go to the sketches.

    The ALL row is computed by OR-merging the per-type bucket bitmaps,
    so the contract proves merge-correctness against the plain
    COUNT(DISTINCT) oracle.
    """
    ev = load_table(spark, sf_dir, "events")
    buckets = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(user_id)").alias("b")
    ).agg(
        F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))").alias("bm")
    )
    per_type = buckets.groupBy("event_type").agg(
        F.expr("sum(bitmap_count(bm))").alias("n_distinct")
    )
    merged = (
        buckets.groupBy("b")
        .agg(F.expr("bitmap_count(bitmap_or_agg(bm))").alias("n"))
        # coalesce: a fully-empty corpus still yields one well-formed
        # ('ALL', 0) row instead of a NULL sum
        .agg(F.coalesce(F.sum("n"), F.lit(0)).alias("n_distinct"))
        .select(F.lit("ALL").alias("event_type"), "n_distinct")
    )
    return per_type.unionByName(merged).orderBy("event_type")


#: approx_percentile accuracy: guaranteed rank error ≤ N/accuracy.
APPROX_PCT_ACCURACY = 100
#: The flag allows 2× the guaranteed rank error (slack for interpolation
#: at the exact-rank boundary).
APPROX_PCT_SLACK = 2


def approx_percentile_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile SKETCH with a bounded-rank-error contract — the quantile
    leg of the mergeable-summary family (count-min for frequencies,
    HLL/KMV/bitmap for distincts, this for percentiles).

    ``approx_percentile`` runs the Greenwald–Khanna summary: bounded size,
    partials merge, one pass — at 100 TB the difference between a summary
    shuffle and `agg_percentile`'s exact sort-based form. GK guarantees
    |rank(estimate) − target·N| ≤ N/accuracy REGARDLESS of merge order,
    so while the estimate's exact value may vary with partitioning, the
    contract's flags cannot: each flag re-ranks the estimate against the
    data and asserts the guarantee ×SLACK against the RANK INTERVAL the
    estimate value spans — [count(< est)+1, count(<= est)] — not the max
    rank alone (r6, ADVICE: a value with multiplicity > εN would push the
    max rank past the tolerance even though one of its ranks satisfies
    the guarantee). The oracle pins exact interpolated percentiles +
    expects every flag = 1.
    """
    li = load_table(spark, sf_dir, "lineitem")
    appr = li.agg(
        F.percentile_approx(
            "l_extendedprice", 0.5, APPROX_PCT_ACCURACY
        ).alias("a50"),
        F.percentile_approx(
            "l_extendedprice", 0.9, APPROX_PCT_ACCURACY
        ).alias("a90"),
    )
    tol = F.col("n_rows") * APPROX_PCT_SLACK / APPROX_PCT_ACCURACY
    joined = li.crossJoin(F.broadcast(appr))
    ranked = joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum((F.col("l_extendedprice") < F.col("a50")).cast("long")).alias(
            "lo50"
        ),
        F.sum((F.col("l_extendedprice") <= F.col("a50")).cast("long")).alias(
            "hi50"
        ),
        F.sum((F.col("l_extendedprice") < F.col("a90")).cast("long")).alias(
            "lo90"
        ),
        F.sum((F.col("l_extendedprice") <= F.col("a90")).cast("long")).alias(
            "hi90"
        ),
        F.percentile("l_extendedprice", 0.5).alias("p50_exact"),
        F.percentile("l_extendedprice", 0.9).alias("p90_exact"),
    )

    def _dist(lo: str, hi: str, q: float):
        # distance from the target rank to the estimate's rank interval
        target = F.lit(q) * F.col("n_rows")
        return F.greatest(
            F.lit(0.0),
            (F.col(lo) + 1) - target,
            target - F.col(hi),
        )

    return ranked.select(
        "n_rows",
        "p50_exact",
        "p90_exact",
        F.when(_dist("lo50", "hi50", 0.5) <= tol, 1)
        .otherwise(0)
        .alias("rank_p50_ok"),
        F.when(_dist("lo90", "hi90", 0.9) <= tol, 1)
        .otherwise(0)
        .alias("rank_p90_ok"),
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_pricing_summary": pricing_summary,
    "agg_bitmap_distinct": bitmap_distinct,
    "agg_approx_percentile_sketch": approx_percentile_sketch,
    "agg_over_expression": agg_over_expression,
    "agg_reaggregate": reaggregate,
    "agg_distinct": distinct_agg,
    "agg_rollup": rollup_agg,
    "agg_cube": cube_agg,
    "agg_grouping_sets": grouping_sets,
    "agg_collect": collect_agg,
    "agg_min_max_by": min_max_by,
    "agg_stats": stats_agg,
    "agg_percentile": percentile_agg,
    "agg_approx_distinct": approx_distinct,
    "agg_histogram": histogram,
}

ORACLE_SQL: dict[str, str] = {
    # bounded-rank-error contract: exact percentiles pinned, flags must be
    # 1 (the GK guarantee holds regardless of Spark's merge order)
    "agg_approx_percentile_sketch": """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS p50_exact,
               CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS p90_exact,
               1 AS rank_p50_ok,
               1 AS rank_p90_ok
        FROM lineitem
    """,
    "agg_bitmap_distinct": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT 'ALL' AS event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT)
        FROM events
        ORDER BY event_type
    """,
    "agg_histogram": f"""
        SELECT CAST(LEAST(FLOOR(l_extendedprice / {HIST_BIN_WIDTH}),
                          {HIST_MAX_BIN}) AS INT) AS bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_price,
               CAST(MIN(l_extendedprice) AS DOUBLE) AS min_price,
               CAST(MAX(l_extendedprice) AS DOUBLE) AS max_price
        FROM lineitem GROUP BY 1 ORDER BY bucket
    """,
    "agg_pricing_summary": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_base_price,
               CAST(SUM(l_extendedprice * (1 - l_discount)) AS DOUBLE) AS sum_disc_price,
               CAST(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS DOUBLE)
                   AS sum_charge,
               CAST(AVG(l_quantity) AS DOUBLE) AS avg_qty,
               CAST(AVG(l_extendedprice) AS DOUBLE) AS avg_price,
               CAST(AVG(l_discount) AS DOUBLE) AS avg_disc,
               CAST(COUNT(*) AS BIGINT) AS count_order
        FROM lineitem
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus
    """,
    "agg_over_expression": """
        SELECT CAST(MAX((l_extendedprice / NULLIF(l_quantity, 0)) * (1 + l_tax))
                    AS DOUBLE) AS max_est,
               CAST(SUM(l_extendedprice * l_quantity) / SUM(l_quantity) AS DOUBLE)
                   AS weighted_avg_price
        FROM lineitem
    """,
    "agg_reaggregate": """
        WITH per_supp AS (
          SELECT l_suppkey,
                 SUM(CAST(ROUND(l_extendedprice * 10000) AS BIGINT)) AS supp_cents
          FROM lineitem GROUP BY l_suppkey
        )
        SELECT CAST(SUM(supp_cents) AS DOUBLE) / 10000.0 AS total,
               (CAST(SUM(supp_cents) AS DOUBLE) / 10000.0) / COUNT(*)
                   AS avg_per_supp,
               CAST(COUNT(*) AS BIGINT) AS n_supp
        FROM per_supp
    """,
    "agg_distinct": """
        SELECT CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp,
               CAST((SELECT COUNT(*) FROM
                     (SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem))
                    AS BIGINT) AS n_flag_status,
               CAST(SUM(DISTINCT l_linenumber) AS BIGINT) AS sum_distinct_ln
        FROM lineitem
    """,
    "agg_rollup": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    "agg_cube": """
        SELECT event_type,
               user_id % 2 AS user_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(value) AS DOUBLE) AS sum_value
        FROM events
        GROUP BY CUBE (event_type, user_id % 2)
    """,
    "agg_min_max_by": """
        SELECT o_custkey,
               CAST(arg_max(o_orderkey, o_totalprice) AS BIGINT) AS best_order,
               CAST(arg_min(o_orderkey, o_totalprice) AS BIGINT) AS worst_order,
               CAST(MAX(o_totalprice) AS DOUBLE) AS best_total
        FROM orders GROUP BY o_custkey
    """,
    "agg_collect": """
        SELECT user_id,
               array_to_string(list_sort(list(DISTINCT event_type)), ',')
                   AS event_types,
               CAST(len(list(DISTINCT event_type)) AS INT) AS n_types
        FROM events GROUP BY user_id
    """,
    "agg_grouping_sets": """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(l_quantity) AS DOUBLE) AS sum_qty,
               CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    "agg_stats": """
        SELECT CAST(STDDEV_SAMP(l_extendedprice) AS DOUBLE) AS std_price,
               CAST(VAR_SAMP(l_quantity) AS DOUBLE) AS var_qty,
               CAST(CORR(l_extendedprice, l_quantity) AS DOUBLE) AS corr_price_qty,
               CAST(COVAR_SAMP(l_extendedprice, l_discount) AS DOUBLE)
                   AS covar_price_disc
        FROM lineitem
    """,
    "agg_percentile": """
        SELECT CAST(quantile_cont(l_extendedprice, 0.5) AS DOUBLE) AS p50_price,
               CAST(quantile_cont(l_extendedprice, 0.9) AS DOUBLE) AS p90_price,
               CAST(quantile_cont(l_quantity, 0.25) AS DOUBLE) AS p25_qty
        FROM lineitem
    """,
    "agg_approx_distinct": """
        SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
               CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
               TRUE AS orders_within_5pct,
               TRUE AS parts_within_5pct
        FROM lineitem
    """,
}
