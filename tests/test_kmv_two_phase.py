"""Salted two-phase k-min for the KMV sketches (VERDICT r5 #3): no task may
sort a whole hot group — the local phase slices each group by pmod(h, SALT),
the global phase ranks only ≤ SALT·k rows per group — and the selection must
be exactly the k smallest hashes (what makes the single-window DuckDB oracle
still match)."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquet_near_storage_compute_spark.operators.sketches import (
    KMV_K,
    KMV_SALT,
    _kmin_per_group,
)

HOT = 10_000


def _hot_frame(spark):
    """One hot group (HOT distinct hashes), one small group (5 hashes)."""
    hot = spark.range(HOT).select(
        F.lit("hot").alias("g"), (F.col("id") * 7919 % 999_983).alias("h")
    )
    small = spark.range(5).select(
        F.lit("small").alias("g"), (F.col("id") + 13).alias("h")
    )
    return hot.unionAll(small)


def test_kmin_selects_exactly_the_k_smallest(spark):
    df = _hot_frame(spark)
    got = {
        (r.g, r.rn): r.h for r in _kmin_per_group(df, "g").collect()
    }
    hot_sorted = sorted(set(i * 7919 % 999_983 for i in range(HOT)))[:KMV_K]
    assert [got[("hot", i + 1)] for i in range(KMV_K)] == hot_sorted
    # under-k group: the whole set, exact ranks
    assert [got[("small", i + 1)] for i in range(5)] == [13, 14, 15, 16, 17]
    assert len(got) == KMV_K + 5


def test_kmin_plan_is_two_phase(spark):
    """The physical plan must show TWO Window nodes, the first partitioned
    by (group, pmod(h, KMV_SALT)) — the bounded-second-stage shape."""
    plan = _kmin_per_group(_hot_frame(spark), "g")._jdf.queryExecution().executedPlan().toString()
    n_windows = plan.count("Window ")
    assert n_windows == 2, plan
    assert "pmod" in plan, plan
    # the salt literal itself must appear in the local window's spec
    assert str(KMV_SALT) in plan


def test_second_stage_input_is_bounded(spark):
    """Rows entering the global window = local-phase survivors: ≤ SALT·k
    per group, regardless of group size."""
    df = _hot_frame(spark)
    wl = None  # reproduce the local phase only
    from pyspark.sql import Window

    wl = Window.partitionBy("g", F.pmod(F.col("h"), F.lit(KMV_SALT))).orderBy("h")
    local = (
        df.withColumn("_lrn", F.row_number().over(wl))
        .filter(F.col("_lrn") <= KMV_K)
    )
    per_group = {r.g: r.n for r in local.groupBy("g").agg(F.count("*").alias("n")).collect()}
    assert per_group["hot"] <= KMV_SALT * KMV_K
    assert per_group["small"] == 5
