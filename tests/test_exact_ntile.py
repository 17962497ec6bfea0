"""The two-phase ``exact_ntile`` must agree with Spark's native
``ntile(k) OVER (ORDER BY …)`` per row, for every n/k shape: n < k, n = k,
n % k ≠ 0, duplicate order values (with a unique tiebreak), single row,
and shards ≫ n (mostly-empty range partitions)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.windows import exact_ntile


def _frame(spark, n, dup_every=0):
    rows = [
        (i, (i * 7919) % 100 if not dup_every else (i // dup_every))
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "id long, v long")


@pytest.mark.parametrize("n,k,dup_every", [
    (1, 4, 0),      # single row
    (3, 4, 0),      # n < k (q = 0: the DIV-by-zero-shaped branch)
    (4, 4, 0),      # n = k
    (37, 4, 0),     # n % k != 0
    (100, 7, 0),    # bigger remainder case
    (50, 4, 5),     # heavy ties on v — tiebreak column decides
    (10, 1, 0),     # k = 1
])
def test_exact_ntile_matches_native(spark, n, k, dup_every):
    df = _frame(spark, n, dup_every)
    order = [F.col("v").desc(), F.col("id").asc()]
    native = df.select(
        "id", F.ntile(k).over(Window.orderBy(*order)).alias("b")
    )
    got = exact_ntile(df, order, k, shards=8).select(
        "id", F.col("bucket").alias("b")
    )
    assert {(r.id, r.b) for r in got.collect()} == {
        (r.id, r.b) for r in native.collect()
    }


def test_exact_ntile_more_shards_than_rows(spark):
    df = _frame(spark, 5)
    order = [F.col("v").asc(), F.col("id").asc()]
    native = df.select(
        "id", F.ntile(3).over(Window.orderBy(*order)).alias("b")
    )
    got = exact_ntile(df, order, 3, shards=32).select(
        "id", F.col("bucket").alias("b")
    )
    assert {(r.id, r.b) for r in got.collect()} == {
        (r.id, r.b) for r in native.collect()
    }


def test_exact_ntile_stable_across_reexecution(spark):
    """The two branches (local ranks, shard counts) recompute the range
    exchange independently unless Spark reuses it — determinism rests on
    RangePartitioner's seeded sampling over deterministic input. Pin it:
    two executions of the same plan and a rebuilt plan must agree row for
    row on a frame large enough to span many shards."""
    df = spark.range(10_000).select(
        F.col("id"), ((F.col("id") * 2654435761) % 1000).alias("v")
    )
    order = [F.col("v").desc(), F.col("id").asc()]
    plan = exact_ntile(df, order, 7, shards=16).select("id", "bucket")
    first = {(r.id, r.bucket) for r in plan.collect()}
    second = {(r.id, r.bucket) for r in plan.collect()}
    rebuilt = {
        (r.id, r.bucket)
        for r in exact_ntile(df, order, 7, shards=16)
        .select("id", "bucket")
        .collect()
    }
    assert first == second == rebuilt


def test_reserved_column_collision_raises(spark):
    df = spark.createDataFrame([(1, 2)], "id long, p long")
    with pytest.raises(ValueError, match="collide with internal names"):
        exact_ntile(df, [F.col("id")], 2)
