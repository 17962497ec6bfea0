"""Bucketed co-located join: two tables bucketed on the join key with the
same bucket count must join WITHOUT shuffling either side — the fact×fact
strategy at 100 TB (SCALING.md). Verified on the physical plan: no Exchange
feeds the SortMergeJoin."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.sources.io import write_parquet_bucketed
from parquet_near_storage_compute_spark.tables import load_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    write_parquet_bucketed(
        li, "bt_lineitem", "l_orderkey", 8, os.path.join(TMP, "bt_lineitem")
    )
    write_parquet_bucketed(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"),
        "bt_orders",
        "l_orderkey",
        8,
        os.path.join(TMP, "bt_orders"),
    )
    yield "bt_lineitem", "bt_orders"
    for t in ("bt_lineitem", "bt_orders"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_no_exchange(spark, bucketed_tables):
    lt, ot = bucketed_tables
    key = "spark.sql.autoBroadcastJoinThreshold"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "-1")  # force a non-broadcast join
        j = (
            spark.table(lt)
            .join(spark.table(ot), "l_orderkey")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
        # the join inputs scan bucketed tables directly — no hash-partition
        # exchange anywhere (the only Exchange is the final 1-partition agg)
        assert "Exchange hashpartitioning" not in plan, plan
        assert j.collect()[0].n > 0
    finally:
        spark.conf.set(key, prev)


def test_bucketed_matches_plain_join(spark, bucketed_tables):
    lt, ot = bucketed_tables
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    plain = li.join(
        orders.withColumnRenamed("o_orderkey", "l_orderkey"), "l_orderkey"
    ).count()
    bucketed = spark.table(lt).join(spark.table(ot), "l_orderkey").count()
    assert plain == bucketed
