"""Dynamic partition pruning: a join against a filtered dim must inject a
runtime partition-pruning subquery into the fact scan — the join-time
counterpart of static partition pruning, and the feature that makes
dim-filtered star joins touch 1/N of a 100 TB partitioned fact table."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.tables import load_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
FACT = os.path.join(TMP, "dpp_orders")


@pytest.fixture(scope="module")
def partitioned_fact(spark):
    orders = load_table(spark, "/root/testdata/sf0.01", "orders")
    # partition the fact by a join key with few values
    orders.withColumn("cust_mod", F.col("o_custkey") % 10).write.mode(
        "overwrite"
    ).partitionBy("cust_mod").parquet(FACT)
    yield FACT
    shutil.rmtree(FACT, ignore_errors=True)


def test_dpp_subquery_in_plan(spark, partitioned_fact):
    fact = spark.read.parquet(partitioned_fact)
    dim = (
        spark.range(10)
        .select(F.col("id").alias("cust_mod"), (F.col("id") * 2).alias("attr"))
        .filter(F.col("attr") == 4)  # selects exactly one partition value
    )
    joined = fact.join(dim, "cust_mod").agg(F.sum("o_totalprice").alias("s"))
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruning" in plan.lower() or "PartitionFilters" in plan, plan
    # and the result is partition-restricted
    expect = (
        fact.filter(F.col("cust_mod") == 2).agg(F.sum("o_totalprice")).collect()[0][0]
    )
    got = joined.collect()[0].s
    assert abs(got - expect) < 1e-6
