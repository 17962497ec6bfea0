"""Aggregate-specific assertions beyond the registry differential gate."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.aggregates import (
    approx_distinct,
    reaggregate,
)
from parquet_near_storage_compute_spark.tables import load_table


def test_raw_hll_within_5pct(spark, sf_dir):
    """The raw HLL sketch values (not oracle-comparable across engines) stay
    within the documented error bound of the exact counts — this is the
    sketch-level assertion backing the oracle-checkable contract form."""
    li = load_table(spark, sf_dir, "lineitem")
    row = li.agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.approx_count_distinct("l_orderkey", rsd=0.01).alias("approx_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
        F.approx_count_distinct("l_partkey", rsd=0.01).alias("approx_parts"),
    ).collect()[0]
    assert abs(row.approx_orders - row.exact_orders) / row.exact_orders < 0.05
    assert abs(row.approx_parts - row.exact_parts) / row.exact_parts < 0.05


def test_approx_distinct_contract_booleans_true(spark, sf_dir):
    row = approx_distinct(spark, sf_dir).collect()[0]
    assert row.orders_within_5pct and row.parts_within_5pct


def test_reaggregate_is_run_stable(spark, sf_dir):
    """The decimal-summed contract must produce bit-identical doubles across
    runs (the r1 failure mode was last-ulp drift from accumulation order)."""
    a = reaggregate(spark, sf_dir).collect()[0]
    b = reaggregate(spark, sf_dir).collect()[0]
    assert (a.total, a.avg_per_supp, a.n_supp) == (b.total, b.avg_per_supp, b.n_supp)
