"""Source/sink round-trips: CSV header sink (S9), partitioned parquet with
partition pruning, bucketed join without exchange."""

from __future__ import annotations

import os
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.sources.io import (
    read_csv,
    read_parquet,
    write_csv,
    write_parquet_partitioned,
)
from parquet_near_storage_compute_spark.tables import load_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")


@pytest.fixture(autouse=True, scope="module")
def _clean_tmp():
    os.makedirs(TMP, exist_ok=True)
    yield
    shutil.rmtree(os.path.join(TMP, "io_tests"), ignore_errors=True)


def test_csv_roundtrip(spark, sf_dir):
    out = os.path.join(TMP, "io_tests", "nation_csv")
    nation = load_table(spark, sf_dir, "nation")
    write_csv(nation, out, single_file=True)
    back = read_csv(spark, out)
    assert back.count() == nation.count()
    assert set(back.columns) == set(nation.columns)
    # header present in the single part file
    part = [f for f in os.listdir(out) if f.startswith("part-")][0]
    with open(os.path.join(out, part)) as fh:
        assert "n_nationkey" in fh.readline()


def test_partitioned_write_prunes(spark, sf_dir):
    out = os.path.join(TMP, "io_tests", "orders_by_status")
    orders = load_table(spark, sf_dir, "orders")
    write_parquet_partitioned(orders, out, ["o_orderstatus"])
    statuses = [d for d in os.listdir(out) if d.startswith("o_orderstatus=")]
    assert len(statuses) >= 2
    back = read_parquet(spark, out).filter(F.col("o_orderstatus") == "F")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # partition filter must land in the scan's partition filters, not as a
    # post-scan filter on data
    assert "PartitionFilters" in plan and "o_orderstatus" in plan
    expect = orders.filter(F.col("o_orderstatus") == "F").count()
    assert back.count() == expect
