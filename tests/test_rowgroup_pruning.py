"""Row-group-level pruning on a multi-row-group file.

The driver's testdata is single-row-group-per-file (FIXTURES.md), so pruning
there degenerates to whole-file skips. Here we write a sorted, small-row-group
file and verify the byte accounting prunes at *row-group* granularity — the
actual ``keep_row_group`` semantics (``v1/src/main.rs:626-685``): a selective
threshold must keep SOME but not ALL row groups."""

from __future__ import annotations

import glob
import os
import shutil

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.plans.metrics import (
    footer_bytes,
    planned_scan_bytes,
)
from parquet_near_storage_compute_spark.sources.io import write_parquet_sized
from parquet_near_storage_compute_spark.tables import load_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
SORTED = os.path.join(TMP, "lineitem_sorted_rg")


@pytest.fixture(scope="module")
def sorted_file(spark):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    # sort by the filter column so row-group min/max ranges are disjoint,
    # then force small row groups
    write_parquet_sized(
        li.orderBy("l_extendedprice").coalesce(1),
        SORTED,
        row_group_bytes=64 * 1024,
    )
    (f,) = glob.glob(os.path.join(SORTED, "part-*.parquet"))
    yield f
    shutil.rmtree(SORTED, ignore_errors=True)


def test_multiple_row_groups_written(sorted_file):
    meta = pq.ParquetFile(sorted_file).metadata
    assert meta.num_row_groups >= 3, meta.num_row_groups


def test_partial_rowgroup_pruning(sorted_file):
    """A median threshold must keep some row groups and prune others:
    footer < planned(median) < planned(full)."""
    col = ["l_extendedprice"]
    full = planned_scan_bytes(sorted_file, col, None)
    median = planned_scan_bytes(
        sorted_file, col, [("l_extendedprice", ">", 53000.0)]
    )
    none_survive = planned_scan_bytes(
        sorted_file, col, [("l_extendedprice", ">", 1e12)]
    )
    assert none_survive == footer_bytes(sorted_file)
    assert none_survive < median < full


def test_sorted_scan_correctness(spark, sorted_file):
    """The re-laid-out file answers identically to the original."""
    orig = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    new = spark.read.parquet(sorted_file)
    f = F.col("l_extendedprice") > 53000.0
    assert new.filter(f).count() == orig.filter(f).count()
    a = new.filter(f).agg(F.sum("l_quantity")).collect()[0][0]
    b = orig.filter(f).agg(F.sum("l_quantity")).collect()[0][0]
    assert abs(a - b) < 1e-6