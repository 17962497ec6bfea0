"""Multi-file table layout (the reference's numbered-file model,
``v1/src/main.rs:119-131``): directory scans, per-file row-group pruning in
the byte accounting, and result equivalence to the single-file layout."""

from __future__ import annotations

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.scan_agg import LADDER
from parquet_near_storage_compute_spark.plans.metrics import planned_scan_bytes
from parquet_near_storage_compute_spark.tables import load_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
MULTI = os.path.join(TMP, "lineitem_multi")


@pytest.fixture(scope="module")
def multi_dir(spark):
    li = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    li.repartition(4).write.mode("overwrite").parquet(MULTI)
    yield MULTI
    shutil.rmtree(MULTI, ignore_errors=True)


def test_directory_scan_equals_single_file(spark, multi_dir):
    single = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    multi = spark.read.parquet(multi_dir)
    s = single.agg(F.sum("l_extendedprice"), F.count(F.lit(1))).collect()[0]
    m = multi.agg(F.sum("l_extendedprice"), F.count(F.lit(1))).collect()[0]
    assert s[1] == m[1]
    assert abs(s[0] - m[0]) < 1e-4


def test_per_file_pruning_accounting(multi_dir):
    """v2's accounting generalizes per file: best-case threshold keeps only
    footers across all files; worst case reads every chunk."""
    files = sorted(glob.glob(os.path.join(multi_dir, "part-*.parquet")))
    assert len(files) == 4
    col = ["l_extendedprice"]
    best = sum(
        planned_scan_bytes(f, col, [("l_extendedprice", ">", LADDER["best_case"])])
        for f in files
    )
    worst = sum(
        planned_scan_bytes(f, col, [("l_extendedprice", ">", LADDER["worst"])])
        for f in files
    )
    assert best < worst
    # each file contributes footer-only bytes in the best case
    from parquet_near_storage_compute_spark.plans.metrics import footer_bytes

    assert best == sum(footer_bytes(f) for f in files)


def test_partition_count_tracks_files(spark, multi_dir):
    multi = spark.read.parquet(multi_dir)
    assert multi.rdd.getNumPartitions() >= 1
    assert len(multi.inputFiles()) == 4
