"""Partition-pruned scans over the hive-partitioned events layout.

Partition pruning is the directory-level analogue of the reference's
row-group pruning (v1/src/main.rs:626-685): a filter on the partition
column removes whole directories at planning time, before any footer I/O.
The plan records it as ``PartitionFilters`` on the parquet scan — that
clause, not just the result values, is the contract here.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.plans.asserts import executed_plan
from parquet_near_storage_compute_spark.sources.io import (
    partitioned_events_path,
    partitioned_scan,
    read_parquet,
)


def _partition_filters(df) -> str:
    return "\n".join(
        line.strip()
        for line in executed_plan(df).splitlines()
        if "PartitionFilters" in line
    )


def test_partition_filter_in_plan(spark, sf_dir):
    partitioned_scan(spark, sf_dir).collect()  # materializes the layout
    df = read_parquet(spark, partitioned_events_path(sf_dir)).filter(
        F.col("event_type") == "click"
    )
    pf = _partition_filters(df)
    assert "event_type" in pf, f"partition filter not applied: {pf!r}"
    # the predicate must be a partition filter, not a pushed data filter:
    # event_type is a directory key, so the PushedFilters list stays empty
    import re

    plan = executed_plan(df)
    for m in re.finditer(r"PushedFilters: \[([^\]]*)\]", plan):
        assert "event_type" not in m.group(1), m.group(0)


def test_pruned_scan_reads_fewer_files(spark, sf_dir):
    """One partition value scans ~1/5 of the files the full scan touches."""
    partitioned_scan(spark, sf_dir).collect()
    path = partitioned_events_path(sf_dir)
    full = read_parquet(spark, path)
    one = full.filter(F.col("event_type") == "click")
    n_full = full.select(F.input_file_name()).distinct().count()
    n_one = one.select(F.input_file_name()).distinct().count()
    assert 0 < n_one < n_full


def test_partitioned_scan_matches_direct(spark, sf_dir):
    """The partitioned round-trip must agree with the straight events scan
    (the registry oracle re-proves this against DuckDB; this is the
    in-engine consistency check)."""
    from parquet_near_storage_compute_spark.tables import load_table

    got = {
        r.event_type: (r.n_events, r.sum_value)
        for r in partitioned_scan(spark, sf_dir).collect()
    }
    want = {
        r.event_type: (r.n_events, r.sum_value)
        for r in load_table(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in got:
        assert got[k][0] == want[k][0]
        assert abs(got[k][1] - want[k][1]) < 1e-6 * max(1.0, abs(want[k][1]))
