"""Empty-corpus robustness for the round-5 third-session operators: a
pipeline whose upstream filter eliminated everything must flow empty
frames through, not crash (the same discipline test_empty_inputs.py
applies to the reusable kernels)."""

from __future__ import annotations

import os

import pytest

from parquet_near_storage_compute_spark.tables import TABLES, table_path

EMPTY_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".tmp",
    "empty_corpus",
)


@pytest.fixture(scope="module")
def empty_sf_dir(spark, sf_dir):
    """A corpus directory with every table present but zero rows."""
    for t in TABLES:
        dst = table_path(EMPTY_DIR, t)
        if not os.path.exists(os.path.join(dst, "_SUCCESS")):
            spark.read.parquet(table_path(sf_dir, t)).limit(0).write.mode(
                "overwrite"
            ).parquet(dst)
    return EMPTY_DIR


def test_sketches_on_empty_corpus(spark, empty_sf_dir):
    from parquet_near_storage_compute_spark.operators import sketches

    assert sketches.countmin(spark, empty_sf_dir).count() == 0
    assert sketches.bloom_membership(spark, empty_sf_dir).count() == 0
    assert sketches.kmv_distinct(spark, empty_sf_dir).count() == 0
    assert sketches.kmv_overlap(spark, empty_sf_dir).count() == 0
    # hll emits its ALL row even on empty input; the oracle pins the flag
    # to 1, so the 0/0 case must yield 1, not NULL→0 (r6, ADVICE)
    rows = sketches.hll_distinct(spark, empty_sf_dir).collect()
    assert [(r.event_type, r.n_exact, r.est_within_tol) for r in rows] == [
        ("ALL", 0, 1)
    ]


def test_maintenance_ops_on_empty_corpus(spark, empty_sf_dir):
    from parquet_near_storage_compute_spark.operators.aggregates import (
        approx_percentile_sketch,
        bitmap_distinct,
    )
    from parquet_near_storage_compute_spark.operators.dedup import (
        incremental_dedup,
    )
    from parquet_near_storage_compute_spark.operators.relational import (
        merge_upsert,
        scd2_history,
    )

    assert incremental_dedup(spark, empty_sf_dir).count() == 0
    assert merge_upsert(spark, empty_sf_dir).count() == 0
    assert scd2_history(spark, empty_sf_dir).count() == 0
    rows = bitmap_distinct(spark, empty_sf_dir).collect()
    assert [(r.event_type, r.n_distinct) for r in rows] == [("ALL", 0)]
    # global agg yields one row of NULL percentiles; flags must not crash
    assert approx_percentile_sketch(spark, empty_sf_dir).count() == 1


def test_timeseries_ops_on_empty_corpus(spark, empty_sf_dir):
    from parquet_near_storage_compute_spark.operators.timeseries import (
        markov_transitions,
        ohlc_bars,
    )

    assert ohlc_bars(spark, empty_sf_dir).count() == 0
    assert markov_transitions(spark, empty_sf_dir).count() == 0


def test_ingest_pipeline_on_empty_corpus(spark, empty_sf_dir):
    from parquet_near_storage_compute_spark.operators.pipeline import (
        incremental_ingest_pipeline,
    )

    assert incremental_ingest_pipeline(spark, empty_sf_dir).count() == 0
