"""Semantic pins for the round-4 operators (beyond the registry oracle
differential): retention invariants, BPE pair-count exactness on a crafted
vocab, containment vs Jaccard on size-skewed near-dups, append-mode
emission rule."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquet_near_storage_compute_spark.operators.dedup import (
    shingle_containment,
)
from parquet_near_storage_compute_spark.operators.timeseries import (
    retention_cohorts,
)
from parquet_near_storage_compute_spark.operators.training import (
    BPE_TOP_K,
    bpe_pair_counts,
)


def test_retention_invariants(spark, sf_dir):
    rows = retention_cohorts(spark, sf_dir).collect()
    assert rows, "events corpus yields at least one cohort"
    by_cohort: dict[str, list] = {}
    for r in rows:
        by_cohort.setdefault(r.cohort_day, []).append(r)
    for cohort, rs in by_cohort.items():
        zero = [r for r in rs if r.day_offset == 0]
        assert len(zero) == 1, f"{cohort}: exactly one offset-0 row"
        assert zero[0].retention == 1.0
        for r in rs:
            assert 0 < r.n_users <= r.cohort_size
            assert abs(r.retention - r.n_users / r.cohort_size) < 1e-12
    # cohorts partition the user base: sizes sum to total distinct users
    from parquet_near_storage_compute_spark.tables import load_table

    total = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert sum(rs[0].cohort_size for rs in
               [[r for r in v if r.day_offset == 0] for v in by_cohort.values()]
               ) == total


def test_bpe_pair_counts_crafted(spark, monkeypatch, tmp_path):
    # corpus 'ab ab abc' ×1 doc: vocab {ab:2, abc:1} → pairs ab:3, bc:1
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"doc_id": [0], "text": ["ab ab abc"],
                  "lang": ["en"], "source": ["s"], "n_chars": [9]}),
        str(tmp_path / "documents.parquet"),
    )
    rows = {r.pair: r.n_occurrences
            for r in bpe_pair_counts(spark, str(tmp_path)).collect()}
    assert rows == {"ab": 3, "bc": 1}


def test_bpe_topk_is_bounded(spark, sf_dir):
    rows = bpe_pair_counts(spark, sf_dir).collect()
    assert 0 < len(rows) <= BPE_TOP_K
    ns = [r.n_occurrences for r in rows]
    assert ns == sorted(ns, reverse=True)
    assert all(len(r.pair) == 2 for r in rows)


def test_containment_catches_size_skewed_inclusion(spark, sf_dir):
    """Every containment hit is ≥ its Jaccard (min ≤ union), and the 0.7
    integer cut holds exactly."""
    rows = shingle_containment(spark, sf_dir).collect()
    for r in rows:
        assert 10 * r.n_shared >= 7 * r.min_size
        assert abs(r.containment - r.n_shared / r.min_size) < 1e-12


def test_cumulative_users_monotone_and_total(spark, sf_dir):
    from parquet_near_storage_compute_spark.operators.timeseries import (
        cumulative_distinct_users,
    )
    from parquet_near_storage_compute_spark.tables import load_table

    rows = cumulative_distinct_users(spark, sf_dir).collect()
    cums = [r.cum_users for r in rows]
    assert cums == sorted(cums)
    assert cums[-1] == sum(r.n_new_users for r in rows)
    total = (
        load_table(spark, sf_dir, "events")
        .agg(F.countDistinct("user_id"))
        .collect()[0][0]
    )
    assert cums[-1] == total


def test_anomaly_mad_flags_are_beyond_threshold(spark, sf_dir):
    from parquet_near_storage_compute_spark.operators.timeseries import (
        MAD_K,
        anomaly_mad,
    )

    for r in anomaly_mad(spark, sf_dir).collect():
        assert abs(r.n - r.med) > MAD_K * r.mad
