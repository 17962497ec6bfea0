"""Model-based quality scoring + importance resampling (new r6):
`text_quality_classifier` (hashed-bigram linear model, all-integer margins)
and `train_quality_resample` (md5-draw keep decisions by quality bucket).
Registry oracles cover full-corpus equality; these tests pin the devices:
the margin formula against a pure-Python recomputation, coverage of every
document (including < n-gram-length ones), resample accounting invariants,
and empty-corpus robustness."""

from __future__ import annotations

import hashlib

import pyspark.sql.functions as F

from parquet_near_storage_compute_spark.operators.textops import (
    QC_BUCKET_CLAMP,
    QC_BUCKET_SCALE,
    QC_DIM,
    QC_NGRAM,
    QC_WEIGHT_MOD,
    QC_WEIGHT_SHIFT,
    quality_classifier,
    quality_margins,
)
from parquet_near_storage_compute_spark.operators.training import (
    QR_BASE,
    QR_STEP,
    quality_resample,
)
from parquet_near_storage_compute_spark.tables import load_table


def _h32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def _py_margin(text: str) -> tuple[int, int]:
    ws = text.split(" ")
    grams = [
        " ".join(ws[i : i + QC_NGRAM]) for i in range(len(ws) - QC_NGRAM + 1)
    ] if len(ws) >= QC_NGRAM else []
    m = 0
    for g in grams:
        f_id = _h32(f"qf:{g}") % QC_DIM
        m += _h32(f"qw:{f_id}") % QC_WEIGHT_MOD - QC_WEIGHT_SHIFT
    return len(grams), m


def test_margin_matches_python_recomputation(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(5)
    got = {
        r.doc_id: (r.n_features, r.margin)
        for r in quality_margins(docs).collect()
    }
    for row in docs.select("doc_id", "text").collect():
        assert got[row.doc_id] == _py_margin(row.text), row.doc_id


def test_every_document_scored_including_short_ones(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    short = spark.createDataFrame(
        [(10_000_001, "one"), (10_000_002, "")], ["doc_id", "text"]
    )
    scored = {
        r.doc_id: (r.n_features, r.margin, r.quality_bucket)
        for r in quality_margins(docs.select("doc_id", "text").unionByName(short)).collect()
    }
    assert len(scored) == docs.count() + 2
    assert scored[10_000_001] == (0, 0, 0)  # < n words → zero-feature doc
    assert scored[10_000_002] == (0, 0, 0)


def test_bucket_is_clamped_margin_div(spark, sf_dir):
    for r in quality_classifier(spark, sf_dir).collect():
        want = max(
            -QC_BUCKET_CLAMP,
            min(QC_BUCKET_CLAMP, r.margin // QC_BUCKET_SCALE),
        )
        assert r.quality_bucket == want


def test_resample_accounting_invariants(spark, sf_dir):
    rows = quality_resample(spark, sf_dir).collect()
    classifier = quality_classifier(spark, sf_dir)
    by_bucket = {
        r.quality_bucket: r["count"]
        for r in classifier.groupBy("quality_bucket").count().collect()
    }
    assert {r.quality_bucket for r in rows} == set(by_bucket)
    for r in rows:
        assert r.keep_permille == QR_BASE + (r.quality_bucket + QC_BUCKET_CLAMP) * QR_STEP
        assert 0 < r.keep_permille <= 1000
        assert r.n_docs == by_bucket[r.quality_bucket]
        assert 0 <= r.n_kept <= r.n_docs
    # top bucket keeps everything (rate 1000‰ — no doc can draw ≥ 1000)
    top = [r for r in rows if r.keep_permille == 1000]
    for r in top:
        assert r.n_kept == r.n_docs


def test_quality_model_on_empty_corpus(spark, sf_dir):
    import os

    import pytest as _pytest  # noqa: F401

    from parquet_near_storage_compute_spark.tables import TABLES, table_path
    from tests.test_empty_corpus_r5c import EMPTY_DIR

    for t in TABLES:
        dst = table_path(EMPTY_DIR, t)
        if not os.path.exists(os.path.join(dst, "_SUCCESS")):
            spark.read.parquet(table_path(sf_dir, t)).limit(0).write.mode(
                "overwrite"
            ).parquet(dst)
    assert quality_classifier(spark, EMPTY_DIR).count() == 0
    assert quality_resample(spark, EMPTY_DIR).count() == 0
