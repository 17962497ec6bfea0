"""Focused invariants for the r12 optimization-round internals changes.

Each test pins the EQUIVALENCE a specific optimization relied on, so a
future edit that silently breaks the assumption fails here rather than in
a full oracle sweep:

- `_shingle_features` moved its ``size(sset) > 0`` row-set restriction
  ABOVE the persisted frame (the filter-below form was pushed under the
  projection and double-evaluated the tokenize+shingle chain during cache
  materialization). The returned row set must still be exactly the old
  explode-form row set: documents with ≥ 1 shingle, no empty arrays.
- `train_context_length_fit` replaced the ×len(CONTEXT_LENGTHS) pre-agg
  explode with a single-pass bank of conditional aggregates; the report
  must still partition the corpus per L (n_docs == |documents| in every
  row, one row per candidate L).
"""

from __future__ import annotations

from pyspark.sql import functions as F


def test_shingle_features_row_set_matches_explode_form(spark, sf_dir):
    """The filtered view over the unfiltered cache reproduces the old
    explode + groupBy row set: every doc with ≥ 3 words, nothing else."""
    from parquet_near_storage_compute_spark.operators.dedup import (
        _shingle_features,
    )
    from parquet_near_storage_compute_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents")
    feats = _shingle_features(docs)
    try:
        got = {r["doc_id"] for r in feats.select("doc_id").collect()}
        expect = {
            r["doc_id"]
            for r in docs.select(
                "doc_id", F.size(F.split("text", " ")).alias("nw")
            )
            .filter(F.col("nw") >= 3)
            .collect()
        }
        assert got == expect
        assert feats.filter(F.size("sset") == 0).count() == 0
        # the signature columns must be non-null on every returned row
        # (array_min over a non-empty digest array)
        assert feats.filter(F.col("mh0").isNull()).count() == 0
    finally:
        spark.catalog.clearCache()


def test_context_length_fit_partitions_corpus_per_length(spark, sf_dir):
    from parquet_near_storage_compute_spark.operators.training import (
        CONTEXT_LENGTHS,
        context_length_fit,
    )
    from parquet_near_storage_compute_spark.tables import load_table

    n_docs = load_table(spark, sf_dir, "documents").count()
    rows = context_length_fit(spark, sf_dir).collect()
    assert [r["context_len"] for r in rows] == list(CONTEXT_LENGTHS)
    for r in rows:
        assert r["n_docs"] == n_docs
        # every doc occupies one L-token window: kept + padding = L·fit
        # for fit-whole docs, kept = L for truncated ones
        assert (
            r["tokens_kept"] + r["padding_tokens"]
            == r["context_len"] * r["n_docs"]
        )
