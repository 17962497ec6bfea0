"""Boundary robustness for the reusable engine primitives: empty inputs
and degenerate shapes must produce empty/correct results, not crashes —
the behavior a pipeline hits when a filter stage eliminates everything."""

from __future__ import annotations

import pyspark.sql.functions as F

from parquet_near_storage_compute_spark.operators.dedup import (
    _banded_buckets,
    _bands,
    _bucket_pairs,
    _minhash_signatures,
)
from parquet_near_storage_compute_spark.operators.windows import (
    exact_ntile,
    global_positions,
)


def _empty_docs(spark):
    return spark.createDataFrame([], "doc_id long, text string")


def test_minhash_pipeline_on_empty_corpus(spark):
    sig = _minhash_signatures(_empty_docs(spark))
    pairs = _bucket_pairs(_banded_buckets(_bands(sig), ["band", "bh"]))
    assert pairs.count() == 0


def test_bucket_path_on_empty_bands(spark):
    bands = spark.createDataFrame([], "doc_id long, band int, bh string")
    buckets = _banded_buckets(bands, ["band", "bh"])
    assert buckets.count() == 0
    assert _bucket_pairs(buckets).count() == 0


def test_global_positions_empty_and_single(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert global_positions(empty, [F.col("v"), F.col("id")]).count() == 0
    one = spark.createDataFrame([(7, 42)], "id long, v long")
    rows = global_positions(one, [F.col("v"), F.col("id")]).collect()
    assert [(r.id, r.p, r.n_total) for r in rows] == [(7, 1, 1)]


def test_exact_ntile_empty(spark):
    empty = spark.createDataFrame([], "id long, v long")
    assert exact_ntile(empty, [F.col("v"), F.col("id")], 4).count() == 0


def test_single_doc_corpus_has_no_pairs(spark):
    docs = spark.createDataFrame(
        [(1, "just one document here")], "doc_id long, text string"
    )
    sig = _minhash_signatures(docs)
    pairs = _bucket_pairs(_banded_buckets(_bands(sig), ["band", "bh"]))
    assert pairs.count() == 0


def test_contamination_report_empty_and_eval_only(spark):
    from parquet_near_storage_compute_spark.operators.training import (
        _contamination_report,
    )

    assert _contamination_report(_empty_docs(spark)).count() == 0
    # eval-only corpus (every doc_id % 20 == 0): no train side, no hits
    ev_only = spark.createDataFrame(
        [(0, "aa bb cc dd ee ff"), (20, "aa bb cc dd ee gg")],
        "doc_id long, text string",
    )
    assert _contamination_report(ev_only).count() == 0


def test_pii_report_empty(spark):
    from parquet_near_storage_compute_spark.operators.textops import (
        _pii_report,
    )

    empty = spark.createDataFrame([], "corpus string, doc_id long, text string")
    assert _pii_report(empty).count() == 0


def test_decisions_on_empty_and_singleton(spark):
    from parquet_near_storage_compute_spark.operators.dedup import (
        minhash_dedup_decisions,
    )

    assert minhash_dedup_decisions(_empty_docs(spark)).count() == 0
    one = spark.createDataFrame(
        [(5, "one single document with plenty of words")],
        "doc_id long, text string",
    )
    rows = minhash_dedup_decisions(one).collect()
    assert [(r.doc_id, r.keep, r.reason) for r in rows] == [(5, True, "unique")]


def test_propagate_min_labels_empty_edges(spark):
    from parquet_near_storage_compute_spark.operators.dedup import (
        propagate_min_labels,
    )

    edges = spark.createDataFrame([], "doc_a long, doc_b long")
    assert propagate_min_labels(edges).count() == 0


def test_dedup_segments_degenerate_docs(spark, tmp_path):
    """Single-word, exactly-10-word, 11-word, and duplicated docs: segment
    counts and cross-doc sharing must come out exactly (round-5 kernel)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_near_storage_compute_spark.operators.textops import (
        dedup_segments,
    )

    ten = " ".join(f"w{i}" for i in range(10))
    eleven = ten + " extra"
    rows = {
        1: "solo",            # 1 segment, unshared
        2: ten,               # 1 segment, shared with doc 3
        3: ten,               # duplicate of doc 2
        4: eleven,            # 2 segments: ten (shared) + "extra"
    }
    table = pa.table(
        {
            "doc_id": pa.array(list(rows), pa.int64()),
            "text": pa.array(list(rows.values())),
            "lang": pa.array(["en"] * 4),
            "source": pa.array(["t"] * 4),
            "n_chars": pa.array([len(v) for v in rows.values()], pa.int64()),
        }
    )
    pq.write_table(table, str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: (r["n_segments"], r["n_shared_segments"])
        for r in dedup_segments(spark, str(tmp_path)).collect()
    }
    assert out == {1: (1, 0), 2: (1, 1), 3: (1, 1), 4: (2, 1)}


def test_range_search_empty_embeddings(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_near_storage_compute_spark.operators.similarity import (
        range_search,
    )

    table = pa.table(
        {
            "vec_id": pa.array([], pa.int64()),
            "embedding": pa.array([], pa.list_(pa.float32())),
            "label": pa.array([], pa.int32()),
        }
    )
    pq.write_table(table, str(tmp_path / "embeddings.parquet"))
    assert range_search(spark, str(tmp_path)).count() == 0
