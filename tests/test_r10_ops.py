"""Focused properties for the round-10 operators, beyond the registry
oracle compare: the MinHash estimator calibration table
(`dedup_minhash_calibration`), the per-doc novel-trigram report
(`text_ngram_novelty`), and the session-window boundary semantics the
r10 randomized differential caught."""

from __future__ import annotations

import datetime as dt

import duckdb
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.functions.text import shingles, words
from parquet_near_storage_compute_spark.operators.dedup import (
    MINHASH_K,
    _lsh_candidates,
    _minhash_signatures,
    minhash_calibration,
)
from parquet_near_storage_compute_spark.operators.dedup import (
    ORACLE_SQL as DEDUP_ORACLES,
)
from parquet_near_storage_compute_spark.operators.textops import (
    ORACLE_SQL as TEXT_ORACLES,
    ngram_novelty,
)
from parquet_near_storage_compute_spark.tables import load_table
from tests.oracle import compare


def _docs_dir(spark, tmp_path, docs: dict[int, str]) -> tuple[str, object]:
    """Write a synthetic documents table; return (sf_dir, duckdb con)."""
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(2).write.mode("overwrite").parquet(out + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    return out, con


# ------------------------------------------------- minhash calibration
def test_calibration_cells_are_in_range(spark, sf_dir):
    rows = minhash_calibration(spark, sf_dir).collect()
    assert rows, "empty calibration table"
    for r in rows:
        # every candidate pair shares at least one band = LSH_ROWS equal
        # hashes (band-hash equality implies the banded minhashes match)
        assert 2 <= r["sig_agree"] <= MINHASH_K, r
        assert 0 <= r["jaccard_decile"] <= 10, r
        assert r["n_pairs"] >= 1, r


def test_calibration_covers_every_candidate_pair_exactly_once(spark, sf_dir):
    """sum(n_pairs) over the table == |LSH candidate pairs| — the
    calibration is a partition of the candidate set, nothing dropped or
    double-counted."""
    docs = load_table(spark, sf_dir, "documents")
    n_cand = _lsh_candidates(_minhash_signatures(docs)).count()
    total = (
        minhash_calibration(spark, sf_dir)
        .agg(F.sum("n_pairs").alias("t"))
        .collect()[0]["t"]
    )
    assert total == n_cand


def test_exact_duplicates_land_in_the_all_agree_decile10_cell(
    spark, tmp_path
):
    """Two identical docs have identical signatures (agree = MINHASH_K)
    and Jaccard exactly 1 (decile 10); an unrelated doc contributes no
    candidate pair with them."""
    text = "the quick brown fox jumps over the lazy dog again and again"
    out, con = _docs_dir(
        spark,
        tmp_path,
        {
            1: text,
            2: text,
            3: "completely different words about spark shuffles and parquet "
               "footers in a row group",
        },
    )
    compare(
        minhash_calibration(spark, out),
        con,
        DEDUP_ORACLES["dedup_minhash_calibration"],
    )
    cells = {
        (r["sig_agree"], r["jaccard_decile"]): r["n_pairs"]
        for r in minhash_calibration(spark, out).collect()
    }
    assert cells == {(MINHASH_K, 10): 1}


# ------------------------------------------------- ngram novelty
def test_novelty_counts_are_internally_consistent(spark, sf_dir):
    rows = ngram_novelty(spark, sf_dir).collect()
    assert rows, "empty novelty report"
    for r in rows:
        assert 0 <= r["n_novel"] <= r["n_grams"], r
        assert r["novelty_permille"] == (1000 * r["n_novel"]) // r["n_grams"]


def test_novelty_totals_match_global_gram_frequencies(spark, sf_dir):
    """Σ n_novel over docs == number of distinct grams with exactly one
    doc occurrence; Σ n_grams == number of distinct (doc, gram) pairs —
    the report is the per-doc marginal of the global gram histogram."""
    docs = load_table(spark, sf_dir, "documents")
    sh = docs.select(
        "doc_id",
        F.explode(F.array_distinct(shingles(words("text"), 3))).alias("s"),
    )
    n_doc_gram = sh.count()
    n_singleton = (
        sh.groupBy("s").count().filter(F.col("count") == 1).count()
    )
    agg = ngram_novelty(spark, sf_dir).agg(
        F.sum("n_grams").alias("g"), F.sum("n_novel").alias("n")
    ).collect()[0]
    assert agg["g"] == n_doc_gram
    assert agg["n"] == n_singleton


def test_duplicate_docs_have_zero_novelty_and_short_docs_drop_out(
    spark, tmp_path
):
    out, con = _docs_dir(
        spark,
        tmp_path,
        {
            1: "alpha beta gamma delta epsilon",
            2: "alpha beta gamma delta epsilon",
            3: "one entirely separate unique sentence here",
            4: "too short",  # < 3 words: no trigrams, no report row
        },
    )
    compare(ngram_novelty(spark, out), con, TEXT_ORACLES["text_ngram_novelty"])
    rows = {r["doc_id"]: r for r in ngram_novelty(spark, out).collect()}
    assert set(rows) == {1, 2, 3}
    assert rows[1]["n_novel"] == 0 and rows[2]["n_novel"] == 0
    assert rows[3]["n_novel"] == rows[3]["n_grams"]
    assert rows[3]["novelty_permille"] == 1000


# --------------------------------------- session-window gap boundary
def test_session_window_gap_boundary_is_end_inclusive(spark, tmp_path):
    """Two events EXACTLY 30 minutes apart share one session in Spark's
    session_window (merge while ts <= prev + gap); one second past the
    gap breaks. The r5 oracle modeled the boundary as exclusive (>=) and
    survived five rounds because the fixed corpus never lands on an exact
    gap; the r10 randomized differential's 10-second-grid corpus caught
    it. This pins BOTH the Spark semantics and the corrected oracle."""
    from parquet_near_storage_compute_spark.operators.timeseries import (
        ORACLE_SQL as TS_ORACLES,
        session_window_native,
    )

    base = dt.datetime(2024, 3, 1)
    rows = [
        (1, base, 9, "click", 1.0, "{}"),
        (2, base + dt.timedelta(seconds=1800), 9, "click", 1.0, "{}"),
        (3, base + dt.timedelta(seconds=3601), 9, "click", 1.0, "{}"),
    ]
    out = str(tmp_path / "boundary")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(out + "/events.parquet")
    got = session_window_native(spark, out).collect()
    assert len(got) == 1
    # events 1+2 merge (boundary-inclusive); event 3 is 1s past the gap
    assert got[0]["n_sessions"] == 2
    assert got[0]["max_session_events"] == 2
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{out}/events.parquet/*.parquet'"
    )
    compare(
        session_window_native(spark, out),
        con,
        TS_ORACLES["time_session_window_native"],
    )
