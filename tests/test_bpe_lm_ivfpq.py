"""Round-7 session-4 operators: the iterative BPE merge loop
(`train_bpe_merges`), the bigram-LM perplexity filter
(`text_lm_perplexity`), and the IVF-PQ ANN composition
(`sim_topk_ivf_pq`).

The registry sweep (test_registry_oracle.py) already differentially
checks all three on the committed corpora; these tests pin the parts a
green sweep alone can't prove — the greedy within-word merge order, the
fixed-point floor margins and integer keep gate, the degenerate-document
path, and the cell-subsumption claim of the IVF composition.
"""

from __future__ import annotations

import math
import os

import duckdb
import pyspark.sql.functions as F
import pytest

from parquet_near_storage_compute_spark.operators import similarity as S
from parquet_near_storage_compute_spark.operators import textops as TX
from parquet_near_storage_compute_spark.operators import training as TR
from tests.oracle import compare


def _register(con, sf_dir):
    for t in ("documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}/*.parquet'")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")


@pytest.fixture()
def tiny_docs(spark, tmp_path):
    """Hand-sized corpus factory: fully hand-checkable merge trajectories,
    including a bracket character inside one word (the defensive-strip
    path)."""

    def make(rows):
        out = str(tmp_path / "corpus")
        spark.createDataFrame(
            [
                (i, t, "en", "unit", len(t))
                for i, t in enumerate(rows)
            ],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        return out

    return make


def test_bpe_merges_hand_trajectory(spark, tiny_docs):
    """Corpus 'aaa aaa ab': round 1 merges (a,a) n=4 (greedy left-to-right
    inside 'aaa' yields 'aa'+'a', NOT three overlapping pairs merged),
    round 2 (aa,a) n=2, round 3 (a,b) n=1, rounds 4-6 have no pairs left
    and emit nothing."""
    d = tiny_docs(["aaa aaa ab"])
    rows = sorted(
        tuple(r) for r in TR.bpe_merges(spark, d).collect()
    )
    assert rows == [
        (1, "a", "a", "aa", 4),
        (2, "aa", "a", "aaa", 2),
        (3, "a", "b", "ab", 1),
    ]


def test_bpe_merges_oracle_on_adversarial_corpus(spark, tiny_docs):
    """Spark and DuckDB agree on a corpus exercising the greedy-overlap
    path ('aaaa'), the defensive bracket strip ('a<b>' → 'ab'),
    tie-breaks, and words containing line terminators — without the
    (?s) DOTALL flag on the packing regex, Java regex skips \\r (and
    RE2 keeps it), so the engines would wrap different characters and
    the '\\r' in 'x\\ry' would break the brackets-never-shared
    invariant."""
    d = tiny_docs(
        ["aaaa aaaa baa", "a<b> ab ab", "zz zz zz", "x\ry x\ry a\nb"]
    )
    con = duckdb.connect()
    _register(con, d)
    compare(TR.bpe_merges(spark, d), con, TR.ORACLE_SQL["train_bpe_merges"])
    compare(TR.bpe_encode(spark, d), con, TR.ORACLE_SQL["train_bpe_encode"])
    # the \r word must tokenize as 3 chars → with (x, \r) or (\r, y)
    # mergeable like any pair; doc 3 has 3 words, all length-3 or -2
    rows = {r.doc_id: r for r in TR.bpe_encode(spark, d).collect()}
    assert rows[3].n_words == 3


def test_bpe_merges_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        TR.bpe_merges(spark, sf_dir), con, TR.ORACLE_SQL["train_bpe_merges"]
    )


def test_bpe_first_round_consistent_with_pair_counts(spark, sf_dir):
    """Round 1 of the merge loop must be exactly the argmax of
    train_bpe_pair_counts (the first-round statistic contract)."""
    top = TR.bpe_pair_counts(spark, sf_dir).limit(1).collect()[0]
    r1 = [r for r in TR.bpe_merges(spark, sf_dir).collect() if r.merge_round == 1][0]
    assert (r1.lhs + r1.rhs, r1.n_occurrences) == (
        top.pair,
        top.n_occurrences,
    )


def test_lm_perplexity_matches_oracle_bitwise(spark, sf_dir):
    """The fixed-point design's whole point: raw doubles equal, no
    normalization allowed."""
    con = duckdb.connect()
    _register(con, sf_dir)
    srows = sorted(tuple(r) for r in TX.lm_perplexity(spark, sf_dir).collect())
    drows = sorted(
        tuple(r)
        for r in con.execute(TX.ORACLE_SQL["text_lm_perplexity"]).fetchall()
    )
    assert srows == drows


def test_lm_perplexity_floor_margin(sf_dir):
    """Every distinct per-bigram log-prob must sit far from its fixed-point
    floor boundary relative to ln's last-ulp cross-engine wobble (observed
    ~4e-16 relative ≈ 1e-9 in scaled units; demand ≥ 1e-6)."""
    con = duckdb.connect()
    _register(con, sf_dir)
    margin, n = con.execute(
        f"""
        WITH b0 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
        uni AS (SELECT COUNT(DISTINCT w) AS vsz
                FROM (SELECT unnest(ws) AS w FROM b0)),
        big AS (SELECT doc_id, pr[1] AS w1, pr[2] AS w2 FROM (
          SELECT doc_id, unnest(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS pr
          FROM b0)),
        cb AS (SELECT w1, w2, COUNT(*) AS c2 FROM big GROUP BY w1, w2),
        ch AS (SELECT w1, COUNT(*) AS c1 FROM big GROUP BY w1),
        x AS (SELECT DISTINCT
                ln(CAST(cb.c2+1 AS DOUBLE)/CAST(ch.c1+uni.vsz AS DOUBLE))
                  * {TX.LM_SCALE}.0 AS s
              FROM big JOIN cb USING (w1, w2) JOIN ch USING (w1) CROSS JOIN uni)
        SELECT MIN(LEAST(s - floor(s), ceil(s) - s)), COUNT(*) FROM x
        """
    ).fetchone()
    assert n > 0
    assert margin >= 1e-6, margin


def test_lm_perplexity_gate_splits_and_is_integer_exact(spark, sf_dir):
    """The gate must actually separate the corpus (both decisions occur)
    and, being an integer comparison, must agree exactly with a Python
    integer replay of -sq <= GATE * n."""
    rows = TX.lm_perplexity(spark, sf_dir).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)
    for r in rows:
        if r.n_bigrams == 0:
            assert r.keep == 0 and r.avg_nll == 0.0
            continue
        sq = -round(r.avg_nll * TX.LM_SCALE * r.n_bigrams)
        assert r.keep == int(-sq <= TX.LM_NLL_KEEP_FP * r.n_bigrams), r


def test_lm_perplexity_degenerate_docs(spark, tiny_docs):
    """Empty and single-word documents have no bigrams: n_bigrams=0,
    avg_nll=0.0, keep=0 — and the oracle agrees on the same corpus."""
    d = tiny_docs(["", "hello", "the cat sat on the mat", "the cat sat"])
    con = duckdb.connect()
    _register(con, d)
    compare(
        TX.lm_perplexity(spark, d), con, TX.ORACLE_SQL["text_lm_perplexity"]
    )
    rows = {r.doc_id: r for r in TX.lm_perplexity(spark, d).collect()}
    assert rows[0].n_bigrams == 0 and rows[0].keep == 0
    assert rows[1].n_bigrams == 0 and rows[1].keep == 0
    assert rows[2].n_bigrams == 5 and rows[3].n_bigrams == 2


def test_lm_perplexity_scores_are_plausible_nll(spark, sf_dir):
    """avg_nll must equal -(Σ floor-quantized ln P)/n per doc — spot-check
    magnitude: within [0, ln(V_max)] for any corpus (perplexity can never
    exceed the smoothed event space)."""
    rows = [r for r in TX.lm_perplexity(spark, sf_dir).collect() if r.n_bigrams]
    assert rows
    for r in rows:
        assert 0.0 < r.avg_nll < math.log(10_000_000), r


def test_ivf_pq_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        S.topk_ivf_pq(spark, sf_dir), con, S.ORACLE_SQL["sim_topk_ivf_pq"]
    )


def test_ivf_pq_bit_identical_and_subsumed_by_cells(spark, sf_dir):
    """IVF-PQ = PQ's ADC scoring restricted to the query's coarse cell:
    raw doubles must match the oracle bit-for-bit, and every returned
    candidate must share the query's cell assignment."""
    con = duckdb.connect()
    _register(con, sf_dir)
    srows = sorted(tuple(r) for r in S.topk_ivf_pq(spark, sf_dir).collect())
    drows = sorted(
        tuple(r)
        for r in con.execute(S.ORACLE_SQL["sim_topk_ivf_pq"]).fetchall()
    )
    assert srows == drows
    cells = dict(
        con.execute(
            """
            WITH pos AS (
              SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
                     unnest(embedding::DOUBLE[]) AS x
              FROM embeddings
            ),
            cent AS (SELECT label, pos, AVG(x) AS c FROM pos GROUP BY label, pos),
            cvec AS (SELECT label AS cell, list(c ORDER BY pos) AS centroid
                     FROM cent GROUP BY label),
            v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT vec_id, cell FROM (
              SELECT v.vec_id, c.cell,
                     ROW_NUMBER() OVER (
                       PARTITION BY v.vec_id
                       ORDER BY list_dot_product(v.v, c.centroid)
                                / (sqrt(list_dot_product(v.v, v.v))
                                   * sqrt(list_dot_product(c.centroid, c.centroid)))
                                DESC, c.cell) AS crk
              FROM v CROSS JOIN cvec c
            ) WHERE crk = 1
            """
        ).fetchall()
    )
    for q, cand, _, _ in srows:
        assert cells[q] == cells[cand], (q, cand)


def test_ivf_pq_recall_is_cell_bound(spark, sf_dir):
    """On this near-random corpus the composition's recall equals the IVF
    parent's (measured: the single-probe cell restriction is the binding
    loss; PQ distortion costs nothing additional at k=3) — pin that
    IVF-PQ never recalls FEWER exact pairs than IVF-SQ8 minus slack, and
    that all three IVF variants return exactly k rows per query."""
    exact = {
        (r.query_id, r.cand_id)
        for r in S.topk_bruteforce(spark, sf_dir).collect()
    }
    ivf = {(r.query_id, r.cand_id) for r in S.topk_ivf(spark, sf_dir).collect()}
    ivfpq = {
        (r.query_id, r.cand_id) for r in S.topk_ivf_pq(spark, sf_dir).collect()
    }
    assert len(ivfpq) == len(ivf) == S.N_QUERIES * S.TOP_K
    assert len(exact & ivfpq) >= len(exact & ivf) - 2


def test_bpe_encode_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        TR.bpe_encode(spark, sf_dir), con, TR.ORACLE_SQL["train_bpe_encode"]
    )


def test_bpe_encode_hand_trajectory(spark, tiny_docs):
    """'abcdefgh ij': the lexicographic tie-break cascades the merges down
    one word (ab, abc, ..., abcdefg over 6 rounds), leaving 'abcdefgh' as
    2 tokens and 'ij' unmerged at 2 — a PARTIAL encode, not the all-or-
    nothing the sf corpora mostly produce. Empty docs count 0 words; a
    1-char word is a single token (present in the encode vocabulary even
    though it can never participate in a merge)."""
    d = tiny_docs(["abcdefgh ij", "", "q"])
    rows = {r.doc_id: r for r in TR.bpe_encode(spark, d).collect()}
    assert (rows[0].n_words, rows[0].n_tokens, rows[0].tokens_per_word) == (
        2,
        4,
        2.0,
    )
    assert (rows[1].n_words, rows[1].n_tokens, rows[1].tokens_per_word) == (
        0,
        0,
        0.0,
    )
    assert (rows[2].n_words, rows[2].n_tokens, rows[2].tokens_per_word) == (
        1,
        1,
        1.0,
    )
    con = duckdb.connect()
    _register(con, d)
    compare(TR.bpe_encode(spark, d), con, TR.ORACLE_SQL["train_bpe_encode"])


def test_bpe_encode_trains_the_same_merges(spark, sf_dir):
    """bpe_encode re-derives its merge table over the FULL (len >= 1)
    vocabulary; train_bpe_merges trains on the len >= 2 subset. The
    trajectories must be identical — 1-char words contribute no adjacent
    pairs, so the filter is a row-count optimization, not a semantic
    choice. This pins that equivalence (if it broke, encode would silently
    tokenize with a different tokenizer than the published merge table)."""
    import pyspark.sql.functions as F
    from parquet_near_storage_compute_spark.tables import fan_out
    from parquet_near_storage_compute_spark.operators.training import (
        _bpe_loop,
        _bpe_pack,
        BPE_L,
        BPE_R,
        load_table,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = (
        fan_out(docs)
        .select(F.explode(F.split("text", " ")).alias("raw"))
        .select(F.translate(F.col("raw"), BPE_L + BPE_R, "").alias("word"))
    )
    out = []
    for min_len in (1, 2):
        vocab = (
            base.filter(F.length("word") >= min_len)
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        toks = vocab.select(
            "word", "n", _bpe_pack().alias("t")
        ).localCheckpoint()
        rounds, _ = _bpe_loop(toks)
        out.append([tuple(r) for r in rounds])
    assert out[0] == out[1]


def test_pack_bpe_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(TR.pack_bpe(spark, sf_dir), con, TR.ORACLE_SQL["train_pack_bpe"])


def test_pack_bpe_consistent_with_encode(spark, sf_dir):
    """The packing manifest's token total must equal the encode report's
    (same tokenizer, same corpus — the composition is conservative), and
    differ from the whitespace manifest's total whenever any merge fired
    (BPE merges strictly reduce token counts vs characters but here vs
    whitespace words the totals differ unless no word ever merged)."""
    packed = TR.pack_bpe(spark, sf_dir).collect()
    enc_total = (
        TR.bpe_encode(spark, sf_dir)
        .agg(F.sum("n_tokens").alias("s"))
        .collect()[0]
        .s
    )
    assert sum(r.total_tokens for r in packed) == enc_total
    ws = TR.pack_sequences(spark, sf_dir).collect()
    assert {r.bin_id for r in packed} is not None
    assert sum(r.n_docs for r in packed) == sum(r.n_docs for r in ws)


def test_uniform_sample_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        TR.uniform_sample(spark, sf_dir),
        con,
        TR.ORACLE_SQL["train_uniform_sample"],
    )


def test_uniform_sample_partition_invariant_and_heap_planned(spark, sf_dir):
    """The sample must be a pure function of the keys (identical under a
    different partitioning) and must execute as TakeOrderedAndProject —
    a per-partition top-n heap — never a range-partitioned global sort."""
    a = sorted(tuple(r) for r in TR.uniform_sample(spark, sf_dir).collect())
    df = TR.uniform_sample(spark, sf_dir)
    assert len(a) == min(
        TR.SAMPLE_N,
        TR.load_table(spark, sf_dir, "documents").count(),
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan, plan
    import re

    assert not re.search(r"Sort \[[^\]]*\], true, 0", plan), plan
    spark.conf.set("spark.sql.shuffle.partitions", "7")
    try:
        b = sorted(
            tuple(r) for r in TR.uniform_sample(spark, sf_dir).collect()
        )
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", "32")
    assert a == b
