"""`text_duplicate_window_fraction` (Lee et al. 2022 duplicate-text
accounting) and `sim_topk_prefix_rerank` (Matryoshka-style two-stage
retrieval). The registry sweep covers the oracle differentials; these pin
the hand-checkable window algebra (cross-doc span, within-doc repeat,
sub-window doc), the stage-1 float boundary margin, and the recall floor.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from parquet_near_storage_compute_spark.operators import similarity as S
from parquet_near_storage_compute_spark.operators import textops as TX
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
    def make(rows):
        out = str(tmp_path / "corpus")
        spark.createDataFrame(
            [(i, t, "en", "unit", len(t)) for i, t in enumerate(rows)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        return out

    return make


def test_dup_window_fraction_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        TX.duplicate_window_fraction(spark, sf_dir),
        con,
        TX.ORACLE_SQL["text_duplicate_window_fraction"],
    )


def test_dup_window_fraction_hand_algebra(spark, tiny_docs):
    """doc0 and doc1 share exactly one 8-word span (1 duplicated window
    each); doc2 is an 8-word phrase repeated twice (its first and ninth
    windows are the SAME sequence — a within-doc duplicate, no special
    case needed because occ >= 2 subsumes m >= 2); doc3 is shorter than
    the window; doc4 empty."""
    phrase = "w1 w2 w3 w4 w5 w6 w7 w8"
    d = tiny_docs(
        [
            phrase + " x y z",
            "p q " + phrase,
            "a b c d e f g h a b c d e f g h",
            "short words only",
            "",
        ]
    )
    rows = {
        r.doc_id: r for r in TX.duplicate_window_fraction(spark, d).collect()
    }
    assert (rows[0].n_windows, rows[0].n_dup_windows) == (4, 1)
    assert (rows[1].n_windows, rows[1].n_dup_windows) == (3, 1)
    assert (rows[2].n_windows, rows[2].n_dup_windows) == (9, 2)
    assert rows[2].dup_fraction == 2.0 / 9.0
    assert (rows[3].n_windows, rows[3].n_dup_windows, rows[3].dup_fraction) == (
        0,
        0,
        0.0,
    )
    assert (rows[4].n_windows, rows[4].dup_fraction) == (0, 0.0)
    con = duckdb.connect()
    _register(con, d)
    compare(
        TX.duplicate_window_fraction(spark, d),
        con,
        TX.ORACLE_SQL["text_duplicate_window_fraction"],
    )


def test_prefix_rerank_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        S.topk_prefix_rerank(spark, sf_dir),
        con,
        S.ORACLE_SQL["sim_topk_prefix_rerank"],
    )


def test_prefix_stage1_boundary_margin(sf_dir):
    """The only approximate cut is stage 1's rank RERANK_M vs RERANK_M+1
    on prefix cosine — its measured per-query gap must dwarf the ~1e-13
    cross-engine drift."""
    con = duckdb.connect()
    _register(con, sf_dir)
    gap = con.execute(
        f"""
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        p AS (SELECT vec_id, v[1:{S.PREFIX_DIMS}] AS p FROM v),
        r AS (
          SELECT a.vec_id AS q,
                 list_dot_product(a.p, b.p)
                   / (sqrt(list_dot_product(a.p, a.p))
                      * sqrt(list_dot_product(b.p, b.p))) AS c,
                 ROW_NUMBER() OVER (
                   PARTITION BY a.vec_id
                   ORDER BY list_dot_product(a.p, b.p)
                            / (sqrt(list_dot_product(a.p, a.p))
                               * sqrt(list_dot_product(b.p, b.p)))
                            DESC, b.vec_id) AS prk
          FROM p a JOIN p b ON b.vec_id != a.vec_id
          WHERE a.vec_id < {S.N_QUERIES}
        )
        SELECT MIN(x.c - y.c)
        FROM r x JOIN r y ON x.q = y.q
         AND x.prk = {S.RERANK_M} AND y.prk = {S.RERANK_M + 1}
        """
    ).fetchone()[0]
    assert gap is not None and gap > 1e-8, gap


def test_prefix_rerank_scores_exact_and_recall_floor(spark, sf_dir):
    """Survivor ranking is EXACT: every returned pair's cos_sim must be
    bitwise the full-width cosine (DuckDB replay), and recall vs brute
    force clears the measured floor."""
    con = duckdb.connect()
    _register(con, sf_dir)
    full = {
        (q, c): cos
        for q, c, cos in con.execute(
            f"""
            WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
            SELECT a.vec_id, b.vec_id,
                   list_dot_product(a.v, b.v)
                     / (sqrt(list_dot_product(a.v, a.v))
                        * sqrt(list_dot_product(b.v, b.v)))
            FROM v a JOIN v b ON b.vec_id != a.vec_id
            WHERE a.vec_id < {S.N_QUERIES}
            """
        ).fetchall()
    }
    rows = S.topk_prefix_rerank(spark, sf_dir).collect()
    assert len(rows) == S.N_QUERIES * S.TOP_K
    for r in rows:
        assert r.cos_sim == full[(r.query_id, r.cand_id)], r
    exact = {
        (r.query_id, r.cand_id)
        for r in S.topk_bruteforce(spark, sf_dir).collect()
    }
    got = {(r.query_id, r.cand_id) for r in rows}
    assert len(exact & got) >= int(0.8 * len(exact)), len(exact & got)
