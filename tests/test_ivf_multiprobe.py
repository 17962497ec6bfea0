"""Multiprobe IVF (`sim_topk_ivf_mp`): the nprobe recall dial.

The registry sweep differentially checks the contract; these tests pin
what a green sweep can't — the probe-set float boundary's measured margin,
the cell-subsumption of every returned candidate, and the recall theorem
(probing more cells can only help: an exact-top-k member present in the
candidate set is always returned, and multiprobe's candidate set is a
superset of single-probe's).
"""

from __future__ import annotations

import os

import duckdb

from parquet_near_storage_compute_spark.operators import similarity as S
from tests.oracle import compare

_CELLS_SQL = """
    WITH pos AS (
      SELECT vec_id, label, generate_subscripts(embedding, 1) AS pos,
             unnest(embedding::DOUBLE[]) AS x
      FROM embeddings
    ),
    cent AS (SELECT label, pos, AVG(x) AS c FROM pos GROUP BY label, pos),
    cvec AS (SELECT label AS cell, list(c ORDER BY pos) AS centroid
             FROM cent GROUP BY label),
    v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    ranked AS (
      SELECT v.vec_id, c.cell,
             list_dot_product(v.v, c.centroid)
               / (sqrt(list_dot_product(v.v, v.v))
                  * sqrt(list_dot_product(c.centroid, c.centroid))) AS cc,
             ROW_NUMBER() OVER (
               PARTITION BY v.vec_id
               ORDER BY list_dot_product(v.v, c.centroid)
                        / (sqrt(list_dot_product(v.v, v.v))
                           * sqrt(list_dot_product(c.centroid, c.centroid)))
                        DESC, c.cell) AS crk
      FROM v CROSS JOIN cvec c
    )
"""


def _register(con, sf_dir):
    p = os.path.join(sf_dir, "embeddings.parquet")
    con.execute(f"CREATE VIEW embeddings AS SELECT * FROM '{p}'")


def test_ivf_mp_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        S.topk_ivf_mp(spark, sf_dir), con, S.ORACLE_SQL["sim_topk_ivf_mp"]
    )


def test_probe_boundary_margin(sf_dir):
    """The probe set is a float ranking (cell_cos); the boundary that
    matters is rank NPROBE vs NPROBE+1 (and rank 1 vs 2 for the candidate
    side, shared with sim_topk_ivf). Both measured gaps must dwarf the
    ~1e-13 cross-engine cosine drift."""
    con = duckdb.connect()
    _register(con, sf_dir)
    for lo, hi in ((1, 2), (S.NPROBE, S.NPROBE + 1)):
        gap = con.execute(
            _CELLS_SQL
            + f"""
            SELECT MIN(a.cc - b.cc)
            FROM ranked a JOIN ranked b
              ON a.vec_id = b.vec_id AND a.crk = {lo} AND b.crk = {hi}
            """
        ).fetchone()[0]
        assert gap is not None and gap > 1e-8, (lo, hi, gap)


def test_ivf_mp_recall_and_cell_subsumption(spark, sf_dir):
    """Multiprobe recall >= single-probe recall per query (its candidate
    set is a superset and any global-top-k member in the set must be
    returned); every returned candidate's home cell is one of the query's
    NPROBE probed cells; exactly k rows per query."""
    exact = {
        (r.query_id, r.cand_id)
        for r in S.topk_bruteforce(spark, sf_dir).collect()
    }
    ivf = {(r.query_id, r.cand_id) for r in S.topk_ivf(spark, sf_dir).collect()}
    mp_rows = S.topk_ivf_mp(spark, sf_dir).collect()
    mp = {(r.query_id, r.cand_id) for r in mp_rows}
    assert len(mp) == S.N_QUERIES * S.TOP_K
    for q in range(S.N_QUERIES):
        e_q = {c for (qq, c) in exact if qq == q}
        assert len({c for (qq, c) in mp if qq == q} & e_q) >= len(
            {c for (qq, c) in ivf if qq == q} & e_q
        ), q

    con = duckdb.connect()
    _register(con, sf_dir)
    probed: dict[int, set[int]] = {}
    home: dict[int, int] = {}
    for vec_id, cell, crk in con.execute(
        _CELLS_SQL + "SELECT vec_id, cell, crk FROM ranked"
    ).fetchall():
        if crk == 1:
            home[vec_id] = cell
        if crk <= S.NPROBE:
            probed.setdefault(vec_id, set()).add(cell)
    for q, c in mp:
        assert home[c] in probed[q], (q, c)
