"""`sim_topk_sq8` (r7): int8 scalar-quantized cosine top-k — the
memory-bandwidth ANN scale path (FAISS "SQ8 flat").

The contract's unusual property: scoring is PURE INTEGER algebra over the
codes (dots and norms² are exact longs; the per-vector scale cancels out
of the cosine), so Spark and DuckDB must agree BIT-FOR-BIT — no epsilon,
no summation-order caveat. This file pins that, the quantization law's
invariants, and the measured recall vs exact float cosine."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from parquet_near_storage_compute_spark.operators import similarity as S
from tests.oracle import compare


def _register(con, sf_dir):
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )


def test_contract_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(S.topk_sq8(spark, sf_dir), con, S.ORACLE_SQL["sim_topk_sq8"])


def test_scores_bit_identical_across_engines(spark, sf_dir):
    """Stronger than the rounded compare: raw double equality of every
    (query, cand, score, rank) tuple — the integer-derived score claim."""
    con = duckdb.connect()
    _register(con, sf_dir)
    srows = sorted(tuple(r) for r in S.topk_sq8(spark, sf_dir).collect())
    drows = sorted(
        tuple(r) for r in con.execute(S.ORACLE_SQL["sim_topk_sq8"]).fetchall()
    )
    assert srows == drows


def _np_codes(V: np.ndarray) -> np.ndarray:
    scale = np.abs(V).max(axis=1, keepdims=True)
    safe = np.where(scale == 0, 1.0, scale)
    codes = np.floor(V * 127.0 / safe + 0.5).astype(np.int64)
    return np.where(scale == 0, 0, codes)


def test_quantization_law_invariants(sf_dir):
    """Codes bounded in [−127, 127]; cosine-from-codes is invariant under
    exact power-of-two rescaling of the input vector (the scale divides
    out, and 2^k multiplication is float-exact, so codes are IDENTICAL —
    quantized cosine similarity is a function of direction only)."""
    con = duckdb.connect()
    V = np.array(
        con.execute(
            f"SELECT embedding FROM '{sf_dir}/embeddings.parquet'"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    codes = _np_codes(V)
    assert codes.max() <= 127 and codes.min() >= -127
    # the extreme coordinate always quantizes to ±127 (scale definition)
    nz = np.abs(V).max(axis=1) > 0
    assert (np.abs(codes[nz]).max(axis=1) == 127).all()
    for k in (-3, 2, 7):
        assert (_np_codes(V * 2.0**k) == codes).all()


def test_codes_match_oracle_quantizer(sf_dir):
    """The numpy reference quantizer and the DuckDB oracle's quantizer
    produce identical integer codes — pins the floor(x·127/s + 0.5)
    half-up law on a third implementation."""
    con = duckdb.connect()
    _register(con, sf_dir)
    duck = con.execute(
        """
        WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        sc AS (SELECT vec_id, v,
               list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
               FROM v)
        SELECT vec_id,
               list_transform(v, x -> CASE WHEN scale = 0.0 THEN 0
                 ELSE CAST(floor(x * 127.0 / scale + 0.5) AS INT) END) AS code
        FROM sc ORDER BY vec_id
        """
    ).fetchall()
    V = np.array(
        con.execute(
            "SELECT embedding FROM embeddings ORDER BY vec_id"
        ).fetchnumpy()["embedding"].tolist(),
        dtype=np.float64,
    )
    ref = _np_codes(V)
    for i, (_, code) in enumerate(duck):
        assert np.array_equal(np.array(code, dtype=np.int64), ref[i])


def test_recall_vs_exact_cosine(spark, sf_dir):
    """SQ8's accuracy claim, measured: ≥90% of the exact float-cosine
    top-k pairs survive quantization on the fixture corpus (observed
    28/30 at sf0.001 — the misses sit inside SQ8's ~1e-2 relative error)."""
    exact = {
        (r.query_id, r.cand_id)
        for r in S.topk_bruteforce(spark, sf_dir).collect()
    }
    approx = {
        (r.query_id, r.cand_id) for r in S.topk_sq8(spark, sf_dir).collect()
    }
    assert len(approx) == len(exact)
    assert len(exact & approx) / len(exact) >= 0.9


def test_ivf_sq8_contract_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        S.topk_ivf_sq8(spark, sf_dir), con, S.ORACLE_SQL["sim_topk_ivf_sq8"]
    )


def test_ivf_sq8_bit_identical_and_subsumed_by_cells(spark, sf_dir):
    """IVF-SQ8 = SQ8 scoring restricted to the query's coarse cell: raw
    doubles must match the oracle bit-for-bit, and every returned
    candidate must share the query's cell assignment (the IVF claim)."""
    con = duckdb.connect()
    _register(con, sf_dir)
    srows = sorted(tuple(r) for r in S.topk_ivf_sq8(spark, sf_dir).collect())
    drows = sorted(
        tuple(r)
        for r in con.execute(S.ORACLE_SQL["sim_topk_ivf_sq8"]).fetchall()
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
