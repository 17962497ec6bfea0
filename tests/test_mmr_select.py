"""`sim_mmr_select` (r12): Maximal-Marginal-Relevance exemplar selection —
K relevant-but-diverse vectors for a query, the selection-side complement
of SemDeDup's drop-side rule (few-shot exemplar picking, dedup-aware
retrieval, diverse labeling budgets).

Exactness device: the shared PQ lattice (floor(x·1024 + 0.5)), integer
lattice dot products for relevance and pairwise similarity, and the
λ = 7/10 tradeoff carried as ``10·score = 7·rel − 3·maxsim`` — BIGINT
algebra end to end, ties by vec_id. Beyond the oracle compares this file
replays the greedy IN PYTHON INTS over the collected pool and requires
the identical selection — a third, engine-independent implementation."""

from __future__ import annotations

import duckdb

from parquet_near_storage_compute_spark.operators import similarity as S
from tests.oracle import compare


def _register(con, sf_dir):
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{sf_dir}/embeddings.parquet'"
    )


def test_matches_oracle(spark, sf_dir):
    con = duckdb.connect()
    _register(con, sf_dir)
    compare(
        S.mmr_select(spark, sf_dir), con, S.ORACLE_SQL["sim_mmr_select"]
    )


def _python_greedy(pool: list[tuple[int, int, list[int]]], k: int):
    """(vec_id, rel, lattice) pool → selection replay in Python ints."""
    lam_n, lam_d = S.MMR_LAMBDA_NUM, S.MMR_LAMBDA_DEN
    selected: list[tuple[int, int, int]] = []  # (vec_id, rel, score10)
    chosen_vecs: list[list[int]] = []
    remaining = list(pool)
    for _ in range(min(k, len(pool))):
        best = None
        for vec_id, rel, v in remaining:
            if chosen_vecs:
                maxsim = max(
                    sum(a * b for a, b in zip(v, s)) for s in chosen_vecs
                )
                score10 = lam_n * rel - (lam_d - lam_n) * maxsim
            else:
                score10 = lam_n * rel
            key = (-score10, vec_id)
            if best is None or key < best[0]:
                best = (key, vec_id, rel, v, score10)
        _, vec_id, rel, v, score10 = best
        selected.append((vec_id, rel, score10))
        chosen_vecs.append(v)
        remaining = [r for r in remaining if r[0] != vec_id]
    return selected


def test_selection_replays_in_python_ints(spark, sf_dir):
    """Collect the exact pool the operator selects from (same lattice,
    same top-POOL order) and replay the greedy in arbitrary-precision
    Python ints — the Spark output must match rank for rank."""
    from pyspark.sql import functions as F

    from parquet_near_storage_compute_spark.tables import load_table

    emb = load_table(spark, sf_dir, "embeddings")
    vi = emb.select(
        "vec_id", F.expr(S._lattice_expr("embedding")).alias("v")
    )
    qv = vi.filter(F.col("vec_id") == S.MMR_QUERY_ID).collect()[0]["v"]
    rows = vi.filter(F.col("vec_id") != S.MMR_QUERY_ID).collect()
    scored = sorted(
        (
            (r["vec_id"], sum(a * b for a, b in zip(r["v"], qv)), list(r["v"]))
            for r in rows
        ),
        key=lambda t: (-t[1], t[0]),
    )[: S.MMR_POOL]
    want = _python_greedy(scored, S.MMR_K)
    got = [
        (r["vec_id"], r["rel"], r["score10"])
        for r in S.mmr_select(spark, sf_dir).orderBy("rank").collect()
    ]
    assert got == want


def test_diversity_beats_pure_relevance(spark, tmp_path):
    """Planted geometry: two near-identical high-relevance vectors and one
    orthogonal moderate one. Pure top-2 relevance keeps the twins; MMR's
    second pick must be the orthogonal vector (the twin's similarity
    penalty dominates), and the oracle agrees on the planted corpus."""
    dim = 64

    def vec(*pairs):
        v = [0.0] * dim
        for i, x in pairs:
            v[i] = x
        return v

    # query spans TWO axes, so the e1-twins and the e2-vector are both
    # relevant but mutually near-orthogonal. Hand arithmetic (lattice
    # ×1024): q=(717,717), A=(922,20) rel 675414; B=(922,10) rel 668244;
    # C=(0,870) rel 623790. Step 2: B's twin penalty (sim_AB=850284)
    # crushes its score to 2126856 while C (sim_AC=17400) scores
    # 4314330 — diversity wins despite lower relevance.
    rows = [
        (0, vec((0, 0.7), (1, 0.7)), 0),             # the query itself
        (1, vec((0, 0.9), (1, 0.02)), 0),            # twin A (best rel)
        (2, vec((0, 0.9), (1, 0.01)), 0),            # twin B (near-identical)
        (3, vec((1, 0.85)), 1),                      # diverse, relevant
        (4, vec((3, 0.9)), 1),                       # irrelevant
    ]
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(out + "/embeddings.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW embeddings AS "
        f"SELECT * FROM '{out}/embeddings.parquet/*.parquet'"
    )
    compare(S.mmr_select(spark, out), con, S.ORACLE_SQL["sim_mmr_select"])
    got = S.mmr_select(spark, out).orderBy("rank").collect()
    # 4 candidates < MMR_K: the loop is total and returns all of them
    assert [r["rank"] for r in got] == [1, 2, 3, 4]
    assert got[0]["vec_id"] == 1          # highest relevance (tie→smaller id)
    assert got[1]["vec_id"] == 3          # DIVERSITY: not the twin
    assert got[2]["vec_id"] == 2          # the twin comes after
    assert got[0]["score10"] == S.MMR_LAMBDA_NUM * got[0]["rel"]
