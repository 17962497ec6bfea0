"""Test-only baselines deliberately NOT in the contract registry.

``embedding_neardup`` (all-pairs theta join) is the exactness baseline for
the registered sign-LSH variant: O(n²) compare volume makes it a
scale-killer as a contract query, but at sf0.001 it is the ground truth the
LSH path's recall is judged against.
"""

from __future__ import annotations

import pytest

from parquet_near_storage_compute_spark.operators.dedup import (
    EMBEDDING_ALLPAIRS_ORACLE,
    embedding_neardup,
    embedding_neardup_lsh,
)
from tests.oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


def test_allpairs_matches_oracle(spark, sf_dir, con):
    compare(embedding_neardup(spark, sf_dir), con, EMBEDDING_ALLPAIRS_ORACLE)


def test_lsh_is_subset_of_allpairs(spark, sf_dir):
    """Every LSH-found pair must be a true near-dup pair (precision 1.0 by
    construction: same cosine kernel + threshold, fewer candidates)."""
    exact = {
        (r.vec_a, r.vec_b) for r in embedding_neardup(spark, sf_dir).collect()
    }
    lsh = {
        (r.vec_a, r.vec_b)
        for r in embedding_neardup_lsh(spark, sf_dir).collect()
    }
    assert lsh <= exact


def test_minhash_lsh_recall_against_exact_jaccard(spark, sf_dir):
    """Empirical recall observable: on the fixture corpus the LSH-gated
    two-phase pipeline (dedup_ngram_jaccard) finds EVERY pair an exact
    all-pairs 3-shingle Jaccard >= 0.5 scan finds — candidates here are
    all J >= 0.89, where the 4x2 band scheme's miss probability is
    ~(1-J^2)^4 < 0.2%, and on this fixed corpus + fixed md5 hashes the
    outcome is deterministic. (At lower J recall degrades by design —
    the standard LSH trade, documented in operators/dedup.py.)"""
    import duckdb

    from parquet_near_storage_compute_spark.registry import all_queries

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{sf_dir}/documents.parquet'"
    )
    exact = set(
        (a, b)
        for a, b, _ in con.execute("""
            WITH sets AS (
              SELECT doc_id, list_distinct(list_transform(
                CASE WHEN len(ws) >= 3 THEN range(len(ws)-2) ELSE [] END,
                i -> array_to_string(ws[i+1:i+3], ' '))) AS s
              FROM (SELECT doc_id, string_split(text,' ') AS ws
                    FROM documents)
            )
            SELECT a.doc_id, b.doc_id,
                   CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s,b.s))) AS j
            FROM sets a JOIN sets b ON a.doc_id < b.doc_id
            WHERE CAST(len(list_intersect(a.s,b.s)) AS DOUBLE)
                     / len(list_distinct(list_concat(a.s,b.s))) >= 0.5
        """).fetchall()
    )
    got = {
        (r.doc_a, r.doc_b)
        for r in all_queries()["dedup_ngram_jaccard"](spark, sf_dir).collect()
    }
    assert got == exact  # 100% recall on this corpus, zero false positives
