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
