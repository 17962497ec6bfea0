"""Iterative k-means: determinism + fixpoint sanity."""

from __future__ import annotations

from parquet_near_storage_compute_spark.operators.scalar_funcs import (
    K_CLUSTERS,
    kmeans_lite,
)


def test_kmeans_deterministic(spark, sf_dir):
    a = {(r.cell, r.n_vectors) for r in kmeans_lite(spark, sf_dir).collect()}
    b = {(r.cell, r.n_vectors) for r in kmeans_lite(spark, sf_dir).collect()}
    assert a == b
    assert 1 <= len(a) <= K_CLUSTERS
    total = sum(n for _, n in a)
    from parquet_near_storage_compute_spark.tables import load_table

    assert total == load_table(spark, sf_dir, "embeddings").count()
