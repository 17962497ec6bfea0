"""Hot-bucket guard for banded LSH (operators/dedup.py): an adversarial
bucket (e.g. 1000 boilerplate docs sharing every band hash) must never
expand into bucket² pairs or materialize as one unbounded row — it routes
to the overflow accounting output instead, while normal buckets keep their
exact pair sets."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from parquet_near_storage_compute_spark.operators.dedup import (
    LSH_BUCKET_CAP,
    LSH_MERGE_SALT,
    _banded_buckets,
    _bands,
    _bucket_pairs,
    _minhash_signatures,
    lsh_overflow,
)

HOT = 1000


def _bands_fixture(spark):
    """Synthetic bands stream: one hot bucket (HOT docs), one small bucket
    (3 docs), one singleton."""
    hot = spark.range(HOT).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit("hot").alias("bh")
    )
    small = spark.range(3).select(
        (F.col("id") + 10_000).alias("doc_id"),
        F.lit(1).alias("band"),
        F.lit("small").alias("bh"),
    )
    single = spark.range(1).select(
        (F.col("id") + 20_000).alias("doc_id"),
        F.lit(2).alias("band"),
        F.lit("one").alias("bh"),
    )
    return hot.unionAll(small).unionAll(single)


def test_hot_bucket_produces_no_pairs_small_bucket_exact(spark):
    buckets = _banded_buckets(_bands_fixture(spark), ["band", "bh"])
    pairs = _bucket_pairs(buckets).collect()
    got = sorted((r.doc_a, r.doc_b) for r in pairs)
    assert got == [(10_000, 10_001), (10_000, 10_002), (10_001, 10_002)]


def test_bucket_rows_are_bounded_and_counts_exact(spark):
    rows = {
        (r.band, r.bh): r
        for r in _banded_buckets(_bands_fixture(spark), ["band", "bh"])
        .select(
            "band", "bh", "n_docs", "min_id", F.size("ds").alias("held"), "ds"
        )
        .collect()
    }
    hot = rows[(0, "hot")]
    assert hot.n_docs == HOT  # exact count survives the slice
    assert hot.held <= LSH_MERGE_SALT * (LSH_BUCKET_CAP + 1)
    assert hot.min_id == 0  # dedicated min aggregate → global min survives
    assert rows[(1, "small")].n_docs == 3
    assert rows[(1, "small")].held == 3
    assert rows[(1, "small")].ds == [10_000, 10_001, 10_002]  # in-cap: exact


@pytest.mark.parametrize("n,expect_pairs", [
    (LSH_BUCKET_CAP, LSH_BUCKET_CAP * (LSH_BUCKET_CAP - 1) // 2),
    (LSH_BUCKET_CAP + 1, 0),
])
def test_cap_boundary(spark, n, expect_pairs):
    bands = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(0).alias("band"), F.lit("b").alias("bh")
    )
    pairs = _bucket_pairs(_banded_buckets(bands, ["band", "bh"]))
    assert pairs.count() == expect_pairs


def test_end_to_end_boilerplate_cluster_routes_to_overflow(spark):
    """1000 identical docs → identical signatures → every band bucket is
    hot: zero pairs, 4 overflow rows (one per band) with the exact count;
    a genuine near-dup pair elsewhere is unaffected."""
    boiler = spark.range(HOT).select(
        F.col("id").alias("doc_id"),
        F.lit("terms of service apply to all users of this site").alias("text"),
    )
    near = spark.createDataFrame(
        [
            (50_000, "alpha beta gamma delta epsilon zeta"),
            (50_001, "alpha beta gamma delta epsilon eta"),
        ],
        "doc_id long, text string",
    )
    docs = boiler.unionAll(near)
    sig = _minhash_signatures(docs)
    buckets = _banded_buckets(_bands(sig), ["band", "bh"])
    pairs = _bucket_pairs(buckets)
    got = sorted((r.doc_a, r.doc_b) for r in pairs.collect())
    assert got == [(50_000, 50_001)]
    over = buckets.filter(F.col("n_docs") > LSH_BUCKET_CAP).collect()
    assert len(over) == 4  # one hot bucket per band
    assert all(r.n_docs == HOT for r in over)


def test_overflow_empty_on_fixture_data(spark, sf_dir):
    assert lsh_overflow(spark, sf_dir).count() == 0


def test_capped_pairs_match_bruteforce_reference(spark):
    """Differential for the two-level salted bucket path: on a randomized
    band stream (fixed seed), pair output must equal a pure-Python
    reference that enumerates pairs per bucket iff the bucket is within
    cap — independent of salting, merge order, or partitioning."""
    import itertools
    import random

    rng = random.Random(20260813)
    rows = []
    for band in range(4):
        for b in range(12):
            size = rng.choice([1, 2, 3, 5, LSH_BUCKET_CAP,
                               LSH_BUCKET_CAP + 1, 150])
            members = rng.sample(range(100_000), size)
            rows += [(doc, band, f"h{b}") for doc in members]
    rng.shuffle(rows)
    bands = spark.createDataFrame(rows, "doc_id long, band int, bh string")

    expect = set()
    key = lambda r: (r[1], r[2])
    for (band, bh), grp in itertools.groupby(sorted(rows, key=key), key=key):
        docs = sorted(r[0] for r in grp)
        if 1 < len(docs) <= LSH_BUCKET_CAP:
            expect.update(itertools.combinations(docs, 2))

    got = {
        (r.doc_a, r.doc_b)
        for r in _bucket_pairs(_banded_buckets(bands, ["band", "bh"])).collect()
    }
    assert got == expect


def test_dedup_decisions_route_boilerplate_to_cluster_dedup(spark):
    """End-to-end decision table: the 1000-doc boilerplate cluster keeps
    exactly its smallest doc_id (overflow_survivor) and drops the rest as
    overflow_cluster with zero pairwise work; the genuine near-dup pair
    keeps doc_a and drops doc_b; everything else stays unique."""
    from parquet_near_storage_compute_spark.operators.dedup import (
        minhash_dedup_decisions,
    )

    boiler = spark.range(HOT).select(
        F.col("id").alias("doc_id"),
        F.lit("terms of service apply to all users of this site").alias("text"),
    )
    near = spark.createDataFrame(
        [
            (50_000, "alpha beta gamma delta epsilon zeta"),
            (50_001, "alpha beta gamma delta epsilon eta"),
            (60_000, "completely unrelated content about astronomy stars"),
        ],
        "doc_id long, text string",
    )
    docs = boiler.unionAll(near)
    decisions = {r.doc_id: (r.keep, r.reason)
                 for r in minhash_dedup_decisions(docs).collect()}
    assert len(decisions) == HOT + 3
    assert decisions[0] == (True, "overflow_survivor")
    assert all(
        decisions[i] == (False, "overflow_cluster") for i in range(1, HOT)
    )
    assert decisions[50_000] == (True, "pair_survivor")
    assert decisions[50_001] == (False, "near_dup")
    assert decisions[60_000] == (True, "unique")
    kept = sum(1 for k, _ in decisions.values() if k)
    assert kept == 3  # one boilerplate rep + pair winner + unique
