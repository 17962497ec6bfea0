"""Focused properties for the round-9 operators, beyond the registry
oracle compare: domain capping (`train_source_cap`), the Jaccard
threshold curve (`dedup_threshold_curve`), and the reference-width
flagship (`v1_wide92_flagship`)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.dedup import (
    threshold_curve,
)
from parquet_near_storage_compute_spark.operators.dedup import (
    ngram_jaccard,
)
from parquet_near_storage_compute_spark.operators.scan_agg import (
    wide92_flagship,
)
from parquet_near_storage_compute_spark.operators.training import (
    SOURCE_CAP,
    source_cap,
)


def test_source_cap_bounds_every_source(spark, sf_dir):
    rows = source_cap(spark, sf_dir).collect()
    per_source: dict[str, list[int]] = {}
    for r in rows:
        per_source.setdefault(r["source"], []).append(r["rk"])
    assert per_source, "empty output"
    for src, rks in per_source.items():
        assert len(rks) <= SOURCE_CAP, src
        # ranks are exactly 1..n with no holes (the two-phase k-min must
        # not drop a doc whose true rank is within the cap)
        assert sorted(rks) == list(range(1, len(rks) + 1)), src


def test_source_cap_is_partition_invariant(spark, sf_dir, tmp_path):
    """The kept set is a pure function of the keys: rewriting the corpus
    under a different physical layout (13 shuffled parquet parts instead
    of one compact file) must not change a single kept row — the salted
    phase-1 window could silently break this if slices overlapped."""
    base = sorted(map(tuple, source_cap(spark, sf_dir).collect()))
    from parquet_near_storage_compute_spark.tables import load_table

    relaid = str(tmp_path / "relaid")
    load_table(spark, sf_dir, "documents").repartition(13).write.parquet(
        f"{relaid}/documents.parquet"
    )
    again = sorted(map(tuple, source_cap(spark, relaid).collect()))
    assert base == again


def test_threshold_curve_is_consistent_with_jaccard_verify(spark, sf_dir):
    """The curve's cumulative count at decile 5 must equal the number of
    pairs dedup_ngram_jaccard keeps at J >= 0.5 — same candidates, same
    exact verify, two views of one computation."""
    curve = {r["jaccard_decile"]: r for r in threshold_curve(spark, sf_dir).collect()}
    at_or_above_5 = sum(
        r["n_pairs"] for d, r in curve.items() if d >= 5
    )
    n_kept = ngram_jaccard(spark, sf_dir).count()
    assert at_or_above_5 == n_kept
    # cumulative column is the suffix sum of n_pairs
    total = sum(r["n_pairs"] for r in curve.values())
    lowest = min(curve)
    assert curve[lowest]["n_pairs_at_or_above"] == total


def test_wide92_flagship_prunes_to_one_column(spark, sf_dir):
    df = wide92_flagship(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(memoryUsed), GreaterThan(memoryUsed,336)]" in plan
    assert "ReadSchema: struct<memoryUsed:bigint>" in plan
    (row,) = df.collect()
    assert row["count_mem"] > 0
    assert row["min_mem"] > 336
