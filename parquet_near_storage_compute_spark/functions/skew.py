"""Skew-mitigation primitives (SCALING.md: salting for hot keys).

AQE's skew-join splitting handles join-side skew automatically; for
aggregations over pathologically hot keys the classic fix is salted
two-phase aggregation: shard each key across N salts (partial aggregate per
(key, salt) shard), then combine shards. Results are identical for any
commutative-associative aggregate; the hot key's work spreads over N tasks
instead of one.

For plain sums/counts Spark's map-side partial aggregation already bounds
the skew (each task emits one row per key), so reach for this only when the
per-key state is heavy — collect-style aggregates, large distincts, or UDAFs
with big state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_group_agg(
    df: DataFrame,
    key: str,
    value: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-phase salted SUM/COUNT/MIN/MAX per key — identical results to a
    direct groupBy, hot keys spread over ``n_salt`` shards."""
    salt = (F.crc32(F.col(value).cast("string")) % n_salt).alias("_salt")
    partial = (
        df.groupBy(F.col(key), salt)
        .agg(
            F.sum(value).alias("_s"),
            F.count(value).alias("_c"),
            F.min(value).alias("_mn"),
            F.max(value).alias("_mx"),
        )
    )
    return partial.groupBy(key).agg(
        F.sum("_s").alias(f"sum_{value}"),
        F.sum("_c").alias(f"count_{value}"),
        F.min("_mn").alias(f"min_{value}"),
        F.max("_mx").alias(f"max_{value}"),
    )


def salted_collect_set(
    df: DataFrame, key: str, value: str, n_salt: int = 16
) -> DataFrame:
    """Heavy-state example: distinct-set per key with salted shards —
    shard-local collect_set, then flatten+distinct the (≤ n_salt) shard
    sets. This is where salting actually pays: collect_set state on a hot
    key otherwise lives in ONE task."""
    salt = (F.crc32(F.col(value).cast("string")) % n_salt).alias("_salt")
    partial = df.groupBy(F.col(key), salt).agg(
        F.collect_set(value).alias("_vs")
    )
    return partial.groupBy(key).agg(
        F.array_sort(
            F.array_distinct(F.flatten(F.collect_list("_vs")))
        ).alias(f"distinct_{value}")
    )
