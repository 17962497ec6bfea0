"""AQE skew-join splitting (SCALING.md): a pathologically hot join key must
be split at runtime — the executed plan marks the join ``skew=true`` and the
shuffle read "coalesced and skewed". Thresholds are lowered to make the
local data qualify; on a cluster the defaults (256 MB) apply."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

_SKEW_CONF = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
}


def test_aqe_splits_skewed_join(spark):
    prev = {k: spark.conf.get(k) for k in _SKEW_CONF}
    try:
        for k, v in _SKEW_CONF.items():
            spark.conf.set(k, v)
        left = (
            spark.range(500_000)
            .select(F.lit(7).alias("k"), F.col("id").alias("v"))
            .unionAll(
                spark.range(500).select(
                    (F.col("id") % 100).alias("k"), F.col("id").alias("v")
                )
            )
        )
        right = spark.range(100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k").agg(
            F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")
        )
        row = j.collect()[0]
        assert row.n == 500_500
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan, plan
    finally:
        for k, v in prev.items():
            spark.conf.set(k, v)
