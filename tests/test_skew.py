"""Salted aggregation equals direct aggregation (on skewed data: one user
owns most events)."""

from __future__ import annotations

from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.functions.skew import (
    salted_collect_set,
    salted_group_agg,
)
from parquet_near_storage_compute_spark.tables import load_table


def _skewed(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    # route ~half of all events to a single hot key
    return ev.withColumn(
        "user_id",
        F.when(F.col("event_id") % 2 == 0, F.lit(0)).otherwise(F.col("user_id")),
    )


def test_salted_agg_equals_direct(spark, sf_dir):
    df = _skewed(spark, sf_dir)
    direct = {
        r.user_id: (round(r.s, 6), r.c, round(r.mn, 6), round(r.mx, 6))
        for r in df.groupBy("user_id")
        .agg(
            F.sum("value").alias("s"),
            F.count("value").alias("c"),
            F.min("value").alias("mn"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        r.user_id: (
            round(r.sum_value, 6),
            r.count_value,
            round(r.min_value, 6),
            round(r.max_value, 6),
        )
        for r in salted_group_agg(df, "user_id", "value").collect()
    }
    assert direct == salted


def test_salted_collect_set_equals_direct(spark, sf_dir):
    df = _skewed(spark, sf_dir)
    direct = {
        r.user_id: tuple(sorted(set(r.vs)))
        for r in df.groupBy("user_id")
        .agg(F.collect_set("event_type").alias("vs"))
        .collect()
    }
    salted = {
        r.user_id: tuple(r.distinct_event_type)
        for r in salted_collect_set(df, "user_id", "event_type").collect()
    }
    assert direct == salted
