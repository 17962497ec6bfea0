"""Chunked EWMA fold (VERDICT r5 #5): a hot user's events must never land
in one aggregation buffer — per-chunk folds of ≤ EWMA_CHUNK events stitch
via the exact suffix-decay algebra — while the DuckDB oracle mirrors the
identical op sequence so the contract stays engine-exact, and the
single-chunk regime stays bit-identical to the unchunked r5 form."""

from __future__ import annotations

import math
import os

import duckdb
import pyspark.sql.functions as F
import pytest

from parquet_near_storage_compute_spark.operators import timeseries as TS

N_HOT = 5 * TS.EWMA_CHUNK + 37  # 6 chunks, last one ragged
N_COLD = 9


@pytest.fixture(scope="module")
def hot_events_dir(spark, tmp_path_factory):
    """user 1: N_HOT events; user 2: N_COLD events (single-chunk)."""
    out = str(tmp_path_factory.mktemp("ewma_hot"))
    ts = F.lit("2024-01-01 00:00:00").cast("timestamp").alias("ts")
    hot = spark.range(N_HOT).select(
        F.lit(1).alias("user_id"),
        F.col("id").alias("event_id"),
        (F.sin(F.col("id").cast("double")) * 100).alias("value"),
        ts,
    )
    cold = spark.range(N_COLD).select(
        F.lit(2).alias("user_id"),
        (F.col("id") + 1_000_000).alias("event_id"),
        (F.col("id").cast("double") + 0.25).alias("value"),
        ts,
    )
    hot.unionByName(cold).coalesce(1).write.parquet(
        os.path.join(out, "events.parquet")
    )
    return out


def _sequential_ewma(values):
    s = values[0]
    for x in values[1:]:
        s = s + TS.EWMA_ALPHA * (x - s)
    return s


def test_hot_user_matches_oracle_bitwise(spark, hot_events_dir):
    got = {
        r.user_id: (r.n_events, r.ewma_value)
        for r in TS.ewma_per_user(spark, hot_events_dir).collect()
    }
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"'{os.path.join(hot_events_dir, 'events.parquet')}/*.parquet'"
    )
    want = {
        r[0]: (r[1], r[2])
        for r in con.execute(TS.ORACLE_SQL["time_ewma"]).fetchall()
    }
    assert got.keys() == want.keys()
    for uid in got:
        assert got[uid][0] == want[uid][0]
        # bit-identical: both engines run the same chunked op sequence
        assert got[uid][1] == want[uid][1], (uid, got[uid], want[uid])


def test_chunked_algebra_equals_sequential_fold(spark, hot_events_dir):
    """The suffix-decay stitch is the same recurrence — the chunked result
    must match a pure sequential Python fold to float-roundoff."""
    vals = [math.sin(float(i)) * 100 for i in range(N_HOT)]
    want = _sequential_ewma(vals)
    got = {
        r.user_id: r.ewma_value
        for r in TS.ewma_per_user(spark, hot_events_dir).collect()
    }
    assert got[1] == pytest.approx(want, rel=1e-12)
    # single-chunk user: the unchunked recurrence, exactly
    assert got[2] == _sequential_ewma([i + 0.25 for i in range(N_COLD)])


def test_no_buffer_holds_more_than_chunk(spark, hot_events_dir):
    """The per-(user, chunk) arrays — the only unbounded-risk buffers —
    must each hold ≤ EWMA_CHUNK events."""
    ev = TS.load_table(spark, hot_events_dir, "events")
    w = TS.Window.partitionBy("user_id").orderBy("event_id")
    sizes = (
        ev.select("user_id", "event_id")
        .withColumn(
            "chunk",
            ((F.row_number().over(w) - F.lit(1)) / F.lit(TS.EWMA_CHUNK)).cast(
                "long"
            ),
        )
        .groupBy("user_id", "chunk")
        .count()
        .collect()
    )
    assert max(r["count"] for r in sizes) <= TS.EWMA_CHUNK
    assert len([r for r in sizes if r.user_id == 1]) == 6  # 6 chunks
