"""Hand-checked semantics for the round-5 session additions: the EWMA
sequential fold and the deterministic hash global shuffle."""

from __future__ import annotations

import hashlib

import duckdb
import pytest
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.timeseries import (
    ewma_per_user,
)
from parquet_near_storage_compute_spark.operators.training import (
    SHUFFLE_SEED,
    global_shuffle,
)

SF = "/root/testdata/sf0.001"


def _expected_ewma(values: list[float]) -> float:
    s = values[0]
    for v in values[1:]:
        s = s + 0.5 * (v - s)
    return s


def test_ewma_matches_python_fold(spark):
    con = duckdb.connect()
    raw = con.execute(
        f"""SELECT user_id, list(value ORDER BY event_id)
            FROM '{SF}/events.parquet' GROUP BY user_id"""
    ).fetchall()
    expected = {u: _expected_ewma(vals) for u, vals in raw}
    got = {
        r["user_id"]: r["ewma_value"]
        for r in ewma_per_user(spark, SF).collect()
    }
    assert set(got) == set(expected)
    for u in expected:
        # bit-identical: same fold order, single IEEE ops throughout
        assert got[u] == expected[u], u


def test_ewma_single_event_user_is_identity(spark):
    # a user with one event: EWMA = that value (fold over empty rest)
    df = spark.createDataFrame(
        [(1, 7, 3.5), (2, 8, 1.0), (3, 8, 2.0)],
        "event_id long, user_id long, value double",
    )
    df.createOrReplaceTempView("_ewma_t")
    arr = F.sort_array(F.collect_list(F.struct("event_id", "value")))
    vals = F.transform(arr, lambda s: s["value"])
    rest = F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0)))
    ewma = F.aggregate(
        rest, F.element_at(vals, 1), lambda a, x: a + F.lit(0.5) * (x - a)
    )
    rows = {
        r["user_id"]: r["e"]
        for r in df.groupBy("user_id").agg(ewma.alias("e")).collect()
    }
    assert rows[7] == 3.5
    assert rows[8] == 1.5  # 1.0 + 0.5*(2.0-1.0)


def test_global_shuffle_partitions_corpus(spark):
    out = global_shuffle(spark, SF).collect()
    total = spark.read.parquet(f"{SF}/documents.parquet").count()
    assert sum(r["n_docs"] for r in out) == total
    shards = [r["shard"] for r in out]
    assert len(set(shards)) == len(shards)
    assert all(s in "0123456789abcdef" for s in shards)


def test_global_shuffle_first_doc_matches_reference_md5(spark):
    docs = [
        r["doc_id"]
        for r in spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id")
        .collect()
    ]

    def key(d):
        return hashlib.md5(f"{d}:{SHUFFLE_SEED}".encode()).hexdigest()

    expected_first = {}
    for d in docs:
        k = key(d)
        s = k[0]
        if s not in expected_first or k < key(expected_first[s]):
            expected_first[s] = d
    got = {
        r["shard"]: r["first_doc_id"] for r in global_shuffle(spark, SF).collect()
    }
    assert got == expected_first


@pytest.mark.parametrize("seed", [SHUFFLE_SEED])
def test_global_shuffle_is_reproducible(spark, seed):
    a = sorted(map(tuple, global_shuffle(spark, SF).collect()))
    b = sorted(map(tuple, global_shuffle(spark, SF).collect()))
    assert a == b


def test_variant_scan_semantics(spark):
    from parquet_near_storage_compute_spark.operators.typed_scan import (
        variant_json_scan,
    )

    rows = variant_json_scan(spark, SF).collect()
    assert rows, "variant scan returned nothing"
    for r in rows:
        # $.missing never exists → try_variant_get yields NULL, COUNT = 0
        assert r["n_absent_nonnull"] == 0
        # the corpus props are uniform {"k": int} objects
        assert r["n_schemas"] == 1
        assert r["max_k"] is not None


def test_variant_get_is_typed_and_null_safe(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([('{"k": 7}',), ('{"other": 1}',)], "props string")
    out = df.select(
        F.try_variant_get(F.parse_json("props"), "$.k", "bigint").alias("k")
    ).collect()
    assert sorted([r["k"] for r in out], key=lambda x: (x is None, x)) == [7, None]
