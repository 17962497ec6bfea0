"""v1 null semantics on data that actually contains nulls (the driver's
testdata has none): aggregates skip nulls (v1 ``.iter().flatten()``,
``v1/src/main.rs:1517``), COUNT(col) counts non-null, AVG of all-null is
NULL, comparisons propagate null (filtered out). Differential vs DuckDB on
an identical parquet file."""

from __future__ import annotations

import os

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from parquet_near_storage_compute_spark.functions.grammar import parse_predicate

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
PATH = os.path.join(TMP, "nulls.parquet")


@pytest.fixture(scope="module")
def null_table(spark):
    os.makedirs(TMP, exist_ok=True)
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("x", DoubleType()),
            StructField("grp", StringType()),
        ]
    )
    rows = [
        (1, 10.0, "a"),
        (2, None, "a"),
        (3, 30.5, None),
        (4, None, None),
        (5, -5.0, "b"),
        (6, 0.0, "b"),
        (7, None, "b"),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        PATH
    )
    return PATH


def _duck(path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{path}/*.parquet'")
    return con


def test_agg_null_skipping(spark, null_table):
    df = spark.read.parquet(null_table)
    got = df.agg(
        F.sum("x").alias("s"),
        F.avg("x").alias("a"),
        F.min("x").alias("mn"),
        F.max("x").alias("mx"),
        F.count("x").alias("c"),
        F.count(F.lit(1)).alias("cstar"),
    ).collect()[0]
    want = (
        _duck(null_table)
        .execute(
            "SELECT SUM(x), AVG(x), MIN(x), MAX(x), COUNT(x), COUNT(*) FROM t"
        )
        .fetchone()
    )
    assert (got.s, got.a, got.mn, got.mx, got.c, got.cstar) == want


def test_all_null_group_aggregates_to_null(spark, null_table):
    df = spark.read.parquet(null_table).filter(F.col("x").isNull())
    row = df.agg(F.sum("x").alias("s"), F.avg("x").alias("a"),
                 F.count("x").alias("c")).collect()[0]
    assert row.s is None and row.a is None and row.c == 0


def test_comparison_null_propagation(spark, null_table):
    """NULL compare literal → NULL → row filtered (matches v1's validity
    propagation and SQL three-valued logic)."""
    df = spark.read.parquet(null_table)
    n = df.filter(parse_predicate("x > 0.0")).count()
    want = _duck(null_table).execute("SELECT COUNT(*) FROM t WHERE x > 0.0").fetchone()[0]
    assert n == want == 2  # 10.0 and 30.5


def test_groupby_null_key(spark, null_table):
    """Null group keys form their own group in both engines."""
    df = spark.read.parquet(null_table)
    got = sorted(
        [(r.grp, r.n) for r in df.groupBy("grp").agg(F.count(F.lit(1)).alias("n")).collect()],
        key=repr,
    )
    want = sorted(
        _duck(null_table).execute(
            "SELECT grp, COUNT(*) FROM t GROUP BY grp"
        ).fetchall(),
        key=repr,
    )
    assert got == [tuple(w) for w in want]
