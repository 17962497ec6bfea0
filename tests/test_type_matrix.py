"""The §1.3 type matrix: grammar comparisons over every filterable type the
v1 engine supports (Int8/16/32/64, Float32/64, Boolean, Utf8, Date —
``build_filter_mask`` ``v1/src/main.rs:887-1151``), differential vs DuckDB
on an identical parquet file. The driver's testdata lacks most of these
physical types, so they're synthesized here."""

from __future__ import annotations

import datetime as dt
import os
import shutil

import duckdb
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    ByteType,
    DateType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
)

from parquet_near_storage_compute_spark.functions.grammar import parse_predicate

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
PATH = os.path.join(TMP, "type_matrix.parquet")


@pytest.fixture(scope="module")
def typed_table(spark):
    os.makedirs(TMP, exist_ok=True)
    schema = StructType(
        [
            StructField("c_i8", ByteType()),
            StructField("c_i16", ShortType()),
            StructField("c_i32", IntegerType()),
            StructField("c_i64", LongType()),
            StructField("c_f32", FloatType()),
            StructField("c_f64", DoubleType()),
            StructField("c_bool", BooleanType()),
            StructField("c_str", StringType()),
            StructField("c_date", DateType()),
        ]
    )
    rows = [
        (
            i - 50,
            (i - 50) * 100,
            (i - 50) * 10_000,
            (i - 50) * 1_000_000_000,
            float(i) / 3.0,
            float(i) * 1.5,
            i % 2 == 0,
            f"s{i:03d}",
            dt.date(2020, 1, 1) + dt.timedelta(days=i),
        )
        for i in range(100)
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(PATH)
    yield PATH
    shutil.rmtree(PATH, ignore_errors=True)


CASES = [
    ("c_i8 > 10", "c_i8 > 10"),
    ("c_i8 <= -20", "c_i8 <= -20"),
    ("c_i16 >= 1000", "c_i16 >= 1000"),
    ("c_i32 < -100000", "c_i32 < -100000"),
    ("c_i64 == 0", "c_i64 = 0"),
    ("c_i64 > 20000000000", "c_i64 > 20000000000"),
    ("c_f32 > 11.0", "c_f32 > 11.0"),
    ("c_f64 >= 74.5", "c_f64 >= 74.5"),
    ("c_bool == true", "c_bool = true"),
    ("c_bool != false", "c_bool != false"),
    ("c_str >= 's050'", "c_str >= 's050'"),
    ("c_str LIKE 's09%'", "c_str LIKE 's09%'"),
    # mixed-type conjunction with widening casts (F7)
    ("c_i8 > 0 AND c_f32 < 20.0 AND c_bool == true",
     "c_i8 > 0 AND c_f32 < 20.0 AND c_bool = true"),
]


@pytest.mark.parametrize("spark_pred,duck_pred", CASES)
def test_grammar_type_matrix(spark, typed_table, spark_pred, duck_pred):
    df = spark.read.parquet(typed_table)
    got = df.filter(parse_predicate(spark_pred)).count()
    con = duckdb.connect()
    want = con.execute(
        f"SELECT COUNT(*) FROM '{typed_table}/*.parquet' WHERE {duck_pred}"
    ).fetchone()[0]
    assert got == want, (spark_pred, got, want)


def test_date_compare(spark, typed_table):
    """Date32 comparisons (v1 Date32 path): Column API vs DuckDB."""
    df = spark.read.parquet(typed_table)
    got = df.filter(F.col("c_date") > F.lit(dt.date(2020, 2, 15))).count()
    con = duckdb.connect()
    want = con.execute(
        f"SELECT COUNT(*) FROM '{typed_table}/*.parquet' "
        "WHERE c_date > DATE '2020-02-15'"
    ).fetchone()[0]
    assert got == want > 0


def test_pushdown_across_types(spark, typed_table):
    """Every typed comparison still reaches the scan as a pushed filter."""
    df = spark.read.parquet(typed_table)
    for col in ("c_i8", "c_i64", "c_f32", "c_str"):
        plan = (
            df.filter(parse_predicate(f"{col} > 5"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan and col in plan


# ---- unsigned + decimal physical types (v1 UInt8-64, v2's seven types) ----

UD_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "types_unsigned_decimal.parquet",
)


def test_unsigned_parquet_spark_mapping(spark):
    """Spark widens parquet unsigned logical types to the next signed type;
    UINT_64 lands in DECIMAL(20,0) because no signed 64-bit type holds it."""
    df = spark.read.parquet(UD_FIXTURE)
    dtypes = dict(df.dtypes)
    assert dtypes["u8"] == "smallint"
    assert dtypes["u16"] == "int"
    assert dtypes["u32"] == "bigint"
    assert dtypes["u64"] == "decimal(20,0)"
    assert dtypes["dec"] == "decimal(18,4)"


UD_CASES = [
    ("u8 > 128", "u8 > 128"),
    ("u16 >= 60000", "u16 >= 60000"),
    ("u32 > 2147483648", "u32 > 2147483648"),  # above int32 max
    ("dec < 0", "dec < 0"),
]


@pytest.mark.parametrize("pred,duck_pred", UD_CASES)
def test_unsigned_filter_differential(spark, pred, duck_pred):
    got = spark.read.parquet(UD_FIXTURE).filter(pred).count()
    want = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{UD_FIXTURE}') WHERE {duck_pred}"
    ).fetchone()[0]
    assert got == want > 0, (pred, got, want)


def test_u64_above_i64_max_differential(spark):
    """Predicate on values no signed 64-bit integer can represent."""
    lit = "9223372036854775808"  # 2^63
    got = (
        spark.read.parquet(UD_FIXTURE)
        .filter(F.col("u64") >= F.lit(lit).cast("decimal(20,0)"))
        .count()
    )
    want = duckdb.connect().execute(
        f"SELECT COUNT(*) FROM read_parquet('{UD_FIXTURE}') WHERE u64 >= {lit}"
    ).fetchone()[0]
    assert got == want > 0


def test_unsigned_pushdown(spark):
    """Unsigned-column comparisons still reach the scan as pushed filters."""
    df = spark.read.parquet(UD_FIXTURE)
    for col in ("u8", "u16", "u32"):
        plan = (
            df.filter(F.col(col) > 5)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "PushedFilters" in plan and col in plan


def test_decimal_sum_exact(spark):
    """DECIMAL(18,4) sums agree exactly (no float drift) across engines."""
    got = (
        spark.read.parquet(UD_FIXTURE)
        .agg(F.sum("dec").cast("string").alias("s"))
        .collect()[0]
        .s
    )
    want = duckdb.connect().execute(
        f"SELECT CAST(SUM(dec) AS VARCHAR) FROM read_parquet('{UD_FIXTURE}')"
    ).fetchone()[0]
    assert got == want


# ---- §1.3 remnants: Float16 + INT96 (round 3) -------------------------------

F16_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "types_f16.parquet",
)
INT96_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "types_int96.parquet",
)


def test_spark_rejects_raw_f16_so_shim_is_required(spark):
    """Pin the reason the shim exists: Spark 4's parquet reader refuses
    FLOAT16 at schema inference."""
    with pytest.raises(Exception, match="PARQUET_TYPE_ILLEGAL|FLOAT16"):
        spark.read.parquet(F16_FIXTURE).schema


def test_f16_widened_matches_numpy(spark):
    """The f16→f32 widening (v1/src/main.rs:1066) is exact: the widened
    column equals the IEEE half-float values numpy decodes, row by row,
    and filters/aggregates over it behave as float32."""
    import numpy as np

    from parquet_near_storage_compute_spark.sources.io import (
        read_parquet_f16_widened,
    )

    df = read_parquet_f16_widened(spark, F16_FIXTURE)
    assert dict(df.dtypes)["f16"] == "float"
    got = {r.id: r.f16 for r in df.select("id", "f16").collect()}
    expect = np.array(
        [((i * 37) % 2000 - 1000) / 8.0 for i in range(len(got))],
        dtype=np.float16,
    ).astype(np.float32)
    assert all(got[i] == float(expect[i]) for i in range(len(got)))
    n_pos = df.filter(F.col("f16") > 0).count()
    assert n_pos == int((expect > 0).sum())


def test_int96_reads_as_timestamp_and_matches_oracle(spark):
    """INT96 (legacy parquet timestamp, v2/src/main.rs:35-44): Spark reads
    it natively as a timestamp; min/max/count and an hourly-bucket agg
    match DuckDB on the same file."""
    df = spark.read.parquet(INT96_FIXTURE)
    assert dict(df.dtypes)["ts96"].startswith("timestamp")
    got = df.agg(
        F.date_format(F.min("ts96"), "yyyy-MM-dd HH:mm:ss").alias("mn"),
        F.date_format(F.max("ts96"), "yyyy-MM-dd HH:mm:ss").alias("mx"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    mn, mx, n = duckdb.sql(
        f"""SELECT strftime(min(ts96), '%Y-%m-%d %H:%M:%S'),
                   strftime(max(ts96), '%Y-%m-%d %H:%M:%S'), count(*)
            FROM read_parquet('{INT96_FIXTURE}')"""
    ).fetchone()
    assert (got.mn, got.mx, got.n) == (mn, mx, n)
    s_daily = {
        (r.d, r.n)
        for r in df.groupBy(F.to_date("ts96").alias("d"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    d_daily = set(
        duckdb.sql(
            f"""SELECT CAST(ts96 AS DATE) AS d, count(*) AS n
                FROM read_parquet('{INT96_FIXTURE}') GROUP BY 1"""
        ).fetchall()
    )
    assert s_daily == d_daily


def test_int96_carries_no_statistics(spark):
    """Format fact worth pinning: INT96 chunks have no min/max statistics,
    so row-group pruning over them is impossible by design (the fixture's
    filter pushdown must rely on other columns)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(INT96_FIXTURE).metadata
    for rg in range(md.num_row_groups):
        grp = md.row_group(rg)
        for i in range(grp.num_columns):
            col = grp.column(i)
            if col.path_in_schema == "ts96":
                assert col.physical_type == "INT96"
                assert col.statistics is None
