"""Unsigned + decimal physical-type coverage.

The reference filters and aggregates unsigned ints end-to-end (UInt8-64
``build_filter_mask``/aggregators, ``v1/src/main.rs:1015-1033, 1326-1330``)
and v2 handles all seven parquet physical types (``v2/src/main.rs:35-44``).
The driver's sf tables carry no unsigned or decimal columns, so this
contract reads the committed fixture ``fixtures/types_unsigned_decimal.
parquet`` (generated deterministically by ``tools/make_type_fixture.py``).

Engine mapping asymmetry is the whole point of the contract: Spark reads
parquet unsigned logical types as the next-wider signed type (UINT_8→short,
UINT_16→int, UINT_32→long, UINT_64→DECIMAL(20,0)) while DuckDB reads native
unsigned — so every output is cast to an engine-neutral representation:
BIGINT for u8-u32 aggregates, DECIMAL(38,0) rendered as a string for u64
(the fixture's values exceed the signed-64 range, so no 64-bit integer type
can carry them), DOUBLE for the DECIMAL(18,4) column (exact: sums stay far
below 2^53).

Scale: one pushed-filter scan + one low-cardinality groupBy — the same
bounded-shuffle profile as every other scan_agg contract.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.tables import ensure_engine_confs

FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "fixtures",
    "types_unsigned_decimal.parquet",
)

#: 2^63 — the first value a signed 64-bit integer cannot hold.
_I64_MAX_PLUS_1 = "9223372036854775808"


def unsigned_decimal_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter + grouped aggregate over UINT_8/16/32/64 and DECIMAL(18,4)
    columns. ``sf_dir`` is unused: the sf tables have no unsigned physical
    types, so the committed fixture is the table under test."""
    ensure_engine_confs(spark)
    df = spark.read.parquet(FIXTURE)
    over_i64 = F.col("u64") >= F.lit(_I64_MAX_PLUS_1).cast("decimal(20,0)")
    u64_str = lambda c: c.cast("decimal(38,0)").cast("string")  # noqa: E731
    return (
        df.filter((F.col("u32") > F.lit(1_000_000)) & (F.col("u8") >= F.lit(8)))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("u8").cast("bigint").alias("sum_u8"),
            F.max("u16").cast("bigint").alias("max_u16"),
            F.sum("u32").cast("bigint").alias("sum_u32"),
            u64_str(F.sum("u64")).alias("sum_u64"),
            u64_str(F.min("u64")).alias("min_u64"),
            u64_str(F.max("u64")).alias("max_u64"),
            F.sum(F.when(over_i64, 1).otherwise(0)).cast("bigint").alias(
                "n_over_i64max"
            ),
            F.sum("dec").cast("double").alias("sum_dec"),
            F.min("dec").cast("double").alias("min_dec"),
            F.max("dec").cast("double").alias("max_dec"),
        )
        .orderBy("grp")
    )


def variant_json_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props through Spark 4's VARIANT type: ``parse_json``
    once into the binary variant encoding, then typed path extraction with
    ``try_variant_get`` (invalid/missing paths → NULL, never a task
    failure). The OTHER semi-structured path from ``time_json_extract``'s
    schema-declared ``from_json``: VARIANT needs no schema up front, keeps
    the full document queryable, and its binary encoding is the
    open-format answer to JSON strings at 100 TB (parse once at ingest,
    extract many times without re-tokenizing; shreddable into parquet).
    ``schema_of_variant`` feeds a distinct-count sanity column — 1 ⇔
    every props payload in the corpus has the same shape."""
    ensure_engine_confs(spark)
    from parquet_near_storage_compute_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type",
        F.parse_json("props").alias("v"),
    ).select(
        "event_type",
        F.try_variant_get("v", "$.k", "bigint").alias("k"),
        F.schema_of_variant(F.col("v")).alias("vschema"),
        F.try_variant_get("v", "$.missing", "bigint").alias("absent"),
    )
    return (
        v.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
            F.count("absent").alias("n_absent_nonnull"),
            # rendering differs across engines ("OBJECT<k: BIGINT>" vs
            # json_structure's {"k":...}), but the distinct COUNT is
            # rendering-invariant: 1 ⇔ the corpus payloads are uniform
            F.count_distinct("vschema").alias("n_schemas"),
        )
        .orderBy("event_type")
    )


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "types_unsigned_decimal": unsigned_decimal_scan,
    "types_variant_json": variant_json_scan,
}

ORACLE_SQL: dict[str, str] = {
    "types_unsigned_decimal": f"""
        SELECT grp,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(u8) AS BIGINT) AS sum_u8,
               CAST(MAX(u16) AS BIGINT) AS max_u16,
               CAST(SUM(u32) AS BIGINT) AS sum_u32,
               CAST(CAST(SUM(u64) AS DECIMAL(38,0)) AS VARCHAR) AS sum_u64,
               CAST(CAST(MIN(u64) AS DECIMAL(38,0)) AS VARCHAR) AS min_u64,
               CAST(CAST(MAX(u64) AS DECIMAL(38,0)) AS VARCHAR) AS max_u64,
               CAST(SUM(CASE WHEN u64 >= {_I64_MAX_PLUS_1} THEN 1 ELSE 0 END)
                    AS BIGINT) AS n_over_i64max,
               CAST(SUM(dec) AS DOUBLE) AS sum_dec,
               CAST(MIN(dec) AS DOUBLE) AS min_dec,
               CAST(MAX(dec) AS DOUBLE) AS max_dec
        FROM read_parquet('{FIXTURE}')
        WHERE u32 > 1000000 AND u8 >= 8
        GROUP BY grp
        ORDER BY grp
    """,
    "types_variant_json": """
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS sum_k,
               CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT))
                    AS BIGINT) AS max_k,
               CAST(COUNT(json_extract(props, '$.missing')) AS BIGINT)
                 AS n_absent_nonnull,
               CAST(COUNT(DISTINCT json_structure(props)) AS BIGINT)
                 AS n_schemas
        FROM events
        GROUP BY event_type ORDER BY event_type
    """,
}
