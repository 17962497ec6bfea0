"""Local mimic of the driver's DuckDB-oracle comparison.

Row-count + column names + order-insensitive value comparison with float
tolerance (FIXTURES.md: float columns epsilon-rounded before hashing; v1
itself uses epsilon float equality, ``v1/src/main.rs:716-732``).
"""

from __future__ import annotations

import datetime as _dt
import math
from typing import Any

import duckdb

from parquet_near_storage_compute_spark.tables import TABLES, table_path


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{table_path(sf_dir, t)}'"
        )
    return con


def _norm_value(v: Any) -> Any:
    if isinstance(v, bool):
        return v
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0:
            return 0.0
        # relative epsilon rounding: keep ~9 significant digits
        mag = math.floor(math.log10(abs(v)))
        return round(v, max(0, 9 - mag - 1))
    if isinstance(v, _dt.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_norm_value(x) for x in v)
    if isinstance(v, dict):
        return tuple(sorted((k, _norm_value(x)) for k, x in v.items()))
    return v


def _norm_rows(rows: list[tuple], colnames: list[str]) -> list[tuple]:
    order = sorted(range(len(colnames)), key=lambda i: colnames[i])
    normed = [tuple(_norm_value(r[i]) for i in order) for r in rows]
    return sorted(normed, key=repr)


def compare(spark_df, con: duckdb.DuckDBPyConnection, sql: str) -> None:
    """Assert the Spark result and the DuckDB oracle result match."""
    spark_cols = spark_df.columns
    spark_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    duck_cols = [d[0] for d in rel.description]
    duck_rows = rel.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"column mismatch: spark={sorted(spark_cols)} duck={sorted(duck_cols)}"
    )
    assert len(spark_rows) == len(duck_rows), (
        f"row count mismatch: spark={len(spark_rows)} duck={len(duck_rows)}"
    )
    s = _norm_rows(spark_rows, spark_cols)
    d = _norm_rows(duck_rows, duck_cols)
    for i, (a, b) in enumerate(zip(s, d)):
        assert a == b, f"value mismatch at sorted row {i}:\n  spark={a}\n  duck ={b}"
