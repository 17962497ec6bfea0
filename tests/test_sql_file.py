"""Reference-style SQL files (DuckDB dialect) run unmodified: COPY wrapper →
CSV sink, parquet path literals → scans. The fixture below mirrors the
*shape* of datasets/snowset/query_selectivity_distribution.sql over our star
schema (CTE chain → join → bucketing → counts → comma-join percentage)."""

from __future__ import annotations

import os
import shutil

import pytest

from parquet_near_storage_compute_spark.sources.sql_file import (
    run_sql,
    run_sql_file,
)

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
OUT = os.path.join(TMP, "sql_file_out")

_FIXTURE = """COPY (
  WITH
    supplier_size_estimates AS (
      SELECT
        l_suppkey,
        MAX((l_extendedprice / NULLIF(l_quantity, 0)) * (1 + l_tax)) AS est_size
      FROM
        '{li}'
      GROUP BY
        l_suppkey
    ),
    row_selectivity AS (
      SELECT
        q.l_suppkey,
        CASE
          WHEN ws.est_size > 0 THEN q.l_extendedprice / ws.est_size
          ELSE NULL
        END AS ratio
      FROM
        '{li}' q
        JOIN supplier_size_estimates ws ON q.l_suppkey = ws.l_suppkey
    ),
    bucketed AS (
      SELECT LEAST(CEIL(ratio * 100), 100) AS bucket FROM row_selectivity
    ),
    counts AS (
      SELECT bucket, COUNT(*) AS n FROM bucketed GROUP BY bucket
    ),
    total AS (SELECT SUM(n) AS t FROM counts)
  SELECT
    c.bucket, c.n, (c.n * 100.0) / tt.t AS pct
  FROM
    counts c,
    total tt
  ORDER BY
    c.bucket
) TO 'selectivity_out.csv' (FORMAT CSV, HEADER);
"""


@pytest.fixture(scope="module")
def sql_path(sf_dir):
    os.makedirs(OUT, exist_ok=True)
    li = f"{sf_dir}/lineitem.parquet"
    p = os.path.join(OUT, "fixture_query.sql")
    with open(p, "w") as fh:
        fh.write(_FIXTURE.format(li=li))
    yield p
    shutil.rmtree(OUT, ignore_errors=True)


def test_reference_style_sql_file_runs(spark, sql_path):
    df = run_sql_file(spark, sql_path, out_dir=OUT)
    rows = df.collect()
    assert len(rows) > 0
    # Spark types the 100.0 literal as DECIMAL → pct arrives as Decimal
    assert abs(sum(float(r.pct) for r in rows) - 100.0) < 1e-6
    # the COPY sink produced a header CSV
    out = os.path.join(OUT, "selectivity_out.csv")
    part = [f for f in os.listdir(out) if f.startswith("part-")][0]
    with open(os.path.join(out, part)) as fh:
        header = fh.readline().strip()
    assert header.split(",") == ["bucket", "n", "pct"]


def test_plain_statement_without_copy(spark, sf_dir):
    df = run_sql(
        spark,
        f"SELECT COUNT(*) AS n FROM '{sf_dir}/orders.parquet'",
    )
    assert df.collect()[0].n > 0


GOLDEN = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "golden_selectivity_sf0.01.csv",
)


def test_copy_csv_matches_committed_golden(spark, sf_oracle_dir):
    """End-to-end artifact pin: the COPY→CSV path at sf0.01 must reproduce
    the committed golden byte for byte (header, row order, decimal
    formatting — any drift in the sink or the query shows up here)."""
    import glob as _glob

    golden_out = os.path.join(OUT, "golden_rerun")
    os.makedirs(golden_out, exist_ok=True)
    sql = _FIXTURE.format(li=f"{sf_oracle_dir}/lineitem.parquet")
    run_sql(spark, sql, base_dir=golden_out, out_dir=golden_out)
    (part,) = _glob.glob(
        os.path.join(golden_out, "selectivity_out.csv", "part-*.csv")
    )
    with open(part, "rb") as fh:
        produced = fh.read()
    with open(GOLDEN, "rb") as fh:
        golden = fh.read()
    assert produced == golden
