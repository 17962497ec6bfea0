"""Write→read round-trip fidelity for every table (sink parity: what the
engine writes, the engine — and the oracle — can read back identically)."""

from __future__ import annotations

import os
import shutil

import pytest

from parquet_near_storage_compute_spark.tables import TABLES, load_table

TMP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".tmp")
RT = os.path.join(TMP, "roundtrip")


@pytest.fixture(scope="module", autouse=True)
def _clean():
    os.makedirs(RT, exist_ok=True)
    yield
    shutil.rmtree(RT, ignore_errors=True)


@pytest.mark.parametrize("table", TABLES)
def test_parquet_roundtrip(spark, sf_dir, table):
    src = load_table(spark, sf_dir, table)
    out = os.path.join(RT, table)
    src.write.mode("overwrite").parquet(out)
    back = spark.read.parquet(out)
    assert back.schema == src.schema
    assert back.count() == src.count()
    # order-insensitive content check on a stable projection
    key = src.columns[0]
    a = {tuple(r) for r in src.select(key).collect()}
    b = {tuple(r) for r in back.select(key).collect()}
    assert a == b
