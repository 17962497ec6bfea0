"""Differential test of EVERY registered query against its DuckDB oracle.

This is the local mirror of the driver's t2 correctness gate: one
parametrized case per (query, oracle) pair, run at sf0.001 for speed.
The same sweep is also run at sf0.01 (the driver's actual scale) via
``tools/run_registry_sweep.py`` as a pre-commit check.
"""

from __future__ import annotations

import pytest

from parquet_near_storage_compute_spark.registry import all_oracles, all_queries
from tests.oracle import compare, duckdb_con

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, sf_dir, con):
    # drop the previous contract's persisted frames (ADVICE r7) — the
    # sweep otherwise accumulates every operator's cache in one session
    spark.catalog.clearCache()
    df = _QUERIES[name](spark, sf_dir)
    compare(df, con, _ORACLES[name])


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_query_without_oracle_runs(name, spark, sf_dir):
    """Rows-only check for non-SQL-expressible ops (driver's weaker gate)."""
    df = _QUERIES[name](spark, sf_dir)
    assert df.count() >= 0
