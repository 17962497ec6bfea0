"""Differential coverage for the scan_agg entries trimmed from the contract
registry (VERDICT r1: seven ladder rungs + five grammar variants burned
driver window slots on near-duplicates). The functions and semantics are
unchanged — this file keeps their oracle checks as repo tests.
"""

from __future__ import annotations

import pytest

from parquet_near_storage_compute_spark.operators.scan_agg import (
    LADDER,
    _ladder_oracle,
    _ladder_query,
    grammar_datetime,
    grammar_int_widening,
    grammar_utf8,
)
from tests.oracle import compare, duckdb_con


@pytest.fixture(scope="module")
def con(sf_dir):
    c = duckdb_con(sf_dir)
    yield c
    c.close()


@pytest.mark.parametrize("rung", ["best_case", "p10", "p25", "p50", "p75"])
def test_trimmed_ladder_rungs(spark, sf_dir, con, rung):
    compare(_ladder_query(rung)(spark, sf_dir), con, _ladder_oracle(rung))


GRAMMAR_CASES = [
    (
        grammar_datetime,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(l_extendedprice) AS DOUBLE) AS sum_price
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
        """,
    ),
    (
        grammar_utf8,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows
        FROM lineitem
        WHERE l_returnflag >= 'N' AND NOT l_linestatus = 'F'
        """,
    ),
    (
        grammar_int_widening,
        """
        SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
               CAST(SUM(l_linenumber) AS BIGINT) AS sum_linenumber
        FROM lineitem
        WHERE l_linenumber <= 3 AND l_linenumber != 2
        """,
    ),
]


@pytest.mark.parametrize("fn,sql", GRAMMAR_CASES, ids=[f.__name__ for f, _ in GRAMMAR_CASES])
def test_trimmed_grammar_variants(spark, sf_dir, con, fn, sql):
    compare(fn(spark, sf_dir), con, sql)
