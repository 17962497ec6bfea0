"""Property-based tests for the P6 predicate grammar: for random predicate
trees, the translated Column must select exactly the rows a reference Python
evaluator selects (differential semantics, not just parseability)."""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_near_storage_compute_spark.functions.grammar import parse_predicate

#: (name, python getter) for the columns the generator may reference
NUMERIC_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_linenumber"]
OPS = ["<", "<=", "==", ">=", ">", "!="]

_rows_cache: list[dict] | None = None


def _rows(spark, sf_dir) -> list[dict]:
    global _rows_cache
    if _rows_cache is None:
        from parquet_near_storage_compute_spark.tables import load_table

        _rows_cache = [
            r.asDict()
            for r in load_table(spark, sf_dir, "lineitem")
            .select(*NUMERIC_COLS)
            .limit(400)
            .collect()
        ]
    return _rows_cache


@st.composite
def predicates(draw, depth: int = 0):
    """Random predicate tree in the v1 grammar + a Python evaluator for it."""
    if depth >= 3 or draw(st.booleans()):
        col = draw(st.sampled_from(NUMERIC_COLS))
        op = draw(st.sampled_from(OPS))
        val = draw(
            st.floats(
                min_value=0, max_value=110000, allow_nan=False, allow_infinity=False
            ).map(lambda x: round(x, 2))
        )
        text = f"{col} {op} {val}"
        py = {
            "<": lambda r, c=col, v=val: r[c] < v,
            "<=": lambda r, c=col, v=val: r[c] <= v,
            "==": lambda r, c=col, v=val: r[c] == v,
            ">=": lambda r, c=col, v=val: r[c] >= v,
            ">": lambda r, c=col, v=val: r[c] > v,
            "!=": lambda r, c=col, v=val: r[c] != v,
        }[op]
        return text, py
    kind = draw(st.sampled_from(["and", "or", "not"]))
    lt, lf = draw(predicates(depth=depth + 1))
    if kind == "not":
        return f"NOT ({lt})", lambda r, f=lf: not f(r)
    rt, rf = draw(predicates(depth=depth + 1))
    if kind == "and":
        return f"({lt}) AND ({rt})", lambda r, a=lf, b=rf: a(r) and b(r)
    return f"({lt}) OR ({rt})", lambda r, a=lf, b=rf: a(r) or b(r)


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(pred=predicates())
def test_grammar_matches_python_semantics(pred, spark, sf_dir):
    text, py_eval = pred
    rows = _rows(spark, sf_dir)
    expected = sum(1 for r in rows if py_eval(r))

    from parquet_near_storage_compute_spark.tables import load_table

    df = (
        load_table(spark, sf_dir, "lineitem")
        .select(*NUMERIC_COLS)
        .limit(400)
        .filter(parse_predicate(text))
    )
    assert df.count() == expected, text
