"""Unit tests for the P6/A6 mini-grammar translator."""

from __future__ import annotations

import pytest

from parquet_near_storage_compute_spark.functions.grammar import (
    parse_aggregation,
    parse_predicate,
)


def test_precedence_or_lower_than_and(spark, sf_dir):
    from parquet_near_storage_compute_spark.tables import load_table

    df = load_table(spark, sf_dir, "lineitem")
    # a OR b AND c  ==  a OR (b AND c)
    n1 = df.filter(
        parse_predicate("l_returnflag == 'R' OR l_quantity > 40 AND l_discount < 0.02")
    ).count()
    n2 = df.filter(
        parse_predicate("l_returnflag == 'R' OR (l_quantity > 40 AND l_discount < 0.02)")
    ).count()
    assert n1 == n2


def test_not_demorgan(spark, sf_dir):
    from parquet_near_storage_compute_spark.tables import load_table

    df = load_table(spark, sf_dir, "lineitem")
    n1 = df.filter(parse_predicate("NOT (l_quantity < 10 OR l_discount >= 0.05)")).count()
    n2 = df.filter(
        parse_predicate("l_quantity >= 10 AND l_discount < 0.05")
    ).count()
    assert n1 == n2


def test_flipped_literal_column(spark, sf_dir):
    from parquet_near_storage_compute_spark.tables import load_table

    df = load_table(spark, sf_dir, "lineitem")
    assert (
        df.filter(parse_predicate("50.0 < l_quantity")).count()
        == df.filter(parse_predicate("l_quantity > 50.0")).count()
    )


def test_datetime_literal(spark, sf_dir):
    from parquet_near_storage_compute_spark.tables import load_table

    df = load_table(spark, sf_dir, "lineitem")
    n = df.filter(parse_predicate("l_shipdate > 2001-01-01-00:00:00")).count()
    assert n > 0


def test_extended_in_between_like(spark, sf_dir):
    from parquet_near_storage_compute_spark.tables import load_table
    from pyspark.sql import functions as F

    df = load_table(spark, sf_dir, "lineitem")
    n1 = df.filter(parse_predicate("l_returnflag IN ('A', 'R')")).count()
    n2 = df.filter(F.col("l_returnflag").isin("A", "R")).count()
    assert n1 == n2 > 0

    b1 = df.filter(parse_predicate("l_quantity BETWEEN 10 AND 20")).count()
    b2 = df.filter(F.col("l_quantity").between(10, 20)).count()
    assert b1 == b2 > 0

    l1 = df.filter(parse_predicate("l_linestatus LIKE 'F%'")).count()
    l2 = df.filter(F.col("l_linestatus").like("F%")).count()
    assert l1 == l2 > 0


def test_extended_grammar_errors():
    with pytest.raises(ValueError):
        parse_predicate("l_returnflag IN ()")
    with pytest.raises(ValueError):
        parse_predicate("l_quantity BETWEEN 10 OR 20")


def test_bad_predicate_raises():
    with pytest.raises(ValueError):
        parse_predicate("l_quantity >")
    with pytest.raises(ValueError):
        parse_aggregation("MEDIAN(x)")


def test_pushed_filters_visible(spark, sf_dir):
    """Parity observable (SURVEY §4): the grammar's predicate must reach the
    Parquet scan as PushedFilters — the Spark equivalent of v1's row-group
    pruning (v1/src/main.rs:626-685)."""
    from parquet_near_storage_compute_spark.tables import load_table

    df = load_table(spark, sf_dir, "lineitem").filter(
        parse_predicate("l_extendedprice > 53000.0")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "l_extendedprice" in plan
