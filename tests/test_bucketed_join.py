"""Bucketed co-located join (operators/joins.py): both sides are written
``bucketBy(N, custkey)`` + ``sortBy``, so the SortMergeJoin must run with
ZERO exchanges in its subtree — the layout pays the shuffle once at write
time and every subsequent join on that key is exchange-free. This is the
plan shape that makes big-big joins viable at 100 TB.
"""

from __future__ import annotations

from parquet_near_storage_compute_spark.operators.joins import (
    bucketed_colocated_join,
)


def test_join_subtree_is_exchange_free(spark, sf_dir):
    df = bucketed_colocated_join(spark, sf_dir)
    s = df._jdf.queryExecution().executedPlan().toString()
    # (AdaptiveSparkPlan hides its inner plan from children(), so assert
    # on the printed tree: everything after the SortMergeJoin line is its
    # subtree — ancestors print above it)
    assert "SortMergeJoin" in s, f"expected SortMergeJoin:\n{s}"
    subtree = s[s.index("SortMergeJoin"):]
    assert "Exchange" not in subtree, (
        f"bucketed join still shuffles:\n{subtree}"
    )
    assert subtree.count("Bucketed: true") == 2
    assert "SelectedBucketsCount: 8 out of 8" in subtree
    # and the result itself is correct end to end
    rows = {r["c_mktsegment"]: r["n_orders"] for r in df.collect()}
    assert sum(rows.values()) > 0
