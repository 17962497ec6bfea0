"""Global plan audit: every registered query must compile to a scale-safe
physical plan — no unintended cartesian products, nested-loop joins only
where a tiny broadcast side makes them the right strategy, broadcast hash
joins on the dim-side star joins. This is the ".explain and iterate" gate
from the build brief, automated."""

from __future__ import annotations

import pytest

from parquet_near_storage_compute_spark.registry import all_queries

#: BroadcastNestedLoopJoin is correct ONLY for these (deliberate tiny-side
#: cross joins: the J2 percentage-of-total pattern, the brute-force cosine
#: baseline, SimHash's vocab × 16-bit grid, the verbatim Snowset comma-join).
BNLJ_WHITELIST = {
    "join_cross_pct",
    # global HLL estimate row: 1-row union-sketch frame × 1-row exact-count
    # frame (the J2 pct-of-total shape; the corpus sees only aggregates)
    "sketch_hll_distinct",
    # 1-row approx-percentile frame × the fact for the re-ranking count
    # (the J2 pct-of-total shape; the sketch side is a single row)
    "agg_approx_percentile_sketch",
    # sketch-pair theta join: one ≤k-element array row per GROUP on each
    # side (groups × groups pairs, both dimension-sized by construction —
    # that reduction is the sketch's whole point; the corpus sees only
    # the hash projection and an equi-join for the exact baseline)
    "sketch_kmv_overlap",
    "sim_topk_bruteforce",
    "snowset_selectivity_distribution_sql",
    # IVF / k-means cell assignment: deliberate cross join vs the ~k-row
    # broadcast codebook (narrow pass; candidate search is an equi-join)
    "sim_topk_ivf",
    "iter_kmeans_lite",
    # theta join has no equi key by definition; the small side broadcasts
    "join_theta",
    # dense-calendar construction: exploded hour sequence × distinct types,
    # both dimension-sized (the fact side is pre-aggregated before joining)
    "time_gap_fill",
    # normalization constant: ≤#sources-row counts frame × 1-row totals
    # frame (the corpus itself only sees a broadcast hash join on source)
    "train_mixture_sample",
    # corpus-size constant: 1-row n_docs frame broadcast onto the scored
    # term frame
    "text_tfidf_topk",
}

_QUERIES = all_queries()

#: Streaming queries execute on build (memory sink), so exclude them from
#: the plan-text audit — their batch twins are covered.
_SKIP = {
    "stream_windowed_counts",
    "stream_stateful_user_stats",
    "stream_sliding_counts",
    "stream_append_closed_windows",
}


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - _SKIP))
def test_plan_is_scale_safe(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan, f"{name}: cartesian product:\n{plan}"
    if "BroadcastNestedLoopJoin" in plan:
        assert name in BNLJ_WHITELIST, (
            f"{name}: unexpected BroadcastNestedLoopJoin:\n{plan}"
        )


@pytest.mark.parametrize(
    "name",
    ["join_broadcast_inner", "join_multiway", "snowset_selectivity_distribution"],
)
def test_dim_joins_broadcast(name, spark, sf_dir):
    df = _QUERIES[name](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan, f"{name}: no broadcast hash join:\n{plan}"


def test_ntile_has_no_full_data_global_sort(spark, sf_dir):
    """window_ntile's r2 form put every customer row through one
    single-partition WindowExec. The r3 two-phase plan must rank the full
    data inside shard-partitioned windows; the only SinglePartition
    exchange allowed is the one over the tiny per-shard counts frame."""
    import re

    df = _QUERIES["window_ntile"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "ntile(" not in plan  # bucket assignment is arithmetic now
    assert re.search(r"Window \[row_number\(\).*windowspecdefinition\(shard", plan), (
        f"local rank window not partitioned by shard:\n{plan}"
    )
    assert plan.count("Exchange SinglePartition") <= 1, (
        f"more than one single-partition exchange:\n{plan}"
    )
    # the full-data local-rank window must not require SinglePartition
    for line in plan.splitlines():
        if "row_number()" in line and "Window" in line:
            assert "shard" in line
