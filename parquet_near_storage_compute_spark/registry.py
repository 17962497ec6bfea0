"""Central query registry: every operator from SURVEY.md §2 + extensions.

Each operator module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB-runnable ANSI SQL). This module
merges them for ``__spark_entry__.py``. Names must be unique across modules;
a collision raises at import time so it can't silently shadow coverage.

Ordering matters: the driver's correctness gate checks the FIRST 50 keys in
iteration order. Round 1 verified the core v1/snowset/join/agg/window surface
(CORRECTNESS_r01, 47/50); round 2 verified the 50 extension operators
(CORRECTNESS_r02, 50/50); round 3 rotates back to the r1-era core plus the
never-checked train_/stream_/kmeans contracts so every registered operator
has a driver row from round 2 or 3. ``_PRIORITY`` pins the window explicitly;
everything else follows in module order so the window can rotate again in
later rounds without code churn elsewhere.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

_MODULES = [
    "parquet_near_storage_compute_spark.operators.scan_agg",
    "parquet_near_storage_compute_spark.operators.snowset",
    "parquet_near_storage_compute_spark.operators.joins",
    "parquet_near_storage_compute_spark.operators.aggregates",
    "parquet_near_storage_compute_spark.operators.windows",
    "parquet_near_storage_compute_spark.operators.relational",
    "parquet_near_storage_compute_spark.operators.timeseries",
    "parquet_near_storage_compute_spark.operators.dedup",
    "parquet_near_storage_compute_spark.operators.similarity",
    "parquet_near_storage_compute_spark.operators.textops",
    "parquet_near_storage_compute_spark.operators.multimodal",
    "parquet_near_storage_compute_spark.operators.pipeline",
    "parquet_near_storage_compute_spark.operators.scalar_funcs",
    "parquet_near_storage_compute_spark.operators.typed_scan",
    "parquet_near_storage_compute_spark.operators.training",
    "parquet_near_storage_compute_spark.functions.udfs",
    "parquet_near_storage_compute_spark.sources.io",
    "parquet_near_storage_compute_spark.streaming.stream_ops",
]


#: The round-3 driver correctness window: the 48 contracts with no
#: current-round row after round 2 — the r1-verified core (v1/snowset/joins/
#: aggs/windows, several modified since their r1 rows, e.g. the salted
#: window_topk_per_group) plus the 9 never-driver-checked (train_* ×4,
#: stream_* ×4, iter_kmeans_lite, now oracle-backed via the unrolled Lloyd
#: SQL) — plus two re-confirmation slots for the dedup contracts whose
#: candidate-generation internals change this round (hot-bucket cap /
#: bounded blocks). After this window lands green, every registered contract
#: has a driver row from round 2 or 3.
_PRIORITY = [
    # v1 scan/agg core (8)
    "v1_footer_only_agg",
    "v1_flagship",
    "v1_ladder_real",
    "v1_ladder_worst",
    "v1_grammar_boolean",
    "v1_grammar_extended",
    "v1_count_semantics",
    "v1_projection_rows",
    # snowset (3)
    "snowset_selectivity_distribution",
    "snowset_selectivity_distribution_sql",
    "snowset_retrieval_rate",
    # joins (10)
    "join_theta",
    "join_self",
    "join_broadcast_inner",
    "join_multiway",
    "join_semi",
    "join_anti",
    "join_cross_pct",
    "join_window_pct",
    "join_asof",
    "join_range",
    # aggregates (9)
    "agg_pricing_summary",
    "agg_over_expression",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    "agg_min_max_by",
    "agg_stats",
    "agg_percentile",
    # windows (9; topk salt + ntile plan changed post-r1)
    "window_first_last_nth",
    "window_percent_rank_cume",
    "window_mode_per_group",
    "window_topk_per_group",
    "window_rank_dense_rank",
    "window_lag_lead",
    "window_moving_sum",
    "window_running_total",
    "window_ntile",
    # iterative — first driver hash check (oracle added round 3) (1)
    "iter_kmeans_lite",
    # training ops — never driver-checked (4)
    "train_pack_sequences",
    "train_test_split",
    "train_stratified_sample",
    "train_profile_columns",
    # streaming — never driver-checked (4)
    "stream_windowed_counts",
    "stream_stateful_user_stats",
    "stream_dedup_exact",
    "stream_stream_join",
    # re-confirm: modified this round (hot-bucket cap, bounded blocks) (2)
    "dedup_minhash_lsh",
    "dedup_blocked_jaccard",
]


def _collect() -> tuple[
    dict[str, Callable[[SparkSession, str], DataFrame]], dict[str, str]
]:
    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for mod_name in _MODULES:
        mod = importlib.import_module(mod_name)
        for name, fn in getattr(mod, "QUERIES", {}).items():
            if name in queries:
                raise ValueError(f"duplicate query name {name!r} in {mod_name}")
            queries[name] = fn
        for name, sql in getattr(mod, "ORACLE_SQL", {}).items():
            if name in oracles:
                raise ValueError(f"duplicate oracle name {name!r} in {mod_name}")
            oracles[name] = sql
    unknown = set(oracles) - set(queries)
    if unknown:
        raise ValueError(f"oracles without queries: {sorted(unknown)}")
    missing = [n for n in _PRIORITY if n not in queries]
    if missing:
        raise ValueError(f"_PRIORITY names not registered: {missing}")
    ordered = {n: queries[n] for n in _PRIORITY}
    ordered.update((n, f) for n, f in queries.items() if n not in ordered)
    return ordered, oracles


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _collect()[0]


def all_oracles() -> dict[str, str]:
    return _collect()[1]
