"""Central query registry: every operator from SURVEY.md §2 + extensions.

Each operator module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB-runnable ANSI SQL). This module
merges them for ``__spark_entry__.py``. Names must be unique across modules;
a collision raises at import time so it can't silently shadow coverage.

Ordering matters: the driver's correctness gate checks the FIRST 50 keys in
iteration order. Round 1 verified the core v1/snowset/join/agg/window surface
(CORRECTNESS_r01, 47/50); round 2 verified the 50 extension operators
(CORRECTNESS_r02, 50/50); round 3 rotated back to the r1-era core plus the
never-checked train_/stream_/kmeans contracts (CORRECTNESS_r03, 50/50);
round 4 rotated to the new-in-r3/r4 contracts plus the oldest r2 fill;
round 5 cleared the r2-only stragglers plus everything r5 modified
(CORRECTNESS_r05, 50/50). Round 6's window (VERDICT r5 #1): the 22
contracts that have NEVER had a driver row (round 5's third-session
additions — sketches, table maintenance, variant, OHLC, markov,
incremental pipeline), the 3 contracts round 6 modifies that
already carry rows (``sim_knn_join`` value collapse, ``time_ewma``
chunked fold, ``text_fingerprint`` oracle fix), and the 25 oldest
r3-row contracts as fill. After this window lands
green, every registered contract has at least one external driver row.
``_PRIORITY`` pins the window explicitly; everything else follows in
module order so the window can rotate again in later rounds without code
churn elsewhere.
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
    "parquet_near_storage_compute_spark.operators.sketches",
    "parquet_near_storage_compute_spark.operators.typed_scan",
    "parquet_near_storage_compute_spark.operators.training",
    "parquet_near_storage_compute_spark.functions.udfs",
    "parquet_near_storage_compute_spark.sources.io",
    "parquet_near_storage_compute_spark.sources.pyds",
    "parquet_near_storage_compute_spark.streaming.stream_ops",
]


#: The 22 contracts that entered the registry in round 5's third session
#: and have never been driver-checked (VERDICT r5 "What's missing" #1).
#: They lead the round-6 window so the external oracle signal finally
#: covers the whole registry.
NEVER_DRIVER_CHECKED = [
    "stream_python_datasource",
    "types_variant_json",
    "sketch_countmin",
    "sketch_bloom_membership",
    "join_skew_salted",
    "dedup_incremental",
    "relational_merge_upsert",
    "sink_compaction",
    "sink_zorder_layout",
    "stream_upsert_foreachbatch",
    "sketch_hll_distinct",
    "sketch_kmv_distinct",
    "pipeline_incremental_ingest",
    "time_ohlc_bars",
    "sketch_kmv_overlap",
    "source_dpp_star_join",
    "agg_bitmap_distinct",
    "relational_scd2_history",
    "events_markov_transitions",
    "agg_approx_percentile_sketch",
    "join_runtime_bloom_filtered",
    "sim_dedup_decisions",
]

#: Contracts round 6 modifies that already carry a driver row — any code
#: change invalidates the old row, so they re-enter the window:
#: sim_knn_join gains the over-cap pilot-set bound (VERDICT r5 #2),
#: time_ewma gains the chunked bounded-state fold (VERDICT r5 #5).
MODIFIED_IN_R6 = [
    "sim_knn_join",
    "time_ewma",
    # oracle fix only (COALESCE for sub-8-char docs, found by the
    # randomized differential sweep; a no-op on the driver corpus, but
    # an oracle change is a contract change — it re-enters the window)
    "text_fingerprint",
]

#: New in round 6, deliberately NOT in the round-6 window (it is fully
#: booked by the 22 never-checked + 3 modified + 26 stalest rows): the
#: model-based quality scoring / resampling pair. Locally oracle-verified
#: every test run (tests/test_registry_oracle.py); they lead the round-7
#: window together with the 20 remaining r3-row contracts.
DEFERRED_TO_R7 = [
    "text_quality_classifier",
    "train_quality_resample",
]

#: The round-6 driver correctness window: 22 never-checked + 3 modified
#: + the 25 contracts whose latest driver row is oldest (round 3), in
#: CORRECTNESS_r03 key order. The 21 remaining r3-row contracts
#: (window_*, iter_kmeans_lite, train_pack/test/stratified/profile,
#: stream_windowed/stateful/dedup/join, agg_min_max_by, agg_stats, agg_percentile)
#: stay on their r3 rows and lead the round-7 fill.
_PRIORITY = NEVER_DRIVER_CHECKED + MODIFIED_IN_R6 + [
    # oldest r3-row contracts, CORRECTNESS_r03 order (25)
    "v1_footer_only_agg",
    "v1_flagship",
    "v1_ladder_real",
    "v1_ladder_worst",
    "v1_grammar_boolean",
    "v1_grammar_extended",
    "v1_count_semantics",
    "v1_projection_rows",
    "snowset_selectivity_distribution",
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
    "agg_pricing_summary",
    "agg_over_expression",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
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
