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
round 4 rotates to the 18 new-in-r3 contracts, the r3/r4-modified dedup/mm
contracts, the 10 new-in-r4 contracts, and the oldest-verified r2 window as
fill. ``_PRIORITY`` pins the window explicitly; everything else follows in
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


#: The round-5 driver correctness window: the 32 contracts whose last
#: external confirmation is round 2 (the straggler list from the end of
#: NOTES_r4.md — after this window lands green, every registered contract
#: has a round-3-or-later driver row), the 14 contracts round 5 modified
#: or added (the engine-exactness rewrites from the float audit —
#: join_outer_full decimal sums, snowset_retrieval_rate cents-sum +
#: sorted-fold, snowset_selectivity_distribution_sql double literal, the
#: two round-trip sources' integer cents sum, udaf_geomean / zscore are
#: in the straggler set already — plus the salted sim_knn_join, the new
#: sim_range_search / text_dedup_segments / mm_audio_decode /
#: stream_session_windows / join_bucketed_colocated, the single-scan
#: pipeline_curation_report, the bounds-checked mm_image_decode,
#: meta_stat_prefixes' env-derived corpus dir, the Python-datasource
#: selective scan + manifest sink, the EWMA fold, and the hash global
#: shuffle). 32 + 18 fill the 50 slots exactly; the one r5 contract that
#: doesn't fit leads DEFERRED_TO_R6.
_PRIORITY = [
    # r2-only stragglers — oldest external confirmation (32)
    "agg_approx_distinct",
    "agg_collect",
    "agg_reaggregate",
    "mm_binary_metadata",
    "mm_feature_extract",
    "mm_frame_sample",
    "pipeline_training_data",
    "relational_correlated_subquery",
    "relational_distinct_rows",
    "relational_pivot",
    "relational_unpivot",
    "scalar_arithmetic_chain",
    "scalar_array_ops",
    "scalar_case_bucket",
    "scalar_string_ops",
    "setop_except",
    "setop_intersect",
    "text_fingerprint",
    "setop_union_all",
    "sort_limit_topk",
    "source_glob_scan",
    "time_datetime_parts",
    "time_json_extract",
    "time_session_window_native",
    "time_sessionize",
    "time_sliding_window",
    "time_tumbling_hourly",
    "types_unsigned_decimal",
    "udaf_geomean",
    "udf_grouped_map_zscore",
    "udf_readability",
    "udf_sql_surface",
    # modified or new in r5 (18; a 19th, stream_python_datasource, is
    # deferred — see DEFERRED_TO_R6)
    "join_outer_full",
    "sim_knn_join",
    "sim_range_search",
    "text_dedup_segments",
    "pipeline_curation_report",
    "source_jsonl_scan",
    "source_orc_scan",
    "meta_stat_prefixes",
    "snowset_retrieval_rate",
    "snowset_selectivity_distribution_sql",
    "mm_image_decode",
    "mm_audio_decode",
    "stream_session_windows",
    "join_bucketed_colocated",
    "source_python_datasource",
    "sink_python_datasource",
    "time_ewma",
    "train_global_shuffle",
]

#: New in round 5 but deliberately NOT in the 50-slot round-5 window: the
#: must-cover set (32 r2-only stragglers + 18 r5-modified/new) fills all 50
#: slots exactly. These are locally oracle-verified every test run
#: (tests/test_registry_oracle.py) and lead the round-6 window.
DEFERRED_TO_R6 = [
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
