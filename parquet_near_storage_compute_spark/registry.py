"""Central query registry: every operator from SURVEY.md §2 + extensions.

Each operator module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB-runnable ANSI SQL). This module
merges them for ``__spark_entry__.py``. Names must be unique across modules;
a collision raises at import time so it can't silently shadow coverage.

Ordering matters: the driver's correctness gate checks the FIRST 50 keys in
iteration order. Round 1 verified the core v1/snowset/join/agg/window surface
(CORRECTNESS_r01, 47/50); round 2 the 50 extension operators; round 3 the
r1-era core plus the never-checked train_/stream_/kmeans contracts; round 4
the new-in-r3/r4 contracts plus the oldest r2 fill; round 5 the r2-only
stragglers plus everything r5 modified; round 6 the 22 never-checked
r5-third-session contracts + 3 modified + the 25 oldest r3 rows; round 7 the
2 deferred + 19 new + 3 modified + all 21 remaining r3-row contracts + the
5 oldest r4 rows — all 50/50 green, so every live contract now has a green
driver row and none is staler than round 4.

Round 8 retired the full 37-contract r4 backlog (50/50 green), so after it
no live contract's newest driver row is older than round 5; staleness by
round is {r5: 41, r6: 49, r7: 45, r8: 50}.

Round 9's window (VERDICT r8 #2): 3 new contracts (`v1_wide92_flagship`,
the hash-verified oracle over the 92-column reference-width fixture;
`train_source_cap`, domain capping; `dedup_threshold_curve`, the
threshold-selection report) + 5 modified lead, then ALL **41** contracts
whose newest driver row is CORRECTNESS_r05 (computed from the r0*.json
history exactly as tests/test_registry_window.py does — never
hand-counted), then the oldest round-6 row in CORRECTNESS_r06 key order
as fill (1). After this window lands green, no live contract's newest
driver row is older than round 6.
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


#: New in round 9 — enter the window immediately:
#: v1_wide92_flagship (VERDICT r8 #7): the v1 filter+5-agg flagship on
#: memoryUsed over the committed 92-column reference-width fixture —
#: until now the wide92 surface carried byte-accounting evidence only;
#: this adds the hash-verified DuckDB oracle on the same file;
#: train_source_cap: domain capping — keep the SOURCE_CAP smallest
#: md5-draw docs per source via the salted two-phase k-min (no
#: single-task mega-domain sort);
#: dedup_threshold_curve: the Jaccard-decile operating curve over the
#: LSH candidates (pairs per decile + cumulative at-or-above) — one
#: verify join answers every candidate threshold.
NEW_IN_R9 = [
    "v1_wide92_flagship",
    "train_source_cap",
    "dedup_threshold_curve",
]

#: Contracts round 9 modifies that already carry driver rows — the change
#: invalidates the old row, so they re-enter the window:
#: dedup_connected_components / dedup_keep_best / train_decontaminate_trim
#: drop their corpus-coupled forced broadcasts (VERDICT r8 #1 — AQE sizes
#: the joins at runtime; results unchanged, plans legitimately may);
#: sim_topk_pq / sim_topk_ivf_pq switch codebook training to the bounded
#: PQ_TRAIN_N k-min sample, trained driver-side in exact int64 NumPy
#: (VERDICT r8 #3 — the FAISS train-on-sample discipline; oracles grew
#: the matching trainids/trainsub CTEs, still bit-for-bit).
MODIFIED_IN_R9 = [
    "dedup_connected_components",
    "dedup_keep_best",
    "train_decontaminate_trim",
    "sim_topk_pq",
    "sim_topk_ivf_pq",
]

#: The round-9 driver correctness window (VERDICT r8 #2): the 3 new + 5
#: modified contracts lead; then all 41 contracts whose newest driver row
#: is CORRECTNESS_r05, in CORRECTNESS_r05 key order; the remaining slot
#: takes the OLDEST round-6 row in CORRECTNESS_r06 key order. After this
#: window lands green, no live contract's newest driver row is older
#: than round 6.
_PRIORITY = NEW_IN_R9 + MODIFIED_IN_R9 + [
    # the 41 round-5-row contracts, CORRECTNESS_r05 key order
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
    "join_outer_full",
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
    "train_global_shuffle",
    # oldest round-6 row, CORRECTNESS_r06 key order (1)
    "stream_python_datasource",
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
