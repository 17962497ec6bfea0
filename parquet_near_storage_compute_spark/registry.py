"""Central query registry: every operator from SURVEY.md §2 + extensions.

Each operator module exposes ``QUERIES`` (name → callable(spark, sf_dir) →
DataFrame) and ``ORACLE_SQL`` (name → DuckDB-runnable ANSI SQL). This module
merges them for ``__spark_entry__.py``. Names must be unique across modules;
a collision raises at import time so it can't silently shadow coverage.

Ordering matters: the driver's correctness gate checks the FIRST 50 keys in
iteration order. Round 1 verified the core v1/snowset/join/agg/window surface
(CORRECTNESS_r01.json, 47/50 green); round 2 rotates the window so the 50
extension operators (dedup/similarity/text/multimodal/timeseries/relational/
pipeline/scalar/udf/source) plus the three round-1 fixes lead. ``_PRIORITY``
pins that window explicitly; everything else follows in module order so the
window can rotate again in later rounds without code churn elsewhere.
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


#: The round-2 driver correctness window: exactly the 50 queries that had no
#: CORRECTNESS_r01 row (the extension surface, minus the demoted quadratic
#: dedup_embedding baseline) plus the three contracts fixed this round
#: (agg_reaggregate hash fail, agg_collect harness crash, agg_approx_distinct
#: no-oracle slot). Everything outside rotates back in a later round.
_PRIORITY = [
    # dedup (7)
    "dedup_exact",
    "dedup_key",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_blocked_jaccard",
    "dedup_simhash",
    "dedup_embedding_lsh",
    # similarity (6)
    "sim_topk_bruteforce",
    "sim_topk_numpy",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_lsh_bucket_histogram",
    "sim_label_centroid",
    # text analysis (5)
    "text_quality_scores",
    "text_quality_filter",
    "text_language_id",
    "text_token_counts",
    "text_fingerprint",
    # multimodal (4)
    "mm_feature_extract",
    "mm_binary_metadata",
    "mm_frame_sample",
    "mm_resize",
    # timeseries (6)
    "time_tumbling_hourly",
    "time_sliding_window",
    "time_sessionize",
    "time_session_window_native",
    "time_json_extract",
    "time_datetime_parts",
    # relational / setops / sort / scalar-case (10)
    "relational_correlated_subquery",
    "relational_pivot",
    "relational_unpivot",
    "relational_distinct_rows",
    "sort_limit_topk",
    "setop_union_all",
    "setop_intersect",
    "setop_except",
    "scalar_case_bucket",
    "scalar_arithmetic_chain",
    # composite pipeline (1)
    "pipeline_training_data",
    # scalar function clusters (2)
    "scalar_array_ops",
    "scalar_string_ops",
    # pandas/Arrow UDF surface (4)
    "udf_readability",
    "udf_sql_surface",
    "udaf_geomean",
    "udf_grouped_map_zscore",
    # glob source (1)
    "source_glob_scan",
    # round-1 correctness fixes (3)
    "agg_reaggregate",
    "agg_collect",
    "agg_approx_distinct",
    # unsigned/decimal physical types (1)
    "types_unsigned_decimal",
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
