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
    "parquet_near_storage_compute_spark.operators.typed_scan",
    "parquet_near_storage_compute_spark.operators.training",
    "parquet_near_storage_compute_spark.functions.udfs",
    "parquet_near_storage_compute_spark.sources.io",
    "parquet_near_storage_compute_spark.streaming.stream_ops",
]


#: The round-4 driver correctness window: the 18 contracts first registered
#: in round 3 (no driver row yet — the rotation debt VERDICT r3 ranks #1),
#: the 2 modified in r3 without re-confirmation (dedup_ngram_jaccard shares
#: the reworked bucket helper; mm_resize's kernel was rewritten), the 2
#: dedup contracts whose shared ``_banded_buckets`` helper changed again
#: this round (salt 16→4, level-2-only sort), the 14 new-in-r4 contracts
#: (meta_stat_prefixes, mm_image_decode, events_retention_cohorts,
#: train_bpe_pair_counts, dedup_shingle_containment,
#: stream_append_closed_windows, events_cumulative_users,
#: events_anomaly_mad, source_jsonl_scan, source_orc_scan,
#: relational_lateral_topn, udtf_tokenize, minhash_dedup_decisions,
#: pipeline_curation_report — never-checked beats re-confirmation for a
#: slot), and — filling the remaining 14 slots — the oldest-verified
#: contracts, in their CORRECTNESS_r02 order (last externally confirmed
#: two rounds ago). After this window lands green, every contract except
#: 32 r2-verified stragglers has a round-3-or-4 driver row; the
#: stragglers rotate in round 5 (exact list at the end of NOTES_r4.md).
_PRIORITY = [
    # new in r3 — first driver check (18)
    "sim_knn_join",
    "dedup_connected_components",
    "time_gap_fill",
    "events_funnel",
    "agg_histogram",
    "join_outer_full",
    "window_range_frame",
    "text_ngram_topk",
    "text_repetition_filter",
    "text_tfidf_topk",
    "text_pii_scrub",
    "train_chunk_documents",
    "train_contamination_check",
    "train_mixture_sample",
    "train_curriculum_order",
    "stream_sliding_counts",
    "source_partitioned_scan",
    "source_csv_scan",
    # modified r3, not re-confirmed (2)
    "dedup_ngram_jaccard",
    "mm_resize",
    # modified r4: shared bucket-merge helper reworked (2)
    "dedup_minhash_lsh",
    "dedup_blocked_jaccard",
    # new in r4 (14)
    "meta_stat_prefixes",
    "mm_image_decode",
    "events_retention_cohorts",
    "train_bpe_pair_counts",
    "dedup_shingle_containment",
    "stream_append_closed_windows",
    "events_cumulative_users",
    "events_anomaly_mad",
    "source_jsonl_scan",
    "source_orc_scan",
    "relational_lateral_topn",
    "udtf_tokenize",
    "minhash_dedup_decisions",
    "pipeline_curation_report",
    # oldest-verified rotation fill, CORRECTNESS_r02 order (14)
    "dedup_exact",
    "dedup_key",
    "dedup_simhash",
    "dedup_embedding_lsh",
    "sim_topk_bruteforce",
    "sim_topk_numpy",
    "sim_topk_lsh",
    "sim_topk_ivf",
    "sim_lsh_bucket_histogram",
    "sim_label_centroid",
    "text_quality_scores",
    "text_quality_filter",
    "text_language_id",
    "text_token_counts",
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
