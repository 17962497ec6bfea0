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

Round 9's window (VERDICT r8 #2) was 3 new + 5 modified + all 41 r5-row
contracts + 1 r6 fill — 50/50 green (CORRECTNESS_r09), so after it the
stalest live rows are the 48 round-6 rows.

Round 10's window (VERDICT r9 #2) was 7 new contracts + 4 modified (the
integer-cents exactness conversions) + the oldest 39 of the 48 r6-row
contracts — 50/50 green (CORRECTNESS_r10), leaving staleness
{r6: 9, r7: 42, r8: 46, r9: 48, r10: 50}.

Round 11's window (VERDICT r10 #3): 4 new contracts
(`train_token_fertility`, the per-(lang, source) BPE fertility /
bytes-per-token table; `train_context_length_fit`, the per-context-length
truncation/padding planning table; `dedup_cluster_size_histogram`, the
duplicate-cluster size distribution with exact corpus partition;
`time_downsample_lttb`, fixed-bucket LTTB plot downsampling in exact
integer areas) + 1
modified (`text_char_entropy` — its char iterator moved from the O(len²)
``explode(sequence)+substr`` pair to one ``split(text, '')`` pass,
VERDICT r10 #2, so its r10 row is invalidated) lead; then the LAST 9
r6-row contracts (closing the r6 backlog entirely) and the oldest 36 of
the 42 contracts whose newest driver row is CORRECTNESS_r07, both in
their round-file key order (computed from the r0*.json history exactly
as tests/test_registry_window.py does — never hand-counted). The 6
leftover r7 rows rotate in round 12; after this round no live contract's
newest driver row is older than round 7.
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


#: New in round 11 — enter the window immediately:
#: train_token_fertility: per (lang, source) bucket, what the trained BPE
#: does to that corpus slice — tokens-per-word (fertility) and
#: bytes-per-token as exact integer per-mille on bucket TOTALS — the
#: table a pipeline reads before committing a tokenizer to a mixture;
#: train_context_length_fit: per candidate context length, the exact
#: truncation / padding / utilization cost of the one-doc-per-sequence
#: layout — the context-length planning table;
#: dedup_cluster_size_histogram: duplicate-cluster size distribution
#: (clusters / docs / docs-removed per size, singletons included so
#: Σ n_docs partitions the corpus) — the audit artifact that catches a
#: wrong LSH threshold before it deletes a third of the corpus.
#: time_downsample_lttb: largest-triangle-three-buckets plot
#: downsampling (fixed-bucket centroid variant) — one spike-preserving
#: representative point per (user, 6h bucket), exact-integer triangle
#: areas, completing the downsampling family next to OHLC/resample.
NEW_IN_R11 = [
    "train_token_fertility",
    "train_context_length_fit",
    "dedup_cluster_size_histogram",
    "time_downsample_lttb",
]

#: Contracts round 11 modifies that already carry driver rows — the
#: change invalidates the old row, so they re-enter the window:
#: text_char_entropy's char iterator moved from the O(len²)
#: ``explode(sequence(1, length)) + substr(text, i, 1)`` pair to one
#: linear ``split(text, '')`` pass (VERDICT r10 #2); the fixed-point
#: entropy algebra is unchanged.
MODIFIED_IN_R11 = [
    "text_char_entropy",
]

#: The round-11 driver correctness window (VERDICT r10 #3): the 4 new +
#: 1 modified contracts lead; then the LAST 9 round-6-row contracts
#: (closing the r6 backlog) and the oldest 36 of the 42 round-7-row
#: contracts, each cohort in its round-file key order. The 6 leftover r7
#: rows rotate in round 12.
_PRIORITY = NEW_IN_R11 + MODIFIED_IN_R11 + [
    # the remaining 9 round-6-row contracts, CORRECTNESS_r06 key order
    "join_window_pct",
    "join_asof",
    "join_range",
    "agg_pricing_summary",
    "agg_over_expression",
    "agg_distinct",
    "agg_rollup",
    "agg_cube",
    "agg_grouping_sets",
    # the oldest 36 round-7-row contracts, CORRECTNESS_r07 key order
    "text_quality_classifier",
    "train_quality_resample",
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "dedup_video_fingerprint",
    "pipeline_modality_dedup_report",
    "sim_topk_sq8",
    "sim_topk_ivf_sq8",
    "stream_phash_ingest",
    "mm_decode_quarantine",
    "text_lm_perplexity",
    "train_bpe_merges",
    "sim_topk_ivf_mp",
    "train_bpe_encode",
    "text_duplicate_window_fraction",
    "sim_topk_prefix_rerank",
    "train_uniform_sample",
    "sim_knn_join",
    "sim_range_search",
    "agg_min_max_by",
    "agg_percentile",
    "agg_stats",
    "iter_kmeans_lite",
    "stream_dedup_exact",
    "stream_stream_join",
    "stream_windowed_counts",
    "train_profile_columns",
    "train_stratified_sample",
    "train_test_split",
    "window_first_last_nth",
    "window_lag_lead",
    "window_mode_per_group",
    "window_moving_sum",
    "window_ntile",
    "window_percent_rank_cume",
    "window_rank_dense_rank",
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
