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
r5-third-session contracts + 3 modified + the 25 oldest r3 rows — all 50/50
green, leaving 161 of 163 contracts driver-confirmed. Round 7's window
(VERDICT r6 #1): the 2 deferred r6 contracts + 19 new + 3 modified lead,
then the 21 remaining r3-row contracts, then the oldest r4 rows as fill.
After this window lands green, no live contract is unchecked and only
sixteen driver rows (dedup_blocked_jaccard, dedup_minhash_lsh,
dedup_ngram_jaccard, events_retention_cohorts, mm_resize,
source_csv_scan, source_partitioned_scan, stream_sliding_counts,
text_pii_scrub, text_repetition_filter, text_tfidf_topk,
train_bpe_pair_counts, train_chunk_documents,
train_contamination_check, train_curriculum_order,
train_mixture_sample — bumped by the window's fixed 50 slots) are
staler than round 5.
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


#: New in round 6, deliberately NOT in the round-6 window (it was fully
#: booked by the 22 never-checked + 3 modified + 26 stalest rows): the
#: model-based quality scoring / resampling pair. Locally oracle-verified
#: every test run (tests/test_registry_oracle.py); they lead the round-7
#: window (VERDICT r6 #1).
DEFERRED_TO_R7 = [
    "text_quality_classifier",
    "train_quality_resample",
]

#: New in round 7: DCT perceptual-hash image dedup (VERDICT r6 #3), its
#: audio sibling (spectral-fingerprint dedup), the video sibling
#: (sampled-frame pHash SIGNATURES — the fifth modality, completing the
#: near-dup matrix), the cross-modality dedup report composite that
#: re-verifies all five decision pipelines through one hash, and the int8
#: scalar-quantized top-k (SQ8 flat scan — integer scoring, bit-exact
#: oracle) plus its IVF composition and the streaming perceptual-ingest
#: bridge (sequential recursive-CTE oracle), the decode-quarantine
#: robustness contract, the SemDeDup-style semantic dedup
#: (cluster-bounded embedding dedup — the curation op the literal/
#: near-literal dedup ladder can't express) and the product-quantized
#: ANN (ADC scoring, integer-exact oracle); session 4 adds the IVF-PQ
#: composition (coarse cell bounds WHAT is scanned, PQ codes bound the
#: bandwidth of scanning it), the bigram-LM perplexity quality filter
#: (the CCNet recipe, fixed-point integer keep gate) and the full BPE
#: merge loop (the tokenizer-trainer artifact;
#: ``train_bpe_pair_counts`` is its round 1), the multiprobe IVF
#: variant (nprobe — THE deployed recall/latency dial) and the BPE
#: encode pass (the trained merges applied back to the corpus; closes
#: the tokenizer loop) — never driver-checked, enter the window
#: immediately.
NEW_IN_R7 = [
    "dedup_image_phash",
    "dedup_audio_fingerprint",
    "dedup_video_fingerprint",
    "pipeline_modality_dedup_report",
    "sim_topk_sq8",
    "sim_topk_ivf_sq8",
    "stream_phash_ingest",
    "mm_decode_quarantine",
    "dedup_semantic_clusters",
    "sim_topk_pq",
    "sim_topk_ivf_pq",
    "text_lm_perplexity",
    "train_bpe_merges",
    "sim_topk_ivf_mp",
    "train_bpe_encode",
    "text_duplicate_window_fraction",
    "sim_topk_prefix_rerank",
    "train_pack_bpe",
    "train_uniform_sample",
]

#: Contracts round 7 modifies that already carry driver rows — the change
#: invalidates the old row, so they re-enter the window:
#: sim_knn_join's oracle gains the own-group duplicate candidate branch
#: (ADVICE r6: Spark and oracle diverged in the over-cap pilot regime);
#: sim_range_search and dedup_connected_components drop their terminal
#: presentational global sorts (VERDICT r6 #2 — plan shape only, but a
#: contract change is a contract change).
MODIFIED_IN_R7 = [
    "sim_knn_join",
    "sim_range_search",
    "dedup_connected_components",
]

#: The round-7 driver correctness window (VERDICT r6 #1): the 2 deferred
#: r6 contracts + 19 new + 3 modified lead; then every contract still on
#: a round-3 driver row (21 — window_*, stream_* ×4, train_* ×4,
#: iter_kmeans_lite, agg_min_max_by, agg_stats, agg_percentile); the
#: remaining 5 slots take the OLDEST round-4 rows in CORRECTNESS_r04 key
#: order. After this window lands green, no live contract is unchecked
#: and only sixteen driver rows (dedup_blocked_jaccard,
#: dedup_minhash_lsh, dedup_ngram_jaccard, events_retention_cohorts,
#: mm_resize, source_csv_scan, source_partitioned_scan,
#: stream_sliding_counts, text_pii_scrub, text_repetition_filter,
#: text_tfidf_topk, train_bpe_pair_counts, train_chunk_documents,
#: train_contamination_check, train_curriculum_order,
#: train_mixture_sample) are older than round 5 — they lost their slots
#: to the r7 session-2/3/4 contracts (never-checked beats stale-r4) and
#: lead the r8 rotation.
_PRIORITY = DEFERRED_TO_R7 + NEW_IN_R7 + MODIFIED_IN_R7 + [
    # the 21 round-3-row contracts, alphabetical
    "agg_min_max_by",
    "agg_percentile",
    "agg_stats",
    "iter_kmeans_lite",
    "stream_dedup_exact",
    "stream_stateful_user_stats",
    "stream_stream_join",
    "stream_windowed_counts",
    "train_pack_sequences",
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
    "window_running_total",
    "window_topk_per_group",
    # oldest round-4 rows, CORRECTNESS_r04 key order (5)
    "time_gap_fill",
    "events_funnel",
    "agg_histogram",
    "window_range_frame",
    "text_ngram_topk",
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
