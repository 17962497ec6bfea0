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

Round 8's window (VERDICT r7 #1): 3 new contracts + 5 modified lead, then
ALL **37** contracts whose newest driver row is CORRECTNESS_r04 (the r7
docstring undercounted this backlog as 16 — the correct list is computed
from the r0*.json history exactly as tests/test_registry_window.py does,
and the window retires it in full), then the 5 oldest round-5 rows in
CORRECTNESS_r05 key order as fill. After this window lands green, no live
contract's newest driver row is older than round 5.
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


#: New in round 8 — three composition operators over verified machinery,
#: never driver-checked, enter the window immediately:
#: text_dedup_trim (VERDICT r7 #7): the action half of
#: text_duplicate_window_fraction's Lee-et-al measurement — keep the doc,
#: excise the corpus-duplicated windows, with before/after token
#: accounting and a member-level kept-text md5 oracle;
#: train_decontaminate_trim: the action half of train_contamination_check
#: — excise eval-set CONTAM_NGRAM overlaps from train docs (existence
#: semi-join, no fan-out, no rare cap) with the same trim algebra;
#: dedup_keep_best: cluster-level canonical selection — the CC label
#: frame + a quality argmax (n_chars desc, doc_id asc) so each near-dup
#: cluster keeps its best member, not the arbitrary min id.
NEW_IN_R8 = [
    "text_dedup_trim",
    "train_decontaminate_trim",
    "dedup_keep_best",
]

#: Contracts round 8 modifies that already carry driver rows — the change
#: invalidates the old row, so they re-enter the window:
#: sim_topk_pq / sim_topk_ivf_pq gain TRAINED codebooks (VERDICT r7 #3:
#: PQ_ITERS Lloyd rounds on the lattice seed, integer-exact, recall beats
#: the untrained lattice at every SF — tools/pq_train_sweep.py);
#: dedup_semantic_clusters gains the zero-norm eps guard on both engines
#: (ADVICE r7: 0/0 = NaN ordered differently by Spark and DuckDB);
#: train_pack_bpe / train_pack_sequences oracles switch to DuckDB integer
#: division for bin_id (ADVICE r7: double FLOOR could round differently
#: past 2^53).
MODIFIED_IN_R8 = [
    "sim_topk_pq",
    "sim_topk_ivf_pq",
    "dedup_semantic_clusters",
    "train_pack_bpe",
    "train_pack_sequences",
]

#: The round-8 driver correctness window (VERDICT r7 #1): the 3 new + 5
#: modified contracts lead; then all 37 contracts whose newest driver row
#: is CORRECTNESS_r04 (alphabetical); the remaining 5 slots take the
#: OLDEST round-5 rows in CORRECTNESS_r05 key order. After this window
#: lands green, no live contract's newest driver row is older than
#: round 5.
_PRIORITY = NEW_IN_R8 + MODIFIED_IN_R8 + [
    # the 37 round-4-row contracts, alphabetical
    "dedup_blocked_jaccard",
    "dedup_embedding_lsh",
    "dedup_exact",
    "dedup_key",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_shingle_containment",
    "dedup_simhash",
    "events_anomaly_mad",
    "events_cumulative_users",
    "events_retention_cohorts",
    "minhash_dedup_decisions",
    "mm_resize",
    "relational_lateral_topn",
    "sim_label_centroid",
    "sim_lsh_bucket_histogram",
    "sim_topk_bruteforce",
    "sim_topk_ivf",
    "sim_topk_lsh",
    "sim_topk_numpy",
    "source_csv_scan",
    "source_partitioned_scan",
    "stream_append_closed_windows",
    "stream_sliding_counts",
    "text_language_id",
    "text_pii_scrub",
    "text_quality_filter",
    "text_quality_scores",
    "text_repetition_filter",
    "text_tfidf_topk",
    "text_token_counts",
    "train_bpe_pair_counts",
    "train_chunk_documents",
    "train_contamination_check",
    "train_curriculum_order",
    "train_mixture_sample",
    "udtf_tokenize",
    # oldest round-5 rows, CORRECTNESS_r05 key order (5)
    "agg_approx_distinct",
    "agg_collect",
    "agg_reaggregate",
    "mm_binary_metadata",
    "mm_feature_extract",
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
