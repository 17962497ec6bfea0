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

Round 10's window (VERDICT r9 #2): 5 new contracts
(`dedup_minhash_calibration`, the signature-agreement vs exact-Jaccard
calibration table; `text_ngram_novelty`, the per-doc novel-trigram
report; `time_resample_interpolate`, regular-grid linear-interpolation
resampling; `train_interleave_datasets`, the deterministic stride-
schedule mixture order; `dedup_minhash_band_tuning`, the banding-config
S-curve table; `sim_recall_report`, ANN recall@k evaluation as an
operator; `text_char_entropy`, the character-entropy quality signal) +
4 modified (the integer-cents exactness conversions, VERDICT r9 #6)
lead, then the oldest **39** of the 48 contracts whose newest driver
row is CORRECTNESS_r06, in CORRECTNESS_r06 key order (computed from the
r0*.json history exactly as tests/test_registry_window.py does — never
hand-counted). The remaining 9 r6 rows (`agg_pricing_summary`,
`agg_over_expression`, `agg_distinct`, `agg_rollup`, `agg_cube`,
`agg_grouping_sets`, `join_range`, `join_asof`, `join_window_pct` —
last in r6 key order) rotate in round 11 (one past VERDICT r9 #2's
"≤ ~8" guide — the trade for three extra new operators landing driver
rows this round).
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


#: New in round 10 — enter the window immediately:
#: dedup_minhash_calibration: the MinHash estimator calibration table —
#: per (signature-agreement count, exact Jaccard decile) candidate-pair
#: counts, the artifact an operator reads to size the signature before
#: trusting it (all-integer cells, one extra corpus aggregation);
#: text_ngram_novelty: per-doc novel-trigram report (grams appearing in
#: no other doc, exact integer per-mille) — the informativeness /
#: memorization-risk signal next to the duplicate-fraction family;
#: time_resample_interpolate: per-user regular-grid linear interpolation
#: (integer milli-unit algebra — the align-before-correlate step next to
#: gap_fill/EWMA/OHLC); train_interleave_datasets: the deterministic
#: stride-schedule mixture order a multi-source training loader feeds
#: (two global_positions passes, never a per-source corpus window).
#: dedup_minhash_band_tuning: the banding-config S-curve table (observed
#: candidate counts per tightening config × decile next to the exact-
#: integer theoretical curve) — calibration's "trust the signature"
#: companion answering "which banding to run".
#: sim_recall_report: recall@k of every quantized ANN variant vs the
#: exact baseline, as one oracle-checked report (integer per-mille) —
#: the evaluate leg of build → tune → evaluate.
#: text_char_entropy: per-doc character-entropy quality signal (integer
#: fixed-point — the fourth quality rung beside heuristics, classifier,
#: and LM perplexity).
NEW_IN_R10 = [
    "dedup_minhash_calibration",
    "text_ngram_novelty",
    "time_resample_interpolate",
    "train_interleave_datasets",
    "dedup_minhash_band_tuning",
    "sim_recall_report",
    "text_char_entropy",
]

#: Contracts round 10 modifies that already carry driver rows — the
#: change invalidates the old row, so they re-enter the window: the four
#: money-typed members of the former float-ulp drift set (VERDICT r9 #6)
#: now sum integer CENTS (2-decimal money columns) with one
#: exactly-determined /100.0 at the end — bit-exact vs DuckDB where the
#: old double sums drifted ~1e-16 with the engines' accumulation order.
MODIFIED_IN_R10 = [
    "window_running_total",
    "time_sessionize",
    "time_session_window_native",
    "stream_stateful_user_stats",
]

#: The round-10 driver correctness window (VERDICT r9 #2): the 7 new + 4
#: modified contracts lead; then the oldest 39 of the 48 contracts whose
#: newest driver row is CORRECTNESS_r06, in CORRECTNESS_r06 key order.
#: The remaining 9 r6 rows (agg_pricing_summary / agg_over_expression /
#: agg_distinct / agg_rollup / agg_cube / agg_grouping_sets / join_range
#: / join_asof / join_window_pct) rotate in round 11, after which no
#: live contract's newest driver row is older than round 7.
_PRIORITY = NEW_IN_R10 + MODIFIED_IN_R10 + [
    # the oldest 39 round-6-row contracts, CORRECTNESS_r06 key order
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
    "time_ewma",
    "text_fingerprint",
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
