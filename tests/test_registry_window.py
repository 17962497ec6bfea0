"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 5's window = the 32 contracts whose last driver row is from
round 2 (the rotation debt VERDICT r4 ranks #1), every contract round 5
modified or added. The must-set fills all 50 slots exactly; the overflow
(new-in-r5 only) is pinned in ``DEFERRED_TO_R6``."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    DEFERRED_TO_R6,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


#: Last externally confirmed in round 2 — the NOTES_r4 straggler list.
R2_ONLY_STRAGGLERS = {
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
}

#: Modified in round 5 (engine-exactness rewrites from the float audit,
#: the salted kNN join, single-scan composites, source cents sums, the
#: bounds-checked PPM decoder) or first registered in round 5 (WAV audio
#: decode). udaf_geomean / udf_grouped_map_zscore / pipeline_training_data
#: also changed but already sit in R2_ONLY_STRAGGLERS.
MODIFIED_OR_NEW_IN_R5 = {
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
    "stream_python_datasource",
    "time_ewma",
    "train_global_shuffle",
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
}


def test_window_is_exactly_priority():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(all_queries())[:50] == _PRIORITY


def test_window_covers_every_unconfirmed_contract():
    """Every straggler and everything modified since its last driver row
    must be in the round-5 window — except the explicitly deferred new
    contracts (the must-set outgrew the 50 slots by exactly that many)."""
    must = (R2_ONLY_STRAGGLERS | MODIFIED_OR_NEW_IN_R5) - set(DEFERRED_TO_R6)
    missing = must - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"


def test_deferred_contracts_are_new_in_r5_and_oracle_backed():
    """Deferral is only legitimate for contracts that never had a driver
    row to go stale (new this round) and that the local differential
    harness fully covers (oracle-backed)."""
    oracles = all_oracles()
    prior = set(_round_keys("CORRECTNESS_r03.json")) | set(
        _round_keys("CORRECTNESS_r04.json")
    )
    for name in DEFERRED_TO_R6:
        assert name in MODIFIED_OR_NEW_IN_R5
        assert name not in prior, f"{name} has a stale driver row — defer invalid"
        assert name in oracles
        assert name not in _PRIORITY


def test_every_registered_contract_has_a_recent_or_scheduled_row():
    """No contract may fall through the rotation: each is either in the r5
    window, explicitly deferred to r6, or carries an r3/r4 driver row and
    is unmodified since."""
    r3 = set(_round_keys("CORRECTNESS_r03.json"))
    r4 = set(_round_keys("CORRECTNESS_r04.json"))
    holes = (
        set(all_queries()) - set(_PRIORITY) - set(DEFERRED_TO_R6) - r3 - r4
    )
    assert not holes, f"contracts with no recent driver row and no window slot: {holes}"


def test_window_queries_are_oracle_backed():
    """Every window slot must have a DuckDB oracle — the full hash check,
    not the weaker rows-only gate."""
    oracles = all_oracles()
    for name in _PRIORITY:
        assert name in oracles, f"{name} has no oracle"


def test_window_outputs_are_canonicalizer_safe(spark, sf_dir):
    """The driver's pandas canonicalizer cannot hash array/map/struct cells
    (the r1 agg_collect crash) and timestamps drift schema vs DuckDB — no
    window query may emit them."""
    import pyspark.sql.types as T

    qs = all_queries()
    banned = (
        T.ArrayType,
        T.MapType,
        T.StructType,
        T.TimestampType,
        T.TimestampNTZType,
        T.BinaryType,
    )
    for name in _PRIORITY:
        df = qs[name](spark, sf_dir)
        for f in df.schema.fields:
            assert not isinstance(f.dataType, banned), (
                name,
                f.name,
                f.dataType.simpleString(),
            )
