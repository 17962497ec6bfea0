"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 3's window = the 48 contracts without a round-2 row (r1-era
core + train_/stream_/kmeans) + 2 re-confirmation slots for dedup contracts
modified this round."""

from __future__ import annotations

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    all_oracles,
    all_queries,
)


def test_window_is_exactly_priority():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(all_queries())[:50] == _PRIORITY


#: Contracts first registered in round 3, after the window was pinned: they
#: cannot have an r2 row and do not displace the rotation debt the window
#: retires. They are fully covered by the local differential suite this
#: round and rotate into round 4's spare slots for driver confirmation.
NEW_IN_R3 = {
    "dedup_connected_components",
    "train_chunk_documents",
    "train_contamination_check",
    "text_ngram_topk",
    "agg_histogram",
    "source_partitioned_scan",
    "sim_knn_join",
    "time_gap_fill",
    "text_repetition_filter",
    "train_mixture_sample",
    "events_funnel",
    "train_curriculum_order",
    "text_tfidf_topk",
    "source_csv_scan",
    "stream_sliding_counts",
    "join_outer_full",
    "text_pii_scrub",
    "window_range_frame",
}


def test_window_covers_unrotated_core():
    """Everything that had no CORRECTNESS_r02 row must be in the r3 window —
    after this round, every registered contract has a driver row from the
    last two rounds."""
    r2_window = {
        "dedup_exact", "dedup_key", "dedup_minhash_lsh", "dedup_ngram_jaccard",
        "dedup_blocked_jaccard", "dedup_simhash", "dedup_embedding_lsh",
        "sim_topk_bruteforce", "sim_topk_numpy", "sim_topk_lsh", "sim_topk_ivf",
        "sim_lsh_bucket_histogram", "sim_label_centroid",
        "text_quality_scores", "text_quality_filter", "text_language_id",
        "text_token_counts", "text_fingerprint",
        "mm_feature_extract", "mm_binary_metadata", "mm_frame_sample",
        "mm_resize",
        "time_tumbling_hourly", "time_sliding_window", "time_sessionize",
        "time_session_window_native", "time_json_extract",
        "time_datetime_parts",
        "relational_correlated_subquery", "relational_pivot",
        "relational_unpivot", "relational_distinct_rows", "sort_limit_topk",
        "setop_union_all", "setop_intersect", "setop_except",
        "scalar_case_bucket", "scalar_arithmetic_chain",
        "pipeline_training_data", "scalar_array_ops", "scalar_string_ops",
        "udf_readability", "udf_sql_surface", "udaf_geomean",
        "udf_grouped_map_zscore", "source_glob_scan",
        "agg_reaggregate", "agg_collect", "agg_approx_distinct",
        "types_unsigned_decimal",
    }
    registered = set(all_queries())
    in_window = set(_PRIORITY)
    unrotated = registered - r2_window - NEW_IN_R3
    for name in unrotated:
        assert name in in_window, f"{name} has no r2 row and is outside the window"


def test_window_queries_are_oracle_backed():
    """Every window slot must have a DuckDB oracle — the full hash check,
    not the weaker rows-only gate. (iter_kmeans_lite gained its unrolled
    Lloyd oracle in round 3, so the whole window hashes.)"""
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
