"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 4's window = every contract without a round-3 driver row
that is new or was modified since its last row (18 new-in-r3 + 2 modified-r3
+ 2 modified-r4 + 14 new-in-r4), padded with the oldest-verified contracts
(the CORRECTNESS_r02 window, in its original order)."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


#: Contracts first registered in round 3 — no driver row before round 4.
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

#: Modified in round 3 after the r3 window was pinned (shared bucket helper
#: / rewritten resize kernel) — r2 rows exist but predate the change.
MODIFIED_R3_UNCONFIRMED = {"dedup_ngram_jaccard", "mm_resize"}

#: Modified in round 4: ``_banded_buckets`` reworked (salt 16→4, level-2-
#: only sort, dedicated min_id) — their r3 rows predate the change.
#: (train_contamination_check and text_pii_scrub also changed in r4 but
#: already sit in NEW_IN_R3.)
MODIFIED_IN_R4 = {"dedup_minhash_lsh", "dedup_blocked_jaccard"}

#: First registered in round 4.
NEW_IN_R4 = {
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
}


def test_window_is_exactly_priority():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(all_queries())[:50] == _PRIORITY


def test_window_covers_every_unconfirmed_contract():
    """Everything new or modified since its last driver row must be in the
    round-4 window."""
    must = NEW_IN_R3 | MODIFIED_R3_UNCONFIRMED | MODIFIED_IN_R4 | NEW_IN_R4
    missing = must - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"


def test_fill_slots_are_oldest_verified_r2_contracts():
    """The non-mandatory slots must be drawn from the CORRECTNESS_r02 window
    (last confirmed two rounds ago) in its original order — the rotation
    rule VERDICT r3 endorses."""
    must = NEW_IN_R3 | MODIFIED_R3_UNCONFIRMED | MODIFIED_IN_R4 | NEW_IN_R4
    fill = [n for n in _PRIORITY if n not in must]
    r2 = [n for n in _round_keys("CORRECTNESS_r02.json") if n not in must]
    assert fill == r2[: len(fill)]


def test_every_registered_contract_has_a_recent_or_scheduled_row():
    """No contract may fall through the rotation: each is either in the r4
    window, or carries an r2/r3 driver row and is unmodified since."""
    r2 = set(_round_keys("CORRECTNESS_r02.json"))
    r3 = set(_round_keys("CORRECTNESS_r03.json"))
    holes = set(all_queries()) - set(_PRIORITY) - r2 - r3
    assert not holes, f"contracts with no driver row and no window slot: {holes}"


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
