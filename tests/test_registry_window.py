"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 12's window (VERDICT r11 #1) = 7 new contracts
(`stream_minhash_ingest`, `sim_mmr_select`, and the continuation session's
`text_dedup_scrub` + `train_dsir_resample` + `events_pagerank` +
`train_drift_psi` + `time_holt_trend`) + 2 modified
(`time_downsample_lttb`'s decimal triangle-area products and
`train_bpe_merges`' shared `_bpe_trained` loop invalidate their r11 rows),
then ALL 6 contracts whose newest driver row is CORRECTNESS_r07 (closing the
r7 backlog) and the oldest 35 of the 46 whose newest row is CORRECTNESS_r08 —
both computed from the r0*.json history (never hand-counted; the r7 miscount
is the cautionary tale), in round-file key order. The 11 leftover r8 rows
rotate in round 13."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    MODIFIED_IN_R12,
    NEW_IN_R12,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROUND_FILES = [f"CORRECTNESS_r{n:02d}.json" for n in range(1, 12)]


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


def _latest_row() -> dict[str, int]:
    """contract → the latest round with a driver row (1-11)."""
    latest: dict[str, int] = {}
    for rn, fname in enumerate(_ROUND_FILES, start=1):
        for k in _round_keys(fname):
            latest[k] = rn
    return latest


def test_window_is_exactly_priority():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(all_queries())[:50] == _PRIORITY


def test_window_covers_every_unconfirmed_contract():
    """Every contract with no driver row in any round, and everything
    modified since its last driver row, must be in the round-12 window."""
    latest = _latest_row()
    never = set(all_queries()) - set(latest)
    missing = (never | set(MODIFIED_IN_R12)) - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"
    # the pinned list must BE the never-checked set — if a contract gains
    # or loses a row the pins must be updated consciously
    assert never == set(NEW_IN_R12), sorted(never ^ set(NEW_IN_R12))


def test_window_head_leads_with_unchecked_then_modified():
    """The never-checked contracts and this round's modifications occupy
    the first slots — if the driver truncates the window, the highest-value
    rows land first."""
    head = NEW_IN_R12 + MODIFIED_IN_R12
    assert _PRIORITY[: len(head)] == head


def test_backlog_slots_are_the_stalest_rows_in_round_key_order():
    """The 46 backlog slots must be exactly: every remaining r7-row
    contract (6 — the backlog closes this round) in CORRECTNESS_r07 key
    order, then the OLDEST r8-row contracts in CORRECTNESS_r08 key order —
    a stable, history-derived order, so the pinned list is reproducible
    and the 11 leftover r8 rows are a conscious r13 deferral."""
    latest = _latest_row()
    live = set(all_queries())
    head = set(NEW_IN_R12 + MODIFIED_IN_R12)
    backlog_r7 = [
        k
        for k in _round_keys("CORRECTNESS_r07.json")
        if latest[k] == 7 and k in live and k not in head
    ]
    backlog_r8 = [
        k
        for k in _round_keys("CORRECTNESS_r08.json")
        if latest[k] == 8 and k in live and k not in head
    ]
    assert len(backlog_r7) == 6, backlog_r7  # computed, not hand-counted
    assert len(backlog_r8) == 46, len(backlog_r8)
    window_slots = [k for k in _PRIORITY if k not in head]
    backlog = backlog_r7 + backlog_r8
    assert window_slots == backlog[: len(window_slots)]
    leftover = backlog[len(window_slots):]
    assert len(leftover) == 11, leftover  # the r13 remainder


def test_every_registered_contract_has_a_row_or_a_slot():
    """No contract may fall through the rotation: each is either in the
    r12 window or carries a driver row and is unmodified since."""
    latest = _latest_row()
    holes = set(all_queries()) - set(_PRIORITY) - set(latest)
    assert not holes, f"contracts with no driver row and no window slot: {holes}"


def test_window_queries_are_oracle_backed():
    """Every window slot must have a DuckDB oracle — the full hash check,
    not the weaker rows-only gate."""
    oracles = all_oracles()
    for name in _PRIORITY:
        assert name in oracles, f"{name} has no oracle"
