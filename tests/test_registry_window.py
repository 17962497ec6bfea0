"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 13's window (VERDICT r12 #8; an optimization round, so no
NEW contracts) = the 5 contracts whose r13 plan restructures invalidate
their green driver rows (`train_bpe_merges` / `events_pagerank` /
`sim_mmr_select` — single-partition literal frames; `text_dedup_trim` /
`train_decontaminate_trim` — the trim flag frame's redundant distinct
removed), then ALL 11
contracts whose newest driver row is CORRECTNESS_r08 (closing the r8
backlog) and the oldest 34 of the 47 whose newest row is CORRECTNESS_r09 —
both computed from the r0*.json history (never hand-counted; the r7
miscount is the cautionary tale), in round-file key order. The 13 leftover
r9 rows rotate in round 14."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    MODIFIED_IN_R13,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROUND_FILES = [f"CORRECTNESS_r{n:02d}.json" for n in range(1, 13)]


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


def _latest_row() -> dict[str, int]:
    """contract → the latest round with a driver row (1-12)."""
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
    modified since its last driver row, must be in the round-13 window."""
    latest = _latest_row()
    never = set(all_queries()) - set(latest)
    missing = (never | set(MODIFIED_IN_R13)) - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"
    # an optimization round declares no new contracts — every registered
    # contract must already carry a driver row
    assert not never, sorted(never)


def test_window_head_leads_with_modified():
    """This round's restructured contracts occupy the first slots — if the
    driver truncates the window, the highest-value rows land first."""
    assert _PRIORITY[: len(MODIFIED_IN_R13)] == MODIFIED_IN_R13


def test_backlog_slots_are_the_stalest_rows_in_round_key_order():
    """The 45 backlog slots must be exactly: every remaining r8-row
    contract (11 — the backlog closes this round) in CORRECTNESS_r08 key
    order, then the OLDEST r9-row contracts in CORRECTNESS_r09 key order —
    a stable, history-derived order, so the pinned list is reproducible
    and the 13 leftover r9 rows are a conscious r14 deferral."""
    latest = _latest_row()
    live = set(all_queries())
    head = set(MODIFIED_IN_R13)
    backlog_r8 = [
        k
        for k in _round_keys("CORRECTNESS_r08.json")
        if latest[k] == 8 and k in live and k not in head
    ]
    backlog_r9 = [
        k
        for k in _round_keys("CORRECTNESS_r09.json")
        if latest[k] == 9 and k in live and k not in head
    ]
    assert len(backlog_r8) == 11, backlog_r8  # computed, not hand-counted
    assert len(backlog_r9) == 47, len(backlog_r9)
    window_slots = [k for k in _PRIORITY if k not in head]
    backlog = backlog_r8 + backlog_r9
    assert window_slots == backlog[: len(window_slots)]
    leftover = backlog[len(window_slots):]
    assert len(leftover) == 13, leftover  # the r14 remainder


def test_every_registered_contract_has_a_row_or_a_slot():
    """No contract may fall through the rotation: each is either in the
    r13 window or carries a driver row and is unmodified since."""
    latest = _latest_row()
    holes = set(all_queries()) - set(_PRIORITY) - set(latest)
    assert not holes, f"contracts with no driver row and no window slot: {holes}"


def test_window_queries_are_oracle_backed():
    """Every window slot must have a DuckDB oracle — the full hash check,
    not the weaker rows-only gate."""
    oracles = all_oracles()
    for name in _PRIORITY:
        assert name in oracles, f"{name} has no oracle"
