"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 10's window (VERDICT r9 #2) = 7 new contracts + the 4
contracts round 10 modifies (the integer-cents exactness conversions), then
the oldest 39 of the 48 contracts whose newest driver row is CORRECTNESS_r06
(the stale backlog, computed from the r0*.json history — never hand-counted;
the r7 miscount is the cautionary tale), in CORRECTNESS_r06 key order. The
remaining 9 r6 rows rotate in round 11."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    MODIFIED_IN_R10,
    NEW_IN_R10,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROUND_FILES = [f"CORRECTNESS_r0{n}.json" for n in range(1, 10)]


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


def _latest_row() -> dict[str, int]:
    """contract → the latest round with a driver row (1-9)."""
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
    modified since its last driver row, must be in the round-10 window."""
    latest = _latest_row()
    never = set(all_queries()) - set(latest)
    missing = (never | set(MODIFIED_IN_R10)) - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"
    # the pinned list must BE the never-checked set — if a contract gains
    # or loses a row the pins must be updated consciously
    assert never == set(NEW_IN_R10), sorted(never ^ set(NEW_IN_R10))


def test_window_head_leads_with_unchecked_then_modified():
    """The never-checked contracts and this round's modifications occupy
    the first slots — if the driver truncates the window, the highest-value
    rows land first."""
    head = NEW_IN_R10 + MODIFIED_IN_R10
    assert _PRIORITY[: len(head)] == head


def test_backlog_slots_are_the_oldest_r6_rows_in_r06_key_order():
    """The 39 backlog slots must be exactly the OLDEST round-6-row
    contracts in CORRECTNESS_r06 key order — a stable, history-derived
    order, so the pinned list is reproducible and the 9 leftover rows
    (the newest in r6 key order) are a conscious r11 deferral."""
    latest = _latest_row()
    live = set(all_queries())
    head = set(NEW_IN_R10 + MODIFIED_IN_R10)
    backlog = [
        k
        for k in _round_keys("CORRECTNESS_r06.json")
        if latest[k] == 6 and k in live and k not in head
    ]
    assert len(backlog) == 48, len(backlog)  # computed, not hand-counted
    window_slots = [k for k in _PRIORITY if k not in head]
    assert window_slots == backlog[: len(window_slots)]
    leftover = backlog[len(window_slots):]
    assert len(leftover) == 9, leftover  # the r11 remainder


def test_every_registered_contract_has_a_row_or_a_slot():
    """No contract may fall through the rotation: each is either in the
    r10 window or carries a driver row and is unmodified since."""
    latest = _latest_row()
    holes = set(all_queries()) - set(_PRIORITY) - set(latest)
    assert not holes, f"contracts with no driver row and no window slot: {holes}"


def test_window_queries_are_oracle_backed():
    """Every window slot must have a DuckDB oracle — the full hash check,
    not the weaker rows-only gate."""
    oracles = all_oracles()
    for name in _PRIORITY:
        assert name in oracles, f"{name} has no oracle"
