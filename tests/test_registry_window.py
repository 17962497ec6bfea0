"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 9's window (VERDICT r8 #2) = 3 new contracts + the 5
contracts round 9 modifies, then ALL 41 contracts whose newest driver row
is CORRECTNESS_r05 (the stale backlog, computed from the r0*.json history —
never hand-counted; the r7 miscount is the cautionary tale), then the
oldest round-6 row as fill (1). After this window lands green, no live
contract's newest driver row is older than round 6."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    MODIFIED_IN_R9,
    NEW_IN_R9,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROUND_FILES = [f"CORRECTNESS_r0{n}.json" for n in range(1, 9)]


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


def _latest_row() -> dict[str, int]:
    """contract → the latest round with a driver row (1-8)."""
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
    modified since its last driver row, must be in the round-9 window."""
    latest = _latest_row()
    never = set(all_queries()) - set(latest)
    missing = (never | set(MODIFIED_IN_R9)) - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"
    # the pinned list must BE the never-checked set — if a contract gains
    # or loses a row the pins must be updated consciously
    assert never == set(NEW_IN_R9), sorted(never ^ set(NEW_IN_R9))


def test_window_head_leads_with_unchecked_then_modified():
    """The never-checked contracts and this round's modifications occupy
    the first slots — if the driver truncates the window, the highest-value
    rows land first."""
    head = NEW_IN_R9 + MODIFIED_IN_R9
    assert _PRIORITY[: len(head)] == head


def test_every_r5_row_contract_is_in_the_window():
    """VERDICT r8 #2's done-criterion: the FULL 41-contract r5 backlog
    holds slots — no driver row older than round 6 once this window
    lands."""
    latest = _latest_row()
    live = set(all_queries())
    r5 = {k for k, v in latest.items() if v == 5 and k in live}
    assert len(r5) == 41, len(r5)  # computed from history, not hand-counted
    missing = r5 - set(_PRIORITY)
    assert not missing, f"r5-row contracts left out of the window: {missing}"


def test_r5_slots_follow_correctness_r05_key_order():
    """The backlog slots rotate in CORRECTNESS_r05 key order — a stable,
    history-derived order, so the pinned list is reproducible."""
    latest = _latest_row()
    live = set(all_queries())
    head = set(NEW_IN_R9 + MODIFIED_IN_R9)
    expected = [
        k
        for k in _round_keys("CORRECTNESS_r05.json")
        if latest[k] == 5 and k in live and k not in head
    ]
    in_window = [k for k in _PRIORITY if k in set(expected)]
    assert in_window == expected


def test_fill_slots_are_the_oldest_r6_rows():
    """The remaining slots must rotate the STALEST remaining driver rows:
    contracts whose latest row is round 6, in CORRECTNESS_r06 key order."""
    latest = _latest_row()
    live = set(all_queries())
    head = set(NEW_IN_R9 + MODIFIED_IN_R9)
    r5 = {k for k, v in latest.items() if v == 5 and k in live}
    expected_fill = [
        k
        for k in _round_keys("CORRECTNESS_r06.json")
        if latest[k] == 6 and k in live and k not in head and k not in r5
    ]
    fill = [k for k in _PRIORITY if k not in head and k not in r5]
    assert fill == expected_fill[: len(fill)]


def test_every_registered_contract_has_a_row_or_a_slot():
    """No contract may fall through the rotation: each is either in the r9
    window or carries a driver row and is unmodified since."""
    latest = _latest_row()
    holes = set(all_queries()) - set(_PRIORITY) - set(latest)
    assert not holes, f"contracts with no driver row and no window slot: {holes}"


def test_window_queries_are_oracle_backed():
    """Every window slot must have a DuckDB oracle — the full hash check,
    not the weaker rows-only gate."""
    oracles = all_oracles()
    for name in _PRIORITY:
        assert name in oracles, f"{name} has no oracle"
