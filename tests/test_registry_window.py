"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 7's window (VERDICT r6 #1) = the 2 contracts deferred from
round 6 + 19 new in round 7 + the 3 contracts round 7 modifies, then every
contract still on a round-3 driver row (21), then the oldest round-4 rows as
fill (5). After this window lands green, no live contract is unchecked and
none is staler than round 4."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    DEFERRED_TO_R7,
    MODIFIED_IN_R7,
    NEW_IN_R7,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_ROUND_FILES = [f"CORRECTNESS_r0{n}.json" for n in range(1, 7)]


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


def _latest_row() -> dict[str, int]:
    """contract → the latest round with a driver row (1-6)."""
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
    modified since its last driver row, must be in the round-7 window —
    with no deferral left (round 6 cleared the backlog; the r6 deferral
    pair leads this window)."""
    latest = _latest_row()
    never = set(all_queries()) - set(latest)
    missing = (never | set(MODIFIED_IN_R7)) - set(_PRIORITY)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"
    # the pinned lists must BE the never-checked set — if a contract gains
    # or loses a row the pins must be updated consciously
    assert never == set(DEFERRED_TO_R7) | set(NEW_IN_R7), (
        sorted(never ^ (set(DEFERRED_TO_R7) | set(NEW_IN_R7)))
    )


def test_window_head_leads_with_unchecked_then_modified():
    """The never-checked contracts and this round's modifications occupy
    the first slots — if the driver truncates the window, the highest-value
    rows land first."""
    head = DEFERRED_TO_R7 + NEW_IN_R7 + MODIFIED_IN_R7
    assert _PRIORITY[: len(head)] == head


def test_every_r3_row_contract_is_in_the_window():
    """VERDICT r6 #1's done-criterion: no driver row older than round 4
    once this window lands. Every live contract whose latest row is round
    3 must hold a slot."""
    latest = _latest_row()
    live = set(all_queries())
    r3 = {k for k, v in latest.items() if v == 3 and k in live}
    missing = r3 - set(_PRIORITY)
    assert not missing, f"r3-row contracts left out of the window: {missing}"


def test_fill_slots_are_the_oldest_r4_rows():
    """The remaining slots must rotate the STALEST remaining driver rows:
    contracts whose latest row is round 4, in CORRECTNESS_r04 key order."""
    latest = _latest_row()
    live = set(all_queries())
    head = set(DEFERRED_TO_R7 + NEW_IN_R7 + MODIFIED_IN_R7)
    r3 = {k for k, v in latest.items() if v == 3 and k in live}
    expected_fill = [
        k
        for k in _round_keys("CORRECTNESS_r04.json")
        if latest[k] == 4 and k in live and k not in head and k not in r3
    ]
    fill = [k for k in _PRIORITY if k not in head and k not in r3]
    assert fill == expected_fill[: len(fill)]


def test_every_registered_contract_has_a_row_or_a_slot():
    """No contract may fall through the rotation: each is either in the r7
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
