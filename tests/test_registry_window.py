"""Pin the driver correctness window: the driver hashes the FIRST 50 keys of
``all_queries()`` in iteration order, so the window contents are part of the
contract. Round 6's window (VERDICT r5 #1) = the 22 contracts that have
never had a driver row (round 5's third-session additions), the 2 contracts
round 6 modifies that already carry rows, and the 26 oldest-r3-row contracts
as fill. After this window lands green every registered contract has at
least one external driver row."""

from __future__ import annotations

import json
import os

from parquet_near_storage_compute_spark.registry import (
    _PRIORITY,
    DEFERRED_TO_R7,
    MODIFIED_IN_R6,
    NEVER_DRIVER_CHECKED,
    all_oracles,
    all_queries,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _round_keys(name: str) -> list[str]:
    with open(os.path.join(_REPO, name)) as fh:
        return list(json.load(fh))


def test_window_is_exactly_priority():
    assert len(_PRIORITY) == 50
    assert len(set(_PRIORITY)) == 50
    assert list(all_queries())[:50] == _PRIORITY


def test_window_covers_every_unconfirmed_contract():
    """Every contract with no driver row in any round, and everything
    modified since its last driver row, must be in the round-6 window —
    except the explicitly pinned new-in-r6 deferral (the window is fully
    booked; deferral is only legitimate for brand-new contracts)."""
    prior = (
        set(_round_keys("CORRECTNESS_r03.json"))
        | set(_round_keys("CORRECTNESS_r04.json"))
        | set(_round_keys("CORRECTNESS_r05.json"))
    )
    never = set(all_queries()) - prior
    missing = (never | set(MODIFIED_IN_R6)) - set(_PRIORITY) - set(DEFERRED_TO_R7)
    assert not missing, f"unconfirmed contracts outside the window: {missing}"
    # the pinned lists must BE the never-checked set — if a contract gains
    # or loses a row the pins must be updated consciously
    assert never == set(NEVER_DRIVER_CHECKED) | set(DEFERRED_TO_R7), (
        sorted(never ^ (set(NEVER_DRIVER_CHECKED) | set(DEFERRED_TO_R7)))
    )


def test_r7_deferral_is_new_and_oracle_backed():
    """Deferral is only legitimate for contracts that never had a driver
    row to go stale (new this round) and that the local differential
    harness fully covers (oracle-backed) — the same rule round 5's
    deferral followed."""
    oracles = all_oracles()
    prior = (
        set(_round_keys("CORRECTNESS_r03.json"))
        | set(_round_keys("CORRECTNESS_r04.json"))
        | set(_round_keys("CORRECTNESS_r05.json"))
    )
    for name in DEFERRED_TO_R7:
        assert name not in prior, f"{name} has a driver row — defer invalid"
        assert name in oracles
        assert name not in _PRIORITY


def test_fill_slots_are_the_oldest_r3_rows():
    """The non-priority window slots must rotate the STALEST driver rows:
    contracts whose latest row is round 3, in CORRECTNESS_r03 key order."""
    r3 = _round_keys("CORRECTNESS_r03.json")
    r4 = set(_round_keys("CORRECTNESS_r04.json"))
    r5 = set(_round_keys("CORRECTNESS_r05.json"))
    stale = [k for k in r3 if k not in r4 and k not in r5]
    fill = [
        k
        for k in _PRIORITY
        if k not in NEVER_DRIVER_CHECKED and k not in MODIFIED_IN_R6
    ]
    assert fill == stale[: len(fill)]


def test_every_registered_contract_has_a_row_or_a_slot():
    """No contract may fall through the rotation: each is either in the r6
    window, explicitly deferred to r7, or carries an r3/r4/r5 driver row
    and is unmodified since."""
    prior = (
        set(_round_keys("CORRECTNESS_r03.json"))
        | set(_round_keys("CORRECTNESS_r04.json"))
        | set(_round_keys("CORRECTNESS_r05.json"))
    )
    holes = set(all_queries()) - set(_PRIORITY) - set(DEFERRED_TO_R7) - prior
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
