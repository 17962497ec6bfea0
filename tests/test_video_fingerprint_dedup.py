"""`dedup_video_fingerprint` (r7): sampled-frame perceptual-hash near-dup
detection over the committed video fixture — the fifth modality of the
near-dup matrix, and the first SIGNATURE (multi-hash) instance of the
shared decisions algebra.

Beyond the full-parity compare, this file pins: bit-identical per-frame
hash integers across engines, AC-median float margins per sampled frame,
the aligned-sequence semantics (the reversed-order temporal decoy must NOT
merge with its source even though it shares every pixel), and 100% banding
recall vs brute all-pairs."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest

from parquet_near_storage_compute_spark.operators import multimodal as M
from tests.oracle import compare

N_BASE = 16
DECOY = 1020  # base 0's frames in reverse order


@pytest.fixture(scope="module")
def fixture_rows():
    con = duckdb.connect()
    return con.execute(
        f"SELECT vid_id, payload FROM read_parquet('{M.VID_DEDUP_FIXTURE}') "
        "ORDER BY vid_id"
    ).fetchall()


def _numpy_sigs(rows) -> dict[int, list[int]]:
    return {vid: M.video_phash_sig(bytes(p)) for vid, p in rows}


def _ham(a: int, b: int) -> int:
    return bin(a ^ b).count("1")


def _maxham(sa: list[int], sb: list[int]) -> int:
    return max(_ham(a, b) for a, b in zip(sa, sb))


def test_contract_matches_member_level_oracle(spark, sf_dir):
    con = duckdb.connect()
    compare(
        M.video_fingerprint_dedup(spark, sf_dir),
        con,
        M.ORACLE_SQL["dedup_video_fingerprint"],
    )


def test_signatures_bit_identical_across_engines(fixture_rows):
    """All 4×63 signature bits must agree engine-for-engine as INTEGERS —
    the decision algebra downstream is pure integer work on both sides."""
    con = duckdb.connect()
    duck = {
        vid: [p0, p1, p2, p3]
        for vid, p0, p1, p2, p3 in con.execute(
            "SELECT vid_id, ph0, ph1, ph2, ph3 FROM "
            f"({M.ORACLE_SQL['dedup_video_fingerprint']})"
        ).fetchall()
    }
    assert duck == _numpy_sigs(fixture_rows)


def test_median_margins_dwarf_float_drift(fixture_rows):
    """Per sampled frame, every AC-coefficient-to-median gap must clear
    1e-3 against ~1e-13 relative cross-engine summation drift (the image
    contract's margin argument, applied per (clip, frame))."""
    n = M.PHASH_RESIZED
    a = np.arange(M.PHASH_BLOCK)[:, None]
    y = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * y + 1) * a / (2 * n)) * np.where(
        a == 0, np.sqrt(1.0 / n), np.sqrt(2.0 / n)
    )
    min_gap = np.inf
    for _, p in fixture_rows:
        frames = M.decode_video(bytes(p)).astype(np.int64)
        for f in range(0, M.VID_FRAMES, M.VID_SAMPLE_STRIDE):
            img = frames[f]
            luma = 299 * img[:, :, 0] + 587 * img[:, :, 1] + 114 * img[:, :, 2]
            pm = luma.reshape(n, 2, n, 2).sum(axis=(1, 3)).astype(np.float64)
            ac = (c @ pm @ c.T).flatten()[1:]
            med = np.sort(ac)[(len(ac) - 1) // 2]
            gaps = np.abs(ac - med)
            min_gap = min(min_gap, gaps[gaps > 0].min())
            s = np.sort(ac)
            mi = (len(ac) - 1) // 2
            for nb in (s[mi] - s[mi - 1], s[mi + 1] - s[mi]):
                if nb > 0:
                    min_gap = min(min_gap, nb)
    assert min_gap > 1e-3, f"median margin too thin: {min_gap}"


def test_variants_cluster_and_sequences_align(fixture_rows):
    """Fixture law: ids 1000..1017 are perturbed copies of bases 0..5 (3
    each), 1018/1019 exact copies of base 0, 1020 the temporal decoy.
    Variants must sit within VID_FRAME_HAMMING of their base on EVERY
    aligned frame; unrelated bases must exceed it; and the decoy — same
    pixels, reversed order — must exceed it too (the aligned-sequence
    claim: a bag-of-frames hash could never separate it)."""
    sig = _numpy_sigs(fixture_rows)
    for i in range(6):
        for v in range(3):
            vid = 1000 + 3 * i + v
            assert _maxham(sig[i], sig[vid]) <= M.VID_FRAME_HAMMING, (i, vid)
    for vid in (1018, 1019):
        assert sig[vid] == sig[0]
    assert (
        min(
            _maxham(sig[i], sig[j])
            for i in range(N_BASE)
            for j in range(i + 1, N_BASE)
        )
        > M.VID_FRAME_HAMMING
    )
    # the decoy diverges on its worst alignment slot but (by construction
    # from the same pixels) stays CLOSE on at least one slot — it is a
    # banded candidate that exact verification must reject, exercising the
    # candidate-rejected path
    assert _maxham(sig[0], sig[DECOY]) > M.VID_FRAME_HAMMING
    assert min(_ham(a, b) for a, b in zip(sig[0], sig[DECOY])) <= 8


def test_banding_recall_complete(fixture_rows):
    """Every brute all-pairs verified pair must be reachable through the
    per-frame 4×16-bit bands (member-level recall = 100% on the fixture)."""
    sig = _numpy_sigs(fixture_rows)
    ids = sorted(sig)
    brute = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if _maxham(sig[a], sig[b]) <= M.VID_FRAME_HAMMING
    }

    def keys(s: list[int]):
        return {
            (M.PHASH_BANDS * f + b, (h >> (16 * b)) & 0xFFFF)
            for f, h in enumerate(s)
            for b in range(M.PHASH_BANDS)
        }

    banded = {
        (a, b) for a, b in brute if keys(sig[a]) & keys(sig[b])
    }
    assert banded == brute and brute  # non-empty and fully recalled


def test_decisions_keep_bases_and_decoy_drop_variants(spark, sf_dir):
    rows = M.video_fingerprint_dedup(spark, sf_dir).collect()
    kept = sorted(r.vid_id for r in rows if r.keep)
    dropped = sorted(r.vid_id for r in rows if not r.keep)
    assert kept == list(range(N_BASE)) + [DECOY]
    assert dropped == list(range(1000, 1020))
    by_id = {r.vid_id: r for r in rows}
    # base 0's neighbourhood: 3 perturbed variants + 2 exact copies — the
    # decoy is NOT among its partners
    assert by_id[0].n_partners == 5
    assert by_id[DECOY].n_partners == 0
    # an unvaried base is unique
    assert by_id[15].n_partners == 0 and by_id[15].keep
