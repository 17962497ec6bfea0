"""`dedup_audio_fingerprint` (r7): spectral-fingerprint near-dup detection
over the committed audio fixture — the audio leg of the per-modality
near-dup matrix. Mirrors the pHash test structure: full parity, bit-exact
cross-engine hash integers, measured float margins, and the fixture-law
clustering assertions."""

from __future__ import annotations

import io
import wave

import duckdb
import numpy as np
import pytest

from parquet_near_storage_compute_spark.operators import multimodal as M
from tests.oracle import compare


@pytest.fixture(scope="module")
def fixture_clips():
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT clip_id, payload FROM read_parquet('{M.AUDIO_DEDUP_FIXTURE}') "
        "ORDER BY clip_id"
    ).fetchall()
    out = []
    for cid, p in rows:
        with wave.open(io.BytesIO(bytes(p))) as w:
            raw = w.readframes(w.getnframes())
        out.append((cid, np.frombuffer(raw, dtype="<i2")))
    return out


def _energies(samples: np.ndarray) -> np.ndarray:
    fr = samples.astype(np.float64).reshape(
        M.AUDIO_FP_FRAMES, M.AUDIO_FP_FRAME_LEN
    )
    tt = np.arange(M.AUDIO_FP_FRAME_LEN, dtype=np.float64)
    cw = np.empty((M.AUDIO_FP_BANDS, M.AUDIO_FP_FRAME_LEN))
    sw = np.empty((M.AUDIO_FP_BANDS, M.AUDIO_FP_FRAME_LEN))
    for m in range(M.AUDIO_FP_BANDS):
        arg = (2 * np.pi * (250 + 150 * m) * tt) / M.AUDIO_FP_RATE
        cw[m] = np.cos(arg)
        sw[m] = np.sin(arg)
    c = fr @ cw.T
    s = fr @ sw.T
    return c * c + s * s


def test_contract_matches_member_level_oracle(spark, sf_dir):
    con = duckdb.connect()
    compare(
        M.audio_fingerprint_dedup(spark, sf_dir),
        con,
        M.ORACLE_SQL["dedup_audio_fingerprint"],
    )


def test_fingerprints_bit_identical_across_engines(fixture_clips):
    """The 63 differential bits must agree engine-for-engine as INTEGERS —
    everything downstream is integer work on both sides."""
    con = duckdb.connect()
    duck = dict(
        con.execute(
            "SELECT clip_id, fp FROM "
            f"({M.ORACLE_SQL['dedup_audio_fingerprint']})"
        ).fetchall()
    )
    mine = {cid: M.audio_fingerprint63(s) for cid, s in fixture_clips}
    assert duck == mine


def test_differential_margins_dwarf_float_drift(fixture_clips):
    """A bit flips across engines only if its energy differential crosses
    zero under summation-order drift (~|E|·1e-12 ≈ 0.35 here). Assert
    every |differential| clears 1e3 — five orders of margin."""
    min_margin = np.inf
    for _, s in fixture_clips:
        e = _energies(s)
        for m in range(M.AUDIO_FP_BANDS - 2):
            min_margin = min(min_margin, abs(e[0][m] - e[0][m + 1]))
        for n in range(1, M.AUDIO_FP_FRAMES):
            for m in range(M.AUDIO_FP_BANDS - 1):
                d = (e[n][m] - e[n][m + 1]) - (e[n - 1][m] - e[n - 1][m + 1])
                min_margin = min(min_margin, abs(d))
    assert min_margin > 1e3, f"differential margin too thin: {min_margin}"


def test_variants_cluster_with_their_base(fixture_clips):
    """Fixture law: ids ≥ 1000 are gain/noise/requantization variants of
    bases 0..7 (3 each), then 2 exact copies of base 0. Variants within
    the Hamming threshold, exact copies at 0, unrelated bases far."""
    h = {cid: M.audio_fingerprint63(s) for cid, s in fixture_clips}
    ham = lambda x, y: bin(x ^ y).count("1")
    for i in range(8):
        for v in range(3):
            assert ham(h[i], h[1000 + 3 * i + v]) <= M.AUDIO_FP_HAMMING
    for vid in (1024, 1025):
        assert h[vid] == h[0]
    base_d = [ham(h[i], h[j]) for i in range(24) for j in range(i + 1, 24)]
    assert min(base_d) > M.AUDIO_FP_HAMMING


def test_decisions_keep_bases_drop_variants(spark, sf_dir):
    rows = M.audio_fingerprint_dedup(spark, sf_dir).collect()
    kept = sorted(r.clip_id for r in rows if r.keep)
    dropped = sorted(r.clip_id for r in rows if not r.keep)
    assert kept == list(range(24))
    assert dropped == list(range(1000, 1026))
    by_id = {r.clip_id: r for r in rows}
    assert by_id[0].n_partners == 5  # 3 variants + 2 exact copies
    assert by_id[23].n_partners == 0 and by_id[23].keep
