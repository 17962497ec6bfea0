"""`dedup_image_phash` (r7, VERDICT r6 #3): DCT perceptual-hash near-dup
detection over the committed image fixture — the multimodal × dedup bridge.

The contract's one float stage (the DCT) crosses engines, so beyond the
full-parity compare this file pins the two facts that make the float stage
safe: the per-image hash integers agree bit-for-bit between numpy and the
DuckDB re-derivation, and every AC-coefficient-to-median gap is orders of
magnitude above cross-engine summation-order drift."""

from __future__ import annotations

import duckdb
import numpy as np
import pyspark.sql.functions as F
import pytest

from parquet_near_storage_compute_spark.operators import multimodal as M
from tests.oracle import compare


@pytest.fixture(scope="module")
def fixture_rows():
    con = duckdb.connect()
    return con.execute(
        f"SELECT img_id, payload FROM read_parquet('{M.IMG_DEDUP_FIXTURE}') "
        "ORDER BY img_id"
    ).fetchall()


def _numpy_phashes(rows) -> dict[int, int]:
    return {img_id: M.phash64(M.decode_image(bytes(p))) for img_id, p in rows}


def test_contract_matches_member_level_oracle(spark, sf_dir):
    con = duckdb.connect()
    compare(
        M.image_phash_dedup(spark, sf_dir),
        con,
        M.ORACLE_SQL["dedup_image_phash"],
    )


def test_hashes_bit_identical_across_engines(fixture_rows):
    """The 63 hash bits must agree engine-for-engine as INTEGERS — the
    strongest cross-engine statement (the decision algebra downstream is
    pure integer work on both sides)."""
    con = duckdb.connect()
    # reuse the oracle's hash pipeline up to `hsh` by wrapping the full
    # oracle and projecting the phash column
    duck = dict(
        con.execute(
            f"SELECT img_id, phash FROM ({M.ORACLE_SQL['dedup_image_phash']})"
        ).fetchall()
    )
    mine = _numpy_phashes(fixture_rows)
    assert duck == mine


def test_median_margins_dwarf_float_drift(fixture_rows):
    """Bit b flips across engines only if AC[b] crosses the median under
    ~1e-13 relative summation-order drift. Assert every |AC − median| gap
    (excluding the median element itself, exactly zero by construction)
    and both sorted neighbours of the median clear 1e-3 — nine orders of
    margin."""
    n = M.PHASH_RESIZED
    a = np.arange(M.PHASH_BLOCK)[:, None]
    y = np.arange(n)[None, :]
    c = np.cos(np.pi * (2 * y + 1) * a / (2 * n)) * np.where(
        a == 0, np.sqrt(1.0 / n), np.sqrt(2.0 / n)
    )
    min_gap = np.inf
    for _, p in fixture_rows:
        img = M.decode_image(bytes(p)).astype(np.int64)
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


def test_variants_cluster_with_their_base(fixture_rows):
    """Fixture law: ids ≥ 1000 are perturbed/exact copies of bases 0..7
    (3 variants each, then 2 exact copies of base 0). Every variant's
    hash must sit within PHASH_HAMMING of its base — pHash's whole claim
    — and exact copies at hamming 0; unrelated bases must stay far."""
    h = _numpy_phashes(fixture_rows)
    ham = lambda x, y: bin(x ^ y).count("1")
    for i in range(8):
        for v in range(3):
            vid = 1000 + 3 * i + v
            assert ham(h[i], h[vid]) <= M.PHASH_HAMMING, (i, vid)
    for vid in (1024, 1025):  # exact byte copies of base 0
        assert h[vid] == h[0]
    base_dists = [
        ham(h[i], h[j]) for i in range(24) for j in range(i + 1, 24)
    ]
    assert min(base_dists) > M.PHASH_HAMMING  # no false merges among bases


def test_decisions_keep_bases_drop_variants(spark, sf_dir):
    rows = M.image_phash_dedup(spark, sf_dir).collect()
    kept = sorted(r.img_id for r in rows if r.keep)
    dropped = sorted(r.img_id for r in rows if not r.keep)
    assert kept == list(range(24))
    assert dropped == list(range(1000, 1026))
    by_id = {r.img_id: r for r in rows}
    # base 0's neighbourhood: 3 perturbed variants + 2 exact copies
    assert by_id[0].n_partners == 5
    # an unvaried base is unique
    assert by_id[23].n_partners == 0 and by_id[23].keep
