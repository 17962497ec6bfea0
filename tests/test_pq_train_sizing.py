"""PQ_TRAIN_N sizing-rule guard (VERDICT r9 #4).

PQ_TRAIN_N=512 was chosen by measured sweep on the COMMITTED corpora
(≤ 2000 vectors). These tests recompute the documented rule — the
sample-fraction floor ``PQ_TRAIN_N >= ceil(n / PQ_TRAIN_MAX_SUBSAMPLE)``
plus the sweep-coverage gate ``n <= PQ_TRAIN_MAX_CORPUS`` — from the
committed corpora, and fail the moment a larger embeddings fixture ships,
so the constant can never silently under-train a bigger corpus's book.
They also pin the measured reason the classic FAISS points-per-centroid
ratio was NOT adopted: the grid-seeded books occupy ~207 of 256 codewords
per subspace from 512 samples, so 39·k_eff would demand full-corpus
training at every committed size. No Spark session needed: the sample
draw and training are the driver-side k-min + exact-int64 NumPy path the
operator itself uses."""

from __future__ import annotations

import glob
import os

import duckdb
import pytest

from parquet_near_storage_compute_spark.operators.similarity import (
    PQ_M,
    PQ_TRAIN_MAX_CORPUS,
    PQ_TRAIN_MAX_SUBSAMPLE,
    PQ_TRAIN_N,
    _lloyd_book,
)

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Every committed embeddings corpus: the three testdata SFs plus the
#: clustered ANN fixture. glob also picks up any FUTURE fixture whose
#: name contains "embeddings", so a new corpus is tested automatically.
CORPORA = sorted(
    glob.glob("/root/testdata/sf*/embeddings.parquet")
    + glob.glob(os.path.join(_REPO, "fixtures", "*embeddings*.parquet"))
)


def _sample(path: str) -> tuple[int, list[list[float]]]:
    """(corpus size, the operator's own k-min training sample)."""
    con = duckdb.connect()
    n = con.execute(
        f"SELECT COUNT(*) FROM '{path}'"
    ).fetchone()[0]
    rows = con.execute(
        f"""
        SELECT embedding FROM '{path}'
        ORDER BY md5('pq:' || CAST(vec_id AS VARCHAR)) LIMIT {PQ_TRAIN_N}
        """
    ).fetchall()
    return n, [list(map(float, r[0])) for r in rows]


def test_corpora_exist():
    assert len(CORPORA) >= 4, CORPORA


@pytest.mark.parametrize("path", CORPORA)
def test_no_committed_corpus_outgrows_the_sweep(path):
    """A corpus larger than PQ_TRAIN_MAX_CORPUS means the recorded
    PQ_TRAIN_N sweeps no longer cover the regime the constant runs in —
    re-run tools/pq_train_sweep.py --samples (and --emb on the new
    fixture) and revisit PQ_TRAIN_N before shipping it."""
    n, _ = _sample(path)
    assert n <= PQ_TRAIN_MAX_CORPUS, (
        f"{path} has {n} vectors > PQ_TRAIN_MAX_CORPUS="
        f"{PQ_TRAIN_MAX_CORPUS}: re-run the train-sample sweep and "
        "revisit PQ_TRAIN_N / PQ_TRAIN_MAX_CORPUS"
    )


@pytest.mark.parametrize("path", CORPORA)
def test_train_n_satisfies_the_sample_fraction_floor(path):
    """The documented rule: the sample must cover at least
    1/PQ_TRAIN_MAX_SUBSAMPLE of the corpus — the fraction the recorded
    sweeps validated (recall ~0 cost on testdata, 0.13 on the clustered
    fixture at 512/2000)."""
    n, _ = _sample(path)
    required = -(-n // PQ_TRAIN_MAX_SUBSAMPLE)  # ceil
    assert PQ_TRAIN_N >= required, (
        f"{path}: corpus n={n} needs ceil(n/{PQ_TRAIN_MAX_SUBSAMPLE})="
        f"{required} training points but PQ_TRAIN_N={PQ_TRAIN_N} — re-run "
        "tools/pq_train_sweep.py --samples and revisit the constant"
    )


@pytest.mark.parametrize("path", CORPORA)
def test_grid_seeded_books_really_break_the_faiss_ratio(path):
    """Pin the measured justification for NOT adopting the FAISS
    39-points-per-centroid rule: the 2-bit-cell seeding occupies >100
    codewords per subspace from the 512 sample on every 2000-vector
    corpus (~2.5 points per codeword), so 39·k_eff ≥ corpus_n there —
    the ratio would demand full-corpus training. If a code change makes
    books dramatically smaller, this fails and the sizing rationale
    (similarity.py PQ_TRAIN_MAX_SUBSAMPLE block) must be re-derived."""
    n, vecs = _sample(path)
    book = _lloyd_book(vecs)
    per_sub = [0] * PQ_M
    for s, _c, _cw in book:
        per_sub[s] += 1
    k_eff = max(per_sub)
    if n >= 2000:
        assert 39 * k_eff >= n, (k_eff, n)
    # books are genuinely data-dependent, never the degenerate 1-cell
    assert k_eff >= 8, (path, per_sub)
