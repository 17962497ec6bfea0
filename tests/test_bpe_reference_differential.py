"""Representation-independent BPE differential.

The DuckDB oracle shares the bracket-packed-STRING representation with the
Spark implementation (both express a merge as a literal replace), so a
conceptual bug in that representation — overlap handling, boundary
stealing, bracket collisions — could pass the oracle on both sides. This
reference implements BPE the way a tokenizer library does: each word is a
LIST of tokens, a merge round counts adjacent pairs weighted by word
frequency, picks argmax with the (count desc, lhs, rhs) tie-break, and
rewrites each word left-to-right non-overlapping. Hypothesis drives random
corpora over a tiny alphabet (maximum pair collisions and overlap chains),
and both the merge table and the per-doc encoded token counts must match
Spark exactly.
"""

from __future__ import annotations

import os
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from parquet_near_storage_compute_spark.operators import training as TR


def _ref_bpe(texts: list[str], rounds: int) -> tuple[list[tuple], dict]:
    """(merge table rows, word -> final token list) — list-of-tokens BPE."""
    vocab: Counter = Counter()
    for t in texts:
        for w in t.split(" "):
            w = w.replace(TR.BPE_L, "").replace(TR.BPE_R, "")
            if len(w) >= 1:
                vocab[w] += 1
    toks = {w: list(w) for w in vocab}
    merges: list[tuple] = []
    for rnd in range(1, rounds + 1):
        pairs: Counter = Counter()
        for w, n in vocab.items():
            tk = toks[w]
            for i in range(len(tk) - 1):
                pairs[(tk[i], tk[i + 1])] += n
        if not pairs:
            continue
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), n_occ = best
        merges.append((rnd, l, r, l + r, n_occ))
        for w in toks:
            tk, out, i = toks[w], [], 0
            while i < len(tk):
                if i + 1 < len(tk) and tk[i] == l and tk[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(tk[i])
                    i += 1
            toks[w] = out
    return merges, toks


WORDS = st.text(alphabet="abc", min_size=1, max_size=6)
CORPUS = st.lists(
    st.lists(WORDS, min_size=0, max_size=8).map(" ".join),
    min_size=1,
    max_size=6,
)


@pytest.fixture(scope="module")
def write_corpus(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("bpe_ref")
    state = {"i": 0}

    def make(texts):
        out = str(root / f"c{state['i']}")
        state["i"] += 1
        spark.createDataFrame(
            [(i, t, "en", "unit", len(t)) for i, t in enumerate(texts)],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.mode("overwrite").parquet(
            os.path.join(out, "documents.parquet")
        )
        return out

    return make


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(texts=CORPUS)
def test_bpe_matches_token_list_reference(spark, write_corpus, texts):
    d = write_corpus(texts)
    got_merges = sorted(
        tuple(r) for r in TR.bpe_merges(spark, d).collect()
    )
    # the Spark trainer's vocab filter (len >= 2) is pair-neutral; the
    # reference keeps len >= 1 words, so trajectories must still agree
    ref_merges, ref_toks = _ref_bpe(texts, TR.BPE_MERGE_ROUNDS)
    assert got_merges == sorted(ref_merges)

    got_enc = {
        r.doc_id: (r.n_words, r.n_tokens)
        for r in TR.bpe_encode(spark, d).collect()
    }
    for i, t in enumerate(texts):
        ws = [
            w.replace(TR.BPE_L, "").replace(TR.BPE_R, "")
            for w in t.split(" ")
        ]
        ws = [w for w in ws if len(w) >= 1]
        exp = (len(ws), sum(len(ref_toks[w]) for w in ws))
        assert got_enc[i] == exp, (i, t, got_enc[i], exp)
