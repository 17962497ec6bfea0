"""Property tests for the round-6 algebraic devices, at the algebra level
(pure Python mirrors of the Spark constructions — fast, no session):

- chunked EWMA: the suffix-decay stitch must equal the sequential fold for
  ANY values and ANY chunk size (to float tolerance), and be EXACTLY the
  sequential fold when everything fits one chunk;
- two-phase k-min: local k-min per salt slice then global k-min must equal
  the plain global k-min for ANY multiset and salt count (the invariant
  that lets the salted Spark plan keep the single-window oracle);
- kNN pilot cap: bounded enumeration must leave in-cap buckets' candidate
  sets untouched and cut over-cap buckets to exactly the P smallest ids.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st

ALPHA = 0.5


def _sequential(values: list[float]) -> float:
    s = values[0]
    for x in values[1:]:
        s = s + ALPHA * (x - s)
    return s


def _chunked(values: list[float], chunk: int) -> float:
    """Mirror of ewma_per_user's construction: per-chunk folds (first chunk
    seeded with its first value, later chunks seed-0 partials), suffix
    decay 0.5^n_after, sequential stitch sum in chunk order."""
    chunks = [values[i : i + chunk] for i in range(0, len(values), chunk)]
    total = len(values)
    acc = 0.0
    seen = 0
    for ci, cvals in enumerate(chunks):
        if ci == 0:
            contrib = _sequential(cvals)
        else:
            p = 0.0
            for x in cvals:
                p = p + ALPHA * (x - p)
            contrib = p
        seen += len(cvals)
        n_after = total - seen
        acc = acc + contrib * (0.5**n_after)
    return acc


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=300,
    ),
    st.integers(min_value=1, max_value=50),
)
@settings(max_examples=300, deadline=None)
def test_chunked_ewma_equals_sequential(values, chunk):
    seq = _sequential(values)
    chk = _chunked(values, chunk)
    assert math.isclose(chk, seq, rel_tol=1e-9, abs_tol=1e-9)


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False),
        min_size=1,
        max_size=200,
    )
)
@settings(max_examples=200, deadline=None)
def test_single_chunk_is_bitwise_sequential(values):
    assert _chunked(values, len(values)) == _sequential(values)


@given(
    st.lists(st.integers(min_value=0, max_value=1 << 32), min_size=0, max_size=500),
    st.integers(min_value=1, max_value=32),
    st.integers(min_value=1, max_value=64),
)
@settings(max_examples=300, deadline=None)
def test_two_phase_kmin_equals_global_kmin(hashes, n_salt, k):
    """k-min merges associatively: every global k-min element is in its
    salt slice's local k-min."""
    local = []
    for s in range(n_salt):
        slice_ = sorted(h for h in hashes if h % n_salt == s)
        local.extend(slice_[:k])
    assert sorted(local)[:k] == sorted(hashes)[:k]


@given(
    st.dictionaries(
        st.integers(min_value=0, max_value=15),  # bucket ids
        st.sets(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=800),
        min_size=1,
        max_size=16,
    ),
    st.integers(min_value=2, max_value=600),  # cap
    st.integers(min_value=1, max_value=64),  # pilot
)
@settings(max_examples=200, deadline=None)
def test_pilot_cap_bounds_only_overcap_buckets(buckets, cap, pilot):
    """Mirror of _nbr_candidates' selection rule."""
    for members in buckets.values():
        ms = sorted(members)
        if len(ms) <= cap:
            selected = ms  # untouched
        else:
            selected = ms[:pilot]
        # the rule the Spark/oracle sides must both satisfy:
        assert len(selected) <= max(cap, pilot)
        if len(ms) > cap:
            assert selected == ms[:pilot]
        else:
            assert selected == ms
