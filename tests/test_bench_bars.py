"""Every headline bench query must carry a regression bar (VERDICT r9 #1).

The 17-query r7 cohort ran unguarded through r7–r9 because bench.py's BARS
only unioned the r1/r6/r8/r9 bar tables; `dedup_semantic_clusters` swung
1.42→1.06→1.30 s across rounds with nothing to flag it. These tests make
that class of gap impossible to reintroduce: a query added to any headline
list without a bar base (bench.py `BARS` + the matching BASELINE.md table)
fails the suite.
"""

from __future__ import annotations

import bench


def test_every_headline_query_has_a_bar():
    missing = [q for q in bench.HEADLINE if q not in bench.BARS]
    assert not missing, (
        f"headline queries without a regression bar: {missing} — add their "
        "bar bases to bench.BARS AND the matching BASELINE.md table"
    )


def test_bars_are_positive_and_not_orphaned():
    for name, base in bench.BARS.items():
        assert isinstance(base, float) and base > 0, (name, base)
    orphans = [q for q in bench.BARS if q not in bench.HEADLINE]
    assert not orphans, (
        f"bars for queries not in the headline set: {orphans} — either the "
        "query was renamed/dropped (remove the bar) or it should be timed"
    )


def test_headline_queries_are_registered():
    from parquet_near_storage_compute_spark.registry import all_queries

    registered = set(all_queries())
    unknown = [q for q in bench.HEADLINE if q not in registered]
    assert not unknown, f"headline names not in the registry: {unknown}"


def test_headline_has_no_duplicates():
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_headline_is_exactly_the_cohort_union():
    flat = [q for c in bench.COHORTS.values() for q in c]
    assert bench.HEADLINE == flat


def test_headline_line_is_bounded_worst_case():
    """VERDICT r10 #1: the r10 stdout headline scaled with query count and
    crossed its own 1800-char guard assert, killing the driver's bench run
    (BENCH_r10.json rc=1, parsed:null). The rebuilt headline carries only
    the FROZEN core-22 per-query map plus one subtotal per cohort, so its
    worst-case serialized length is a constant. Pin it with every timing
    at its widest plausible serialization (9999.9999 — 9 chars, one more
    than the VERDICT's 8-char rule) and generous headroom below both the
    1800-char in-run fallback threshold and the driver's ~2000-char
    stdout capture. Adding queries to later cohorts must NOT move this."""
    worst_timings = {q: 9999.9999 for q in bench.HEADLINE}
    line = bench.build_headline_line(99999.9999, worst_timings, 0.001)
    assert len(line) <= 1500, len(line)
    # and the map inside is the frozen core-22, never the full headline
    import json

    parsed = json.loads(line)
    assert set(parsed["queries"]) == set(bench.CORE22)
    assert set(parsed["cohort_sec"]) == set(bench.COHORTS)
    assert parsed["n_queries"] == len(bench.HEADLINE)


def test_consecutive_breach_rule():
    """VERDICT r10 #5: a query raw-breaching in ≥2 consecutive recorded
    runs at the same sf is flagged regardless of session drift."""
    hist = [
        {"sf": 0.1, "raw_breaches": ["a", "b"]},
        {"sf": 0.01, "raw_breaches": ["c"]},
        {"sf": 0.1, "raw_breaches": ["b", "d"]},
    ]
    # only the LATEST same-sf entry counts as "previous"
    assert bench.consecutive_breaches(hist, {"a", "b", "d"}, 0.1) == ["b", "d"]
    assert bench.consecutive_breaches(hist, {"c"}, 0.01) == ["c"]
    assert bench.consecutive_breaches(hist, {"a"}, 0.1) == []
    assert bench.consecutive_breaches([], {"a"}, 0.1) == []


def test_drift_alarm_threshold_sane():
    """ADVICE r10 (medium): the median itself is gated so a uniform
    suite-wide slowdown cannot hide inside the normalization. The alarm
    must sit above observed box swing (~±20-25%) and at or below the
    1.5× per-query breach multiplier."""
    assert 1.25 < bench.SESSION_DRIFT_ALARM_RATIO <= 1.5
