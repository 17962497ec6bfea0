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
