"""Contamination-check skew guard (operators/training.py): the rare-gram
frequency cap must prune the EVAL side before the train⋈eval join executes —
otherwise a boilerplate gram shared by most eval docs fans out to
|train|×|eval| rows on one key before being discarded. Pins the optimized
join tree and exercises the adversarial boilerplate corpus end to end."""

from __future__ import annotations

from parquet_near_storage_compute_spark.operators.training import (
    CONTAM_MAX_DF,
    EVAL_MOD,
    _contamination_report,
    contamination_check,
)


def _topmost_join(node):
    if node.nodeName() == "Join":
        return node
    ch = node.children()
    for i in range(ch.size()):
        found = _topmost_join(ch.apply(i))
        if found is not None:
            return found
    return None


def test_rare_filter_feeds_the_big_join(spark, sf_dir):
    """The topmost Join must have the train gram stream on one side (no
    nested join, no aggregate) and the rare-capped eval stream on the other
    (the ev⋈rare join with the df ≤ CONTAM_MAX_DF aggregate BELOW it) — the
    executed per-key fan-out is then ≤ CONTAM_MAX_DF everywhere."""
    df = contamination_check(spark, sf_dir)
    top = _topmost_join(df._jdf.queryExecution().optimizedPlan())
    assert top is not None
    ch = top.children()
    assert ch.size() == 2
    sides = [ch.apply(i).toString() for i in range(2)]
    capped = [s for s in sides if "Join" in s]
    assert len(capped) == 1, "exactly one side of the top join is ev⋈rare"
    assert "Aggregate" in capped[0], "df-cap aggregate sits below the big join"
    assert f"<= {CONTAM_MAX_DF}" in capped[0]
    plain = next(s for s in sides if "Join" not in s)
    assert "Aggregate" not in plain, "train side joins raw gram stream"


def test_boilerplate_gram_is_pruned_before_fanout(spark):
    """Adversarial corpus: every eval doc carries the same 5-gram (df over
    the cap → boilerplate), one train doc carries it too; a rare gram is
    shared by one train doc and exactly two eval docs. Only the rare-gram
    hit may surface."""
    n_eval = CONTAM_MAX_DF + 6
    rows = []
    for i in range(n_eval):
        doc_id = i * EVAL_MOD  # eval: doc_id % EVAL_MOD == 0
        text = "aa bb cc dd ee"  # the boilerplate 5-gram
        if doc_id in (0, EVAL_MOD):  # two eval docs carry the rare gram
            text = "rr ss tt uu vv " + text
        rows.append((doc_id, text + f" u{i}"))
    rows.append((1, "zz rr ss tt uu vv"))  # train: shares only the rare gram
    rows.append((3, "aa bb cc dd ee yy"))  # train: shares only boilerplate
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = [r.asDict() for r in _contamination_report(docs).collect()]
    assert got == [{"doc_id": 1, "n_shared_grams": 1, "n_eval_docs": 2}]
