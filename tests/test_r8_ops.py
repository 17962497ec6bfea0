"""Round-8 composition contracts: `train_decontaminate_trim` (span-level
eval-set decontamination — the action half of train_contamination_check)
and `dedup_keep_best` (cluster-level canonical selection — keep the
best-quality member of each near-dup cluster, not the arbitrary min id)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators import dedup as D
from parquet_near_storage_compute_spark.operators import training as T
from tests.oracle import compare, duckdb_con


# ------------------------------------------------- decontaminate trim
def test_decontaminate_trim_matches_oracle(spark, sf_dir, sf_oracle_dir):
    for sf in {sf_dir, sf_oracle_dir}:
        con = duckdb_con(sf)
        compare(
            T.decontaminate_trim(spark, sf),
            con,
            T.ORACLE_SQL["train_decontaminate_trim"],
        )


def _trim_rows(spark, tmp_path, docs: dict[int, str]):
    out = str(tmp_path / "decontam")
    spark.createDataFrame(
        [(i, t) for i, t in docs.items()], "doc_id long, text string"
    ).coalesce(2).write.mode("overwrite").parquet(out + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    compare(
        T.decontaminate_trim(spark, out),
        con,
        T.ORACLE_SQL["train_decontaminate_trim"],
    )
    return {r.doc_id: r for r in T.decontaminate_trim(spark, out).collect()}


def test_decontaminate_trim_semantics(spark, tmp_path):
    """Planted overlap: doc 0 is EVAL (0 % EVAL_MOD == 0); doc 1 embeds an
    exact CONTAM_NGRAM-gram of it mid-text; doc 2 shares nothing. The
    contaminated span (gram + its rolling cover) must be excised from doc
    1 only, eval docs must not appear in the output, and an eval gram
    repeated across MANY eval docs still trims (no rare-gram cap — the
    existence semi-join is the design)."""
    n = T.CONTAM_NGRAM
    gram = " ".join(f"leak{i}" for i in range(n))
    head = "clean head words here now"
    tail = "clean tail words after leak"
    docs = {
        0: f"eval prefix {gram} eval suffix",
        1: f"{head} {gram} {tail}",
        2: "totally unrelated text with no overlap at all",
        # a second eval doc repeating the gram: df=2 > any rare cap of 1
        # would have dropped it — trimming must still fire
        20: f"another eval document containing {gram} again",
    }
    rows = _trim_rows(spark, tmp_path, docs)
    assert sorted(rows) == [1, 2]  # eval docs (0, 20) excluded
    n_head, n_tail = len(head.split(" ")), len(tail.split(" "))
    assert rows[1].n_words == n_head + n + n_tail
    assert rows[1].n_trimmed_words == n  # exactly the gram's span
    assert rows[2].n_trimmed_words == 0
    assert rows[2].kept_fraction == 1.0


def test_decontaminate_trim_accounting(spark, sf_dir):
    rows = T.decontaminate_trim(spark, sf_dir).collect()
    assert rows and all(
        r.n_kept_words + r.n_trimmed_words == r.n_words for r in rows
    )
    # eval docs never in the output
    assert all(r.doc_id % T.EVAL_MOD != 0 for r in rows)


# ---------------------------------------------------------- keep best
def test_keep_best_matches_oracle(spark, sf_dir, sf_oracle_dir):
    for sf in {sf_dir, sf_oracle_dir}:
        con = duckdb_con(sf)
        compare(D.keep_best(spark, sf), con, D.ORACLE_SQL["dedup_keep_best"])


def test_keep_best_semantics(spark, sf_dir):
    """Exactly one keep per cluster; the winner is the max-n_chars member
    (ties to the smallest doc_id); clusters and sizes agree with
    dedup_connected_components; the best-is-not-min-id branch fires on
    the fixture."""
    rows = D.keep_best(spark, sf_dir).collect()
    cc = {
        r.doc_id: r
        for r in D.connected_components(spark, sf_dir).collect()
    }
    n_chars = {
        r.doc_id: r.n_chars
        for r in D.load_table(spark, sf_dir, "documents")
        .select("doc_id", "n_chars")
        .collect()
    }
    assert {r.doc_id for r in rows} == set(cc)
    by_cluster: dict[int, list] = {}
    for r in rows:
        assert r.cluster_rep == cc[r.doc_id].cluster_rep
        assert r.cluster_size == cc[r.doc_id].cluster_size
        by_cluster.setdefault(r.cluster_rep, []).append(r)
    diverged = 0
    for members in by_cluster.values():
        keeps = [m for m in members if m.keep == 1]
        assert len(keeps) == 1
        want = min(
            (m.doc_id for m in members),
            key=lambda d: (-n_chars[d], d),
        )
        assert keeps[0].doc_id == want == members[0].best_doc
        assert all(m.best_doc == want for m in members)
        diverged += want != min(m.doc_id for m in members)
    assert diverged > 0, "fixture must exercise best != min-id"


def test_keep_best_plan_broadcasts_winner_join(spark, sf_dir):
    plan = (
        D.keep_best(spark, sf_dir)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan
