"""Randomized differential sweep: seeded synthetic corpora with shapes the
fixed test corpus doesn't exercise — duplicate texts, single-word and empty
documents, identical timestamps, negative and tiny float values, hot users —
run through the SAME Spark-vs-DuckDB oracle harness as the registry sweep.
Catches data-shape assumptions that 163 green contracts on one corpus can't.

Corpora are deterministic (fixed seeds), so failures reproduce exactly."""

from __future__ import annotations

import datetime as dt
import os
import random

import duckdb
import pytest

from parquet_near_storage_compute_spark.registry import all_oracles, all_queries
from tests.oracle import compare

#: Contracts exercised per random corpus — chosen to span the families
#: whose semantics depend on data shape (folds, windows, sketches, dedup,
#: text) while staying cheap enough to run per seed.
CONTRACTS = [
    "time_ewma",
    "time_ohlc_bars",
    "events_markov_transitions",
    "events_funnel",
    "sketch_kmv_distinct",
    "sketch_countmin",
    "agg_bitmap_distinct",
    "text_token_counts",
    "text_fingerprint",
    "text_quality_classifier",
    "train_quality_resample",
    "dedup_exact",
    "text_repetition_filter",
    "text_language_id",
    "time_tumbling_hourly",
    "events_cumulative_users",
    "sketch_hll_distinct",
    "dedup_simhash",
    # lineitem/orders families — heavy-duplicate prices (30% of rows share
    # one exact value) exercise the r6 rank-interval percentile flags and
    # window/top-k tie handling
    "agg_pricing_summary",
    "agg_approx_percentile_sketch",
    "agg_percentile",
    "agg_stats",
    "agg_rollup",
    "window_topk_per_group",
    "sort_limit_topk",
    "join_range",
]

WORDS = (
    "the quick brown fox jumps over lazy dog data spark parquet near "
    "storage compute query shuffle join window aggregate le chat der hund"
).split()


def _make_corpus(spark, out: str, seed: int) -> None:
    rng = random.Random(seed)
    n_events, n_docs = 4000, 600
    base_ts = dt.datetime(2024, 3, 1)
    events = []
    for i in range(n_events):
        # hot user 7 holds ~20% of events; identical timestamps common
        user = 7 if rng.random() < 0.2 else rng.randrange(50)
        ts = base_ts + dt.timedelta(seconds=rng.randrange(0, 36_000) // 10 * 10)
        value = rng.choice(
            [
                rng.uniform(-1000, 1000),
                rng.uniform(-1e-6, 1e-6),
                0.0,
                float(rng.randrange(100)),
            ]
        )
        events.append(
            (
                i,
                ts,
                user,
                rng.choice(["click", "view", "purchase"]),
                value,
                "{}",
            )
        )
    spark.createDataFrame(
        events, "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))

    docs = []
    dup_text = " ".join(rng.choices(WORDS, k=30))
    for i in range(n_docs):
        r = rng.random()
        if r < 0.15:
            text = dup_text  # exact-duplicate cluster
        elif r < 0.20:
            text = rng.choice(WORDS)  # single word (< bigram length)
        elif r < 0.23:
            text = ""  # empty document
        else:
            text = " ".join(rng.choices(WORDS, k=rng.randrange(5, 120)))
        docs.append(
            (i, text, rng.choice(["en", "de", "fr"]), rng.choice(["web", "book"]), len(text))
        )
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(out, "documents.parquet"))

    # lineitem: 30% of rows share ONE exact price (multiplicity ≫ the GK
    # tolerance band — the regime the r6 rank-interval flag fix exists
    # for); ties everywhere for window/top-k determinism checks
    n_li, n_orders = 3000, 800
    hot_price = 12345.67
    lineitem = []
    for i in range(n_li):
        okey = rng.randrange(n_orders)
        price = hot_price if rng.random() < 0.3 else round(rng.uniform(900.0, 99_000.0), 2)
        lineitem.append(
            (
                okey,
                rng.randrange(200),
                rng.randrange(10),
                i,  # unique linenumber keeps tiebreaks deterministic
                float(rng.randrange(1, 50)),
                price,
                round(rng.uniform(0.0, 0.1), 2),
                round(rng.uniform(0.0, 0.08), 2),
                rng.choice(["A", "N", "R"]),
                rng.choice(["F", "O"]),
                base_ts + dt.timedelta(days=rng.randrange(0, 300)),
            )
        )
    spark.createDataFrame(
        lineitem,
        "l_orderkey long, l_partkey long, l_suppkey long, l_linenumber int, "
        "l_quantity double, l_extendedprice double, l_discount double, "
        "l_tax double, l_returnflag string, l_linestatus string, "
        "l_shipdate timestamp",
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(out, "lineitem.parquet"))

    orders = [
        (
            i,
            rng.randrange(150),
            rng.choice(["F", "O", "P"]),
            round(rng.uniform(1000.0, 400_000.0), 2),
            base_ts + dt.timedelta(days=rng.randrange(0, 300)),
            rng.choice(["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]),
        )
        for i in range(n_orders)
    ]
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_totalprice double, o_orderdate timestamp, o_orderpriority string",
    ).coalesce(2).write.mode("overwrite").parquet(os.path.join(out, "orders.parquet"))


@pytest.fixture(scope="module", params=[11, 42])
def random_corpus(request, spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp(f"randcorpus_{request.param}"))
    _make_corpus(spark, out, request.param)
    return out


@pytest.fixture(scope="module")
def random_con(random_corpus):
    con = duckdb.connect()
    for t in ("events", "documents", "lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{os.path.join(random_corpus, t + '.parquet')}/*.parquet'"
        )
    return con


@pytest.mark.parametrize("name", CONTRACTS)
def test_contract_on_random_corpus(spark, random_corpus, random_con, name):
    qs, oracles = all_queries(), all_oracles()
    compare(qs[name](spark, random_corpus), random_con, oracles[name])
