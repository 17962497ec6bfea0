"""Focused properties for the round-11 changes, beyond the registry
oracle compare: the linear-time char iterator in `text_char_entropy`
(VERDICT r10 #2 — the r10 form's ``explode(sequence) + substr(text, i, 1)``
re-scanned the UTF8String per position, O(len²) per doc), and the three
new operators (`train_token_fertility`, `train_context_length_fit`,
`dedup_cluster_size_histogram`)."""

from __future__ import annotations

import time

import duckdb
from pyspark.sql import functions as F

from parquet_near_storage_compute_spark.operators.dedup import (
    ORACLE_SQL as DEDUP_ORACLES,
    cluster_size_histogram,
    connected_components,
)
from parquet_near_storage_compute_spark.operators.textops import (
    ORACLE_SQL as TEXT_ORACLES,
    char_entropy,
)
from parquet_near_storage_compute_spark.operators.timeseries import (
    LTTB_BUCKET_SEC,
    ORACLE_SQL as TS_ORACLES,
    downsample_lttb,
)
from parquet_near_storage_compute_spark.operators.training import (
    CONTEXT_LENGTHS,
    ORACLE_SQL as TRAIN_ORACLES,
    bpe_encode,
    context_length_fit,
    token_fertility,
)
from parquet_near_storage_compute_spark.tables import load_table
from tests.oracle import compare


def _docs_dir(spark, tmp_path, docs: dict[int, str]) -> tuple[str, object]:
    """Write a synthetic documents table; return (sf_dir, duckdb con)."""
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(2).write.mode("overwrite").parquet(out + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    return out, con


# ------------------------------------------ char entropy: linear iterator
def test_char_entropy_multibyte_equivalence(spark, tmp_path):
    """The split(text, '') iterator must produce code-point pieces — NOT
    UTF-16 code units — on multibyte (2–3 byte) and astral (surrogate-pair)
    characters. Pinned two ways on a planted corpus: (a) against the
    DuckDB oracle, which deliberately keeps the independent per-position
    substr iterator; (b) against the old Spark substr form computed
    inline (byte-identical (doc, ch, count) multiset)."""
    docs = {
        1: "héllo wörld é",          # 2-byte code points
        2: "漢字漢字テスト",            # 3-byte CJK
        3: "x\U0001f600y\U0001f600z\U0001f680",  # astral: surrogate pairs
        4: "plain ascii text",
        5: "\U0001f600" * 7,          # astral-only repeated run
    }
    out, con = _docs_dir(spark, tmp_path, docs)
    compare(char_entropy(spark, out), con, TEXT_ORACLES["text_char_entropy"])

    base = spark.read.parquet(out + "/documents.parquet")
    new_counts = (
        base.select("doc_id", F.explode(F.split("text", "")).alias("ch"))
        .filter(F.col("ch") != "")
        .groupBy("doc_id", "ch")
        .count()
    )
    old_counts = (
        base.filter(F.length("text") >= 1)
        .select(
            "doc_id",
            "text",
            F.explode(F.sequence(F.lit(1), F.length("text"))).alias("i"),
        )
        .select("doc_id", F.expr("substr(text, i, 1)").alias("ch"))
        .groupBy("doc_id", "ch")
        .count()
    )
    assert new_counts.exceptAll(old_counts).count() == 0
    assert old_counts.exceptAll(new_counts).count() == 0
    # astral-only doc: 7 chars of ONE distinct code point → entropy 0
    rows = {r["doc_id"]: r for r in char_entropy(spark, out).collect()}
    assert rows[5]["n_chars"] == 7
    assert rows[5]["n_distinct_chars"] == 1
    assert rows[5]["entropy_fp"] == 0 and rows[5]["low_entropy"]


def test_char_entropy_plan_has_no_positional_substr(spark, sf_dir):
    """Structural pin of the r11 fix: the optimized plan must not contain
    the sequence()/per-position substring pair (each substr call scanned
    the string from byte 0 — quadratic in doc length)."""
    plan = char_entropy(spark, sf_dir)._jdf.queryExecution().optimizedPlan().toString()
    assert "sequence(" not in plan, plan
    assert "substring(" not in plan, plan
    assert "split(" in plan, plan


def test_char_entropy_long_doc_is_linear_not_quadratic(spark, tmp_path):
    """The megabyte repeated-run compression-bomb doc is exactly what this
    op exists to catch and exactly where the O(len²) substr plan melted
    (measured r10: 15.2 s at 80k chars → ~95 s at 200k; the split form
    runs it in well under a second). Bound 25 s keeps a 4× box-noise
    margin on the linear form while sitting far below the quadratic
    form's floor."""
    bomb = "ab" * 100_000  # 200k chars, 2 distinct
    out, _ = _docs_dir(spark, tmp_path, {1: bomb, 2: "short control doc"})
    df = char_entropy(spark, out)
    t0 = time.perf_counter()
    rows = {r["doc_id"]: r for r in df.collect()}
    elapsed = time.perf_counter() - t0
    assert rows[1]["n_chars"] == 200_000
    assert rows[1]["n_distinct_chars"] == 2
    # H = ln 2 exactly (balanced 2-symbol doc): entropy_nats ≈ 0.693 < 1.5
    assert rows[1]["low_entropy"]
    assert abs(rows[1]["entropy_nats"] - 0.6931471805599453) < 1e-5
    assert elapsed < 25.0, f"entropy on a 200k-char doc took {elapsed:.1f}s"


# --------------------------------------------- token fertility (r11)
def test_fertility_buckets_match_per_doc_encode_totals(spark, sf_dir):
    """The bucket report is exactly the (lang, source) marginal of the
    registered per-doc encode: re-aggregate train_bpe_encode's output
    with the documents metadata and compare totals."""
    enc = bpe_encode(spark, sf_dir)
    meta = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", F.octet_length("text").alias("b")
    )
    expect = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["n_words"], r["n_tokens"], r["n_bytes"]
        )
        for r in enc.join(meta, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_words").alias("n_words"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("b").alias("n_bytes"),
        )
        .collect()
    }
    got = {
        (r["lang"], r["source"]): (
            r["n_docs"], r["n_words"], r["n_tokens"], r["n_bytes"]
        )
        for r in token_fertility(spark, sf_dir).collect()
    }
    assert got == expect
    # the ratios are integer per-mille on bucket TOTALS
    for r in token_fertility(spark, sf_dir).collect():
        if r["n_words"] > 0:
            assert r["fertility_permille"] == (
                1000 * r["n_tokens"]
            ) // r["n_words"]
        else:
            assert r["fertility_permille"] == -1


def test_fertility_multibyte_bytes_and_empty_bucket(spark, tmp_path):
    """UTF-8 byte accounting (octet_length vs DuckDB strlen) and the -1
    absent-denominator branch, oracle-compared on a planted corpus."""
    out = str(tmp_path / "corpus")
    rows = [
        (1, "héllo wörld", "de", "web"),   # 13 bytes, 2 words
        (2, "漢字", "ja", "web"),           # 6 bytes, 1 word
        (3, "", "xx", "empty"),             # 0 bytes, 0 words (filtered)
        (4, "plain text here", "en", "web"),
    ]
    spark.createDataFrame(
        [(i, t, lang, src, len(t)) for i, t, lang, src in rows],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(out + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    compare(
        token_fertility(spark, out), con, TRAIN_ORACLES["train_token_fertility"]
    )
    got = {
        (r["lang"], r["source"]): r
        for r in token_fertility(spark, out).collect()
    }
    assert got[("de", "web")]["n_bytes"] == 13  # é, ö are 2 bytes each
    assert got[("ja", "web")]["n_bytes"] == 6
    assert got[("xx", "empty")]["n_words"] == 0
    assert got[("xx", "empty")]["fertility_permille"] == -1
    assert got[("xx", "empty")]["bytes_per_token_milli"] == -1


# ----------------------------------------- context length fit (r11)
def test_context_fit_hand_computed_and_invariants(spark, tmp_path):
    """Planted token counts with hand-computed truncation/padding at each
    L, plus the algebraic invariants that hold on any corpus."""
    texts = {
        1: "w",                 # 1 token
        2: " ".join(["w"] * 200),   # 200 tokens
        3: " ".join(["w"] * 600),   # 600 tokens
        4: " ".join(["w"] * 2000),  # 2000 tokens
    }
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in texts.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(out + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    compare(
        context_length_fit(spark, out),
        con,
        TRAIN_ORACLES["train_context_length_fit"],
    )
    rows = {
        r["context_len"]: r for r in context_length_fit(spark, out).collect()
    }
    assert set(rows) == set(CONTEXT_LENGTHS)
    # L=128: fits {1}; truncation (200-128)+(600-128)+(2000-128)=2516
    assert rows[128]["n_docs_fit"] == 1
    assert rows[128]["tokens_truncated"] == 72 + 472 + 1872
    assert rows[128]["padding_tokens"] == 127
    # L=1024: fits {1,200,600}; truncated 2000-1024=976
    assert rows[1024]["n_docs_fit"] == 3
    assert rows[1024]["tokens_truncated"] == 976
    assert rows[1024]["padding_tokens"] == (1024 - 1) + (1024 - 200) + (
        1024 - 600
    )
    total_tokens = 1 + 200 + 600 + 2000
    lengths = sorted(CONTEXT_LENGTHS)
    for i, length in enumerate(lengths):
        r = rows[length]
        assert r["tokens_kept"] + r["tokens_truncated"] == total_tokens
        assert r["utilization_permille"] == (1000 * r["tokens_kept"]) // (
            length * r["n_docs"]
        )
        if i:
            prev = rows[lengths[i - 1]]
            assert r["n_docs_fit"] >= prev["n_docs_fit"]
            assert r["tokens_truncated"] <= prev["tokens_truncated"]


# ----------------------------------- cluster size histogram (r11)
def test_cluster_histogram_partitions_the_corpus(spark, sf_dir):
    """Σ n_docs across sizes == |documents| (singletons included), and
    the size ≥ 2 mass equals the connected-components frame exactly."""
    n_total = load_table(spark, sf_dir, "documents").count()
    rows = cluster_size_histogram(spark, sf_dir).collect()
    assert sum(r["n_docs"] for r in rows) == n_total
    comp_rows = connected_components(spark, sf_dir).count()
    assert (
        sum(r["n_docs"] for r in rows if r["cluster_size"] >= 2) == comp_rows
    )
    for r in rows:
        assert r["n_docs"] == r["cluster_size"] * r["n_clusters"]
        assert r["n_docs_removed"] == (r["cluster_size"] - 1) * r["n_clusters"]


def test_cluster_histogram_planted_clusters(spark, tmp_path):
    """3 identical docs + 2 identical docs + 1 unique → rows (1,1), (2,1),
    (3,1); oracle-compared on the same corpus."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different words about spark shuffles and parquet files"
    docs = {1: a, 2: a, 3: a, 4: b, 5: b,
            6: "unique text with its own distinct shingle set entirely"}
    out = str(tmp_path / "corpus")
    spark.createDataFrame(
        [(i, t, "en", "synthetic", len(t)) for i, t in docs.items()],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(out + "/documents.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{out}/documents.parquet/*.parquet'"
    )
    compare(
        cluster_size_histogram(spark, out),
        con,
        DEDUP_ORACLES["dedup_cluster_size_histogram"],
    )
    got = {
        r["cluster_size"]: r["n_clusters"]
        for r in cluster_size_histogram(spark, out).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1}


# ------------------------------------------- LTTB downsampling (r11)
def _events_dir(spark, tmp_path, rows) -> tuple[str, object]:
    """rows: (event_id, ts, user_id, event_type, value, props)."""
    out = str(tmp_path / "evcorpus")
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp_ntz, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(out + "/events.parquet")
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS "
        f"SELECT * FROM '{out}/events.parquet/*.parquet'"
    )
    return out, con


def test_lttb_keeps_the_spike_and_the_endpoints(spark, tmp_path):
    """A flat series with one spike in a middle bucket: LTTB must keep
    the spike point there (max triangle area against the flat neighbour
    centroids), the first bucket's EARLIEST point, and the last bucket's
    LATEST point — the canonical property avg/OHLC-close downsampling
    lacks. Oracle-compared on the same corpus."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows = []
    eid = 0
    # buckets 0..3, four points each, value 10.0 everywhere except one
    # 500.0 spike as the SECOND point of bucket 2
    for b in range(4):
        for i in range(4):
            val = 500.0 if (b == 2 and i == 1) else 10.0
            rows.append(
                (eid, base + dt.timedelta(seconds=b * LTTB_BUCKET_SEC + i * 600 + 60),
                 1, "view", val, "{}")
            )
            eid += 1
    out, con = _events_dir(spark, tmp_path, rows)
    compare(downsample_lttb(spark, out), con, TS_ORACLES["time_downsample_lttb"])
    got = {r["bucket"]: r for r in downsample_lttb(spark, out).collect()}
    assert len(got) == 4
    buckets = sorted(got)
    first, last = got[buckets[0]], got[buckets[-1]]
    assert first["kind"] == "first" and first["event_id"] == 0
    assert last["kind"] == "last" and last["event_id"] == 15
    spike_bucket = got[buckets[2]]
    assert spike_bucket["kind"] == "mid"
    assert spike_bucket["event_id"] == 9  # the 500.0 spike point
    assert spike_bucket["cents"] == 50000
    assert spike_bucket["n_pts"] == 4


def test_lttb_tie_break_and_single_bucket_user(spark, tmp_path):
    """All-identical values in a mid bucket tie on area 0 → the
    (sec, event_id) break keeps the earliest point; a user whose events
    all land in one bucket is kind 'first' and keeps its earliest."""
    import datetime as dt

    base = dt.datetime(2024, 3, 1)
    rows = []
    # user 1: three buckets, mid bucket has identical values (area ties)
    eid = 100
    for b in range(3):
        for i in range(3):
            rows.append(
                (eid, base + dt.timedelta(seconds=b * LTTB_BUCKET_SEC + i * 900),
                 1, "view", 25.0, "{}")
            )
            eid += 1
    # user 2: single bucket
    rows.append((200, base + dt.timedelta(seconds=500), 2, "view", 1.25, "{}"))
    rows.append((201, base + dt.timedelta(seconds=400), 2, "view", 9.75, "{}"))
    out, con = _events_dir(spark, tmp_path, rows)
    compare(downsample_lttb(spark, out), con, TS_ORACLES["time_downsample_lttb"])
    rows_out = downsample_lttb(spark, out).collect()
    u1 = sorted(
        (r for r in rows_out if r["user_id"] == 1), key=lambda r: r["bucket"]
    )
    assert [r["kind"] for r in u1] == ["first", "mid", "last"]
    # mid bucket: every area is 0 (collinear flat series) → earliest wins
    assert u1[1]["event_id"] == 103
    # last bucket keeps the LATEST point
    assert u1[2]["event_id"] == 108
    (u2,) = [r for r in rows_out if r["user_id"] == 2]
    assert u2["kind"] == "first" and u2["event_id"] == 201  # earliest sec


def test_lttb_output_is_one_row_per_nonempty_bucket(spark, sf_dir):
    """Row count == distinct (user, bucket) pairs — the downsampling
    ratio is structural, and kinds partition correctly per user."""
    from pyspark.sql import functions as F

    from parquet_near_storage_compute_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.expr(
            f"unix_timestamp(ts) div {LTTB_BUCKET_SEC}"
        ).alias("bucket"),
    )
    n_buckets = ev.distinct().count()
    out = downsample_lttb(spark, sf_dir)
    rows = out.collect()
    assert len(rows) == n_buckets
    per_user: dict[int, list] = {}
    for r in rows:
        per_user.setdefault(r["user_id"], []).append(r)
    for _user, rs in per_user.items():
        kinds = [r["kind"] for r in sorted(rs, key=lambda r: r["bucket"])]
        if len(kinds) == 1:
            assert kinds == ["first"]
        else:
            assert kinds[0] == "first" and kinds[-1] == "last"
            assert all(k == "mid" for k in kinds[1:-1])


def test_lttb_product_overflow_regime_decimal_exact(spark, tmp_path):
    """r12 (ADVICE): the triangle-area score multiplies two int64-bounded
    factors, so at ~year-long neighbour gaps × large cents spreads the raw
    int64 PRODUCT wraps at just ~hundreds of points per bucket — the old
    form silently picked a wrong argmax while DuckDB raised. The products
    now run in DECIMAL(38,0) / HUGEINT. This corpus is built INSIDE the
    wrap regime (asserted below) and checks (a) the engines still agree
    and (b) the kept point is the exact-arithmetic argmax."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    year = dt.timedelta(days=365)
    rows = []
    eid = 0
    # prev bucket: 200 points, cents 0, at T0
    for i in range(200):
        rows.append((eid, base + dt.timedelta(seconds=i * 60), 1,
                     "view", 0.0, "{}"))
        eid += 1
    # mid bucket: 5 points one year later, small varying cents
    mid_vals = [1.0, 2.0, 3.0, 5.0, 4.0]
    for i, v in enumerate(mid_vals):
        rows.append((eid, base + year + dt.timedelta(seconds=i * 60), 1,
                     "view", v, "{}"))
        eid += 1
    # next bucket: 200 points two years later, cents 1e9 ($10M)
    for i in range(200):
        rows.append((eid, base + 2 * year + dt.timedelta(seconds=i * 60),
                     1, "view", 1.0e7, "{}"))
        eid += 1
    out, con = _events_dir(spark, tmp_path, rows)

    # exact reference argmax (Python ints never wrap) + wrap-regime proof
    def sec_of(ts):
        return int(ts.timestamp())

    prev = [(sec_of(base + dt.timedelta(seconds=i * 60)), 0)
            for i in range(200)]
    mid = [(sec_of(base + year + dt.timedelta(seconds=i * 60)),
            round(v * 100)) for i, v in enumerate(mid_vals)]
    nxt = [(sec_of(base + 2 * year + dt.timedelta(seconds=i * 60)),
            int(1.0e9)) for i in range(200)]
    pn, pt, pv = len(prev), sum(t for t, _ in prev), sum(c for _, c in prev)
    nn, nt, nv = len(nxt), sum(t for t, _ in nxt), sum(c for _, c in nxt)
    scores = []
    for sec, cents in mid:
        p1 = (pt - pn * sec) * (nv - nn * cents)
        p2 = (pv - pn * cents) * (nt - nn * sec)
        scores.append((abs(p1 - p2), p1))
    assert max(abs(p1) for _, p1 in scores) > 2**63  # inside wrap regime
    best_i = max(range(len(mid)), key=lambda i: (scores[i][0], -mid[i][0]))
    want_eid = 200 + best_i

    compare(downsample_lttb(spark, out), con,
            TS_ORACLES["time_downsample_lttb"])
    got = sorted(downsample_lttb(spark, out).collect(),
                 key=lambda r: r["bucket"])
    assert [r["kind"] for r in got] == ["first", "mid", "last"]
    assert got[1]["event_id"] == want_eid
