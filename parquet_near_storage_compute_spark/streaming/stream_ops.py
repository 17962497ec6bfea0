"""Structured Streaming surface (beyond reference: SURVEY.md §2.9 notes the
reference has no streaming at all; this is the engine-completeness layer).

Pattern: file-source ``readStream`` over the same parquet tables →
transformations → ``writeStream`` to a memory sink with
``Trigger.AvailableNow`` — the batch-equivalent execution of a streaming
query, which makes results deterministic and therefore DuckDB-oracle
comparable. At scale the identical query runs against a live source
(Kafka/files) with watermarked state eviction.

When the events table stores TIMESTAMP(NANOS), the stream reads the raw
long (nanosAsLong) and rebuilds a microsecond timestamp, same as tables.py;
when it stores microsecond timestamps the scan is used as-is. The guard is
on the inferred dtype, so both generations of the driver testdata work.
"""

from __future__ import annotations

import os
import uuid
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from parquet_near_storage_compute_spark.tables import table_path

_FMT = "yyyy-MM-dd HH:mm:ss"

#: scratch area for checkpoints (inside the repo; gitignored)
_SCRATCH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__)))), ".tmp")


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming scan of the events table with the ns→µs timestamp rebuild."""
    from parquet_near_storage_compute_spark.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    path = table_path(sf_dir, "events")
    schema = spark.read.parquet(path).schema
    # FileStreamSource wants a directory/glob, not a bare file path
    stream = spark.readStream.schema(schema).parquet(
        f"{sf_dir.rstrip('/')}/events*.parquet"
    )
    # same dtype guard as tables.load_table: only a TIMESTAMP(NANOS) file
    # (read as long via nanosAsLong) needs the ns→µs rebuild
    if isinstance(schema["ts"].dataType, T.LongType):
        stream = stream.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
    elif isinstance(schema["ts"].dataType, T.TimestampNTZType):
        # watermarks require TIMESTAMP (with-tz); session tz is pinned UTC,
        # so this cast relabels without shifting the wall-clock value
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def _run_to_memory(df: DataFrame, mode: str) -> DataFrame:
    """Execute with AvailableNow into a memory sink; return the batch view.

    Streaming plans can't use AQE's partition coalescing, so a default
    200-partition shuffle runs 200 near-empty state tasks; pin a moderate
    count for the query's scope and restore the caller's setting after."""
    spark = df.sparkSession
    name = f"mem_{uuid.uuid4().hex[:12]}"
    ckpt = os.path.join(_SCRATCH, "checkpoints", name)
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        if int(prev) > 64:
            spark.conf.set(key, "32")
        q = (
            df.writeStream.format("memory")
            .queryName(name)
            .outputMode(mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, prev)
    return spark.table(name)


def windowed_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming tumbling-window aggregation (1h windows, watermarked) run to
    completion — the Structured Streaming twin of time_tumbling_hourly."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"), F.col("event_type"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format("w.start", _FMT).alias("hour_start"),
        "event_type",
        "n_events",
        "sum_value",
    )


def sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding-window aggregation (2h window every 1h,
    watermarked) — the Structured Streaming twin of time_sliding_window:
    each event contributes to two overlapping windows, the state store
    keys on (window, nothing else). The watermark matters only in an
    append-mode production run, where it bounds retained windows to ~2
    slide intervals behind the max event time; this demo runs in complete
    mode for a deterministic full-history result, and complete mode never
    evicts window state (same honest framing as windowed_counts)."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "complete")
    return out.select(
        F.date_format("w.start", _FMT).alias("win_start"),
        F.date_format("w.end", _FMT).alias("win_end"),
        "n_events",
    )


def append_closed_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Append-mode watermarked tumbling counts (round 4) — the streaming
    contract where the watermark is LOAD-BEARING, not inert: append mode
    emits a window only once the watermark (max event time − 1h) passes
    its end, so the trailing still-open windows are withheld from the
    result and evicted state is what production would actually free. Over
    the static corpus via AvailableNow this is deterministic: emitted
    windows are exactly those with end ≤ max(ts) − 1h, which is what the
    DuckDB oracle computes. Complete-mode twins (windowed_counts,
    sliding_counts) keep the full-history view; this one proves the
    eviction semantics."""
    ev = _events_stream(spark, sf_dir)
    agg = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(agg, "append")
    return out.select(
        F.date_format("w.start", _FMT).alias("win_start"),
        F.date_format("w.end", _FMT).alias("win_end"),
        "n_events",
    ).orderBy("win_start")


def _user_stats_fn(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Custom stateful operator: running per-user event count + value sum.

    The state tuple survives across micro-batches; with AvailableNow over a
    static table it processes one batch and emits the final state.

    Bit-exact since r10 (VERDICT r9 #6): the value sum is carried as
    integer CENTS in the state (events.value is 2-decimal money), so the
    emitted total no longer depends on micro-batch arrival order or on
    pandas' accumulation tree; the single cents/100.0 on emit is exactly
    determined. Values are near-integer after *100 (2-decimal money), so
    numpy's half-even rounding agrees with ROUND() in Spark/DuckDB."""
    (user_id,) = key
    if state.exists:
        n, cents = state.get
    else:
        n, cents = 0, 0
    for pdf in pdfs:
        n += len(pdf)
        cents += int((pdf["value"] * 100).round().astype("int64").sum())
    state.update((n, cents))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [cents / 100.0]}
    )


def stateful_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState: arbitrary stateful per-user aggregation."""
    ev = _events_stream(spark, sf_dir)
    stats = ev.groupBy("user_id").applyInPandasWithState(
        _user_stats_fn,
        outputStructType="user_id bigint, n_events bigint, total_value double",
        stateStructType="n bigint, cents bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return _run_to_memory(stats, "update")


def stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming exact dedup: drop repeated (user_id, event_type) arrivals
    inside the watermark horizon — the streaming half of the dedup family
    (state is evicted once the watermark passes, bounding memory at 100 TB/day
    rates). With AvailableNow over static data every duplicate is in-horizon,
    so the result equals a batch DISTINCT and stays oracle-comparable."""
    ev = _events_stream(spark, sf_dir)
    deduped = (
        ev.withWatermark("ts", "10 minutes")
        .dropDuplicatesWithinWatermark(["user_id", "event_type"])
        .select("user_id", "event_type")
    )
    out = _run_to_memory(deduped, "append")
    return out.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_users"))


def stream_stream_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermarked stream-stream inner join: per user, purchases within 30
    minutes after a click (the attribution join). Both sides carry
    watermarks and the join condition bounds event time on both ends, so
    Spark can evict join state once the watermark passes — the property
    that keeps state finite at 100 TB/day. With AvailableNow over static
    data every pair is in-horizon, so the result equals the batch
    time-range self-join and stays oracle-comparable.

    Output is the per-user attributed-pair count (aggregated post-join in
    batch over the memory sink, keeping the streaming plan join-only —
    stream-stream join + streaming agg in one plan needs multiple stateful
    operators in append mode, a documented Structured Streaming limit).
    """
    clicks = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", "1 hour")
    )
    purchases = (
        _events_stream(spark, sf_dir)
        .filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") > F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 30 MINUTES")),
        "inner",
    )
    out = _run_to_memory(joined.select("c_user", "p_value"), "append")
    return (
        out.groupBy(F.col("c_user").alias("user_id"))
        .agg(
            F.count(F.lit(1)).alias("n_attributed"),
            F.sum("p_value").alias("attributed_value"),
        )
        .orderBy("user_id")
    )


def session_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session windows (F.session_window, 30-min gap, keyed by
    user) — the Structured Streaming twin of time_session_window_native
    and the canonical merging-state operator: unlike tumbling/sliding
    windows, session state MERGES when a new event bridges two open
    sessions, so the state store does real coalescing work per key. In an
    append-mode production run the watermark closes sessions whose end
    precedes it (bounding open-session state per user); this demo runs
    complete mode over AvailableNow for a deterministic full-history
    result (same honest framing as windowed_counts). Outputs are
    integer-only — session boundaries and counts — so there is no float
    drift surface."""
    ev = _events_stream(spark, sf_dir)
    per_session = (
        ev.withWatermark("ts", "1 hour")
        .groupBy(
            "user_id", F.session_window("ts", "30 minutes").alias("w")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
    )
    out = _run_to_memory(per_session, "complete")
    return (
        out.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.max("n_events").alias("max_session_events"),
            F.sum("n_events").alias("n_events"),
        )
        .orderBy("user_id")
    )


def upsert_foreachbatch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming CDC apply via ``foreachBatch``: latest-wins upsert of each
    micro-batch into a parquet state table — the incremental form of
    `relational_merge_upsert` and the standard way to run MERGE logic from
    Structured Streaming when the sink is a plain file format (foreachBatch
    hands every micro-batch to arbitrary BATCH DataFrame code on the
    driver, so the union+window merge runs per batch instead of per day).

    Mechanics mirrored from production: the source is the events table
    split across 4 files, streamed with ``maxFilesPerTrigger=1`` so the
    merge genuinely executes 4 times incrementally; each merge writes a
    NEW generation directory and only then moves the current-state pointer
    (the same publish-after-write discipline as the Python-datasource
    manifest sink — a crashed batch leaves the previous generation
    intact). Version counts accumulate through the merges, so the final
    state must be identical to the one-shot batch merge over all events —
    which is exactly what the DuckDB oracle computes. At 100 TB each merge
    is one window shuffle of (state ∪ batch) on the merge key; partition
    the state by that key and only touched partitions rewrite.
    """
    import hashlib

    from pyspark.sql import Window

    from parquet_near_storage_compute_spark.tables import load_table

    src_path = table_path(sf_dir, "events")
    st = os.stat(src_path)
    key = hashlib.md5(
        f"{sf_dir}:{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    split_dir = os.path.join(_SCRATCH, f"upsert_src_{key}")
    cols = ["user_id", "event_id", "event_type", "value", "ts"]
    if not os.path.exists(os.path.join(split_dir, "_SUCCESS")):
        (
            load_table(spark, sf_dir, "events")
            .select(*cols)
            .repartition(4)
            .write.mode("overwrite")
            .parquet(split_dir)
        )

    run_dir = os.path.join(_SCRATCH, "upsert_state", uuid.uuid4().hex[:12])
    state = {"path": None}

    def _merge(batch: DataFrame, batch_id: int) -> None:
        batch = batch.select(*cols).withColumn(
            "n_versions", F.lit(1).cast("long")
        )
        if state["path"] is not None:
            prev = batch.sparkSession.read.parquet(state["path"])
            merged = prev.unionByName(batch)
        else:
            merged = batch
        w = Window.partitionBy("user_id").orderBy(
            F.col("ts").desc(), F.col("event_id").desc()
        )
        wc = Window.partitionBy("user_id")
        new_state = (
            merged.withColumn("rn", F.row_number().over(w))
            .withColumn("nv", F.sum("n_versions").over(wc))
            .filter(F.col("rn") == 1)
            .select(
                "user_id", "event_id", "event_type", "value", "ts",
                F.col("nv").alias("n_versions"),
            )
        )
        gen = os.path.join(run_dir, f"gen_{batch_id}")
        new_state.write.mode("overwrite").parquet(gen)  # write, THEN publish
        state["path"] = gen

    schema = spark.read.parquet(split_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(split_dir)
    )
    ckpt = os.path.join(_SCRATCH, "checkpoints", os.path.basename(run_dir))
    q = (
        stream.writeStream.foreachBatch(_merge)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["path"] is not None
    return spark.read.parquet(state["path"]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("event_type").alias("last_event_type"),
        F.floor(F.col("value") * 100).alias("last_value_cents"),
        "n_versions",
    )


#: Streaming perceptual ingest: pinned batch composition (id sets per
#: micro-batch) over the image-dedup fixture (24 bases 0-23, 3 perturbed
#: variants each of bases 0-7 at ids 1000-1023, exact byte copies of
#: base 0 at 1024/1025). Batch 0 deliberately carries the exact copies
#: WITH base 0 so the within-batch dedup branch executes against an
#: empty state; batches 3-4 are the re-encode waves the accepted state
#: must reject.
PHASH_INGEST_BATCHES: list[tuple[int, ...]] = [
    tuple(range(8)) + (1024, 1025),
    tuple(range(8, 16)),
    tuple(range(16, 24)),
    tuple(range(1000, 1012)),
    tuple(range(1012, 1024)),
]


def phash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming perceptual-dedup ingest — the streaming × modality
    bridge: micro-batches of image payloads arrive (file stream,
    ``maxFilesPerTrigger=1``, batch order pinned by file mtimes) and each
    batch is admitted against the ACCEPTED perceptual state via
    foreachBatch:

      1. pHash the batch (one Arrow-batched mapInPandas pass);
      2. reject rows whose hash lands within PHASH_HAMMING of any
         accepted hash — candidates from the 4×16-bit bands (equi-join,
         never all pairs), verified by exact Hamming;
      3. within the surviving batch rows, drop any row with a
         smaller-id survivor within PHASH_HAMMING (batch-local min-wins);
      4. append the accepted rows to a NEW state generation dir, then
         publish (write-then-move pointer, as `upsert_foreachbatch`).

    This is `dedup_incremental`'s perceptual sibling: a crawler ingesting
    re-encoded copies of known assets does exactly this loop. At 100 TB
    the state side is a parquet table banded-bucketed on hash bands; the
    per-batch join touches only matching band keys.

    The DuckDB oracle replays the SAME sequential admission with a
    recursive CTE carrying the accepted-hash list batch by batch (hashes
    re-derived member-level from payload hex via the shared image-hash
    CTE chain) — a full-hash external check of a streaming pipeline.
    Output: (img_id, phash, batch_no) for every ACCEPTED asset."""
    import hashlib

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_near_storage_compute_spark.operators import multimodal as M
    from parquet_near_storage_compute_spark.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    st = os.stat(M.IMG_DEDUP_FIXTURE)
    key = hashlib.md5(
        f"{st.st_mtime_ns}:{st.st_size}".encode()
    ).hexdigest()[:12]
    src_dir = os.path.join(_SCRATCH, f"phash_ingest_src_{key}")
    if not os.path.exists(os.path.join(src_dir, "_READY")):
        os.makedirs(src_dir, exist_ok=True)
        tbl = pq.read_table(M.IMG_DEDUP_FIXTURE, columns=["img_id", "payload"])
        ids = tbl.column("img_id").to_pylist()
        for b, batch_ids in enumerate(PHASH_INGEST_BATCHES):
            path = os.path.join(src_dir, f"batch_{b}.parquet")
            pq.write_table(
                tbl.filter(pa.array([i in batch_ids for i in ids])), path
            )
            # pinned mtimes: the file stream processes oldest-first, so
            # mtime order IS batch order
            os.utime(path, (1_600_000_000 + b, 1_600_000_000 + b))
        open(os.path.join(src_dir, "_READY"), "w").close()

    run_dir = os.path.join(_SCRATCH, "phash_state", uuid.uuid4().hex[:12])
    state: dict = {"path": None}
    ham = M.PHASH_HAMMING

    def hash_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "img_id": pdf["img_id"],
                    "phash": pdf["payload"].map(
                        lambda p: M.phash64(M.decode_image(p))
                    ),
                }
            )

    def bands(df: DataFrame, pre: str) -> DataFrame:
        return df.select(
            F.col("img_id").alias(f"{pre}id"),
            F.col("phash").alias(f"{pre}ph"),
            F.explode(
                F.array(*[F.lit(b) for b in range(M.PHASH_BANDS)])
            ).alias(f"{pre}band"),
        ).withColumn(
            f"{pre}key",
            F.expr(f"shiftright({pre}ph, 16 * {pre}band)").bitwiseAND(0xFFFF),
        )

    def _ingest(batch: DataFrame, bid: int) -> None:
        s = batch.sparkSession
        hashed = batch.select("img_id", "payload").mapInPandas(
            hash_batch, "img_id bigint, phash bigint"
        )
        prev = (
            s.read.parquet(state["path"]) if state["path"] is not None else None
        )
        if prev is not None:
            hit = (
                bands(hashed, "n_")
                .join(
                    bands(prev.select("img_id", "phash"), "s_"),
                    (F.col("n_band") == F.col("s_band"))
                    & (F.col("n_key") == F.col("s_key")),
                )
                .filter(
                    F.bit_count(F.col("n_ph").bitwiseXOR(F.col("s_ph"))) <= ham
                )
                .select(F.col("n_id").alias("img_id"))
                .distinct()
            )
            survivors = hashed.join(hit, "img_id", "left_anti")
        else:
            survivors = hashed
        wb = (
            bands(survivors, "a_")
            .join(
                bands(survivors, "b_"),
                (F.col("a_band") == F.col("b_band"))
                & (F.col("a_key") == F.col("b_key"))
                & (F.col("b_id") < F.col("a_id")),
            )
            .filter(F.bit_count(F.col("a_ph").bitwiseXOR(F.col("b_ph"))) <= ham)
            .select(F.col("a_id").alias("img_id"))
            .distinct()
        )
        accepted = survivors.join(wb, "img_id", "left_anti").withColumn(
            "batch_no", F.lit(bid).cast("int")
        )
        new_state = (
            accepted if prev is None else prev.unionByName(accepted)
        )
        gen = os.path.join(run_dir, f"gen_{bid}")
        new_state.write.mode("overwrite").parquet(gen)  # write, THEN publish
        state["path"] = gen

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    ckpt = os.path.join(_SCRATCH, "checkpoints", os.path.basename(run_dir))
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["path"] is not None
    return spark.read.parquet(state["path"]).select(
        "img_id", "phash", "batch_no"
    )


#: Number of micro-batches for the streaming MinHash admission (r12,
#: VERDICT r11 #4). Batch membership is doc_id % N — deterministic and
#: SQL-replayable, so the DuckDB oracle can reconstruct the exact batch
#: sequence without a side channel. Exact duplicate PAIRS in the corpus
#: land in the same batch iff their ids are congruent mod N, so both the
#: state-rejection branch and the within-batch min-wins branch execute on
#: the committed corpora (asserted in tests/test_minhash_ingest.py).
MINHASH_INGEST_BATCHES = 4

#: Near-dup admission threshold: exact shingle-Jaccard ≥ 0.5, the same
#: bar `dedup_ngram_jaccard` verifies at — compared as 2·|A∩B| ≥ |A∪B|
#: (integer algebra, no float boundary to flip between engines).
MINHASH_INGEST_J_NUM = 2


def minhash_ingest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming MinHash admission — the TEXT sibling of
    ``stream_phash_ingest``, closing the modality matrix's last asymmetry
    (VERDICT r11 #4): images had stateful streaming admission, text
    MinHash only the batch-vs-corpus ``dedup_incremental``. Micro-batches
    of documents (file stream, ``maxFilesPerTrigger=1``, batch order
    pinned by file mtimes, membership = doc_id % MINHASH_INGEST_BATCHES)
    are admitted against the ACCEPTED signature state via foreachBatch:

      1. MinHash the batch (the shared `_minhash_signatures` pipeline —
         k=8 md5-sliced mins over distinct 3-word shingles) and build its
         banded keys (`_bands`, 4 bands × 2 rows);
      2. reject rows sharing ANY band hash with an accepted doc whose
         exact shingle-Jaccard is ≥ 0.5 (banded state join → exact
         verify on candidates only — the two-phase near-dup discipline,
         never all pairs);
      3. within the surviving batch rows, drop any row with a smaller-id
         survivor passing the same band+Jaccard test (min-wins);
      4. append the accepted rows (id, signature, shingle set) to a NEW
         state generation dir, then publish (write-then-move pointer, as
         `upsert_foreachbatch` / `phash_ingest`).

    Documents with no 3-shingle (< 3 words) have no signature and no
    bands — they are admitted unconditionally, exactly as every batch
    MinHash contract treats them (absent from the signature frame).

    At 100 TB the accepted state is a parquet table banded-bucketed on
    (band, bh) with the hot-bucket cap `_banded_buckets` applies in the
    batch contracts (a boilerplate band key would otherwise make every
    later micro-batch join quadratic in its bucket); at the committed
    SFs the plain band equi-join is the same plan AQE picks. State
    carries the shingle sets so the exact verify never re-reads the
    lake; a deployment can instead re-scan the accepted docs' text
    column (column-pruned) and trade storage for I/O.

    The DuckDB oracle replays the SAME sequential admission with a
    recursive CTE carrying the accepted-id list batch by batch, over a
    band+Jaccard pair table re-derived member-level from the text via
    the shared shingle/minhash SQL (bit-identical signatures). Output:
    (doc_id, batch_no) for every ACCEPTED document."""
    import hashlib

    from parquet_near_storage_compute_spark.operators.dedup import (
        _bands,
        _minhash_signatures,
    )
    from parquet_near_storage_compute_spark.functions.text import (
        shingles,
        words,
    )
    from parquet_near_storage_compute_spark.plans.memo import _fingerprint
    from parquet_near_storage_compute_spark.tables import ensure_engine_confs

    ensure_engine_confs(spark)
    key = hashlib.md5(
        repr(_fingerprint(sf_dir, ("documents",))).encode()
    ).hexdigest()[:12]
    src_dir = os.path.join(_SCRATCH, f"minhash_ingest_src_{key}")
    if not os.path.exists(os.path.join(src_dir, "_READY")):
        import pyarrow as pa
        import pyarrow.parquet as pq

        os.makedirs(src_dir, exist_ok=True)
        tbl = pq.read_table(
            table_path(sf_dir, "documents"), columns=["doc_id", "text"]
        )
        bno = tbl.column("doc_id").to_numpy() % MINHASH_INGEST_BATCHES
        for b in range(MINHASH_INGEST_BATCHES):
            path = os.path.join(src_dir, f"batch_{b}.parquet")
            pq.write_table(tbl.filter(pa.array(bno == b)), path)
            # pinned mtimes: the file stream processes oldest-first, so
            # mtime order IS batch order
            os.utime(path, (1_600_000_000 + b, 1_600_000_000 + b))
        open(os.path.join(src_dir, "_READY"), "w").close()

    run_dir = os.path.join(_SCRATCH, "minhash_state", uuid.uuid4().hex[:12])
    state: dict = {"path": None}

    def _near(a_sets: str, b_sets: str):
        inter = F.size(F.array_intersect(a_sets, b_sets)).cast("bigint")
        union = (
            F.size(a_sets).cast("bigint")
            + F.size(b_sets).cast("bigint")
            - inter
        )
        return MINHASH_INGEST_J_NUM * inter >= union

    def _ingest(batch: DataFrame, bid: int) -> None:
        s = batch.sparkSession
        sig = _minhash_signatures(batch)
        sets = batch.select(
            "doc_id",
            F.array_distinct(shingles(words("text"), 3)).alias("sset"),
        )
        cur = sets.join(sig, "doc_id", "left")  # shingle-less: null mh*
        prev = (
            s.read.parquet(state["path"]) if state["path"] is not None else None
        )
        mh_cols = [f"mh{j}" for j in range(8)]

        def _doc_bands(df: DataFrame, pre: str) -> DataFrame:
            return _bands(
                df.select("doc_id", "sset", *mh_cols), ("sset",)
            ).select(
                F.col("doc_id").alias(f"{pre}id"),
                F.col("sset").alias(f"{pre}sset"),
                F.col("band").alias(f"{pre}band"),
                F.col("bh").alias(f"{pre}bh"),
            )

        if prev is not None:
            hit = (
                _doc_bands(cur.filter(F.col("mh0").isNotNull()), "n_")
                .join(
                    _doc_bands(prev.filter(F.col("mh0").isNotNull()), "s_"),
                    (F.col("n_band") == F.col("s_band"))
                    & (F.col("n_bh") == F.col("s_bh")),
                )
                .filter(_near("n_sset", "s_sset"))
                .select(F.col("n_id").alias("doc_id"))
                .distinct()
            )
            survivors = cur.join(hit, "doc_id", "left_anti")
        else:
            survivors = cur
        sb = _doc_bands(survivors.filter(F.col("mh0").isNotNull()), "a_")
        wb = (
            sb.join(
                sb.select(
                    F.col("a_id").alias("b_id"),
                    F.col("a_sset").alias("b_sset"),
                    F.col("a_band").alias("b_band"),
                    F.col("a_bh").alias("b_bh"),
                ),
                (F.col("a_band") == F.col("b_band"))
                & (F.col("a_bh") == F.col("b_bh"))
                & (F.col("b_id") < F.col("a_id")),
            )
            .filter(_near("a_sset", "b_sset"))
            .select(F.col("a_id").alias("doc_id"))
            .distinct()
        )
        accepted = survivors.join(wb, "doc_id", "left_anti").withColumn(
            "batch_no", F.lit(bid).cast("int")
        )
        new_state = (
            accepted if prev is None else prev.unionByName(accepted)
        )
        gen = os.path.join(run_dir, f"gen_{bid}")
        new_state.write.mode("overwrite").parquet(gen)  # write, THEN publish
        state["path"] = gen

    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )
    ckpt = os.path.join(_SCRATCH, "checkpoints", os.path.basename(run_dir))
    q = (
        stream.writeStream.foreachBatch(_ingest)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert state["path"] is not None
    return spark.read.parquet(state["path"]).select("doc_id", "batch_no")


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "stream_windowed_counts": windowed_counts,
    "stream_stateful_user_stats": stateful_user_stats,
    "stream_dedup_exact": stream_dedup,
    "stream_stream_join": stream_stream_join,
    "stream_sliding_counts": sliding_counts,
    "stream_append_closed_windows": append_closed_windows,
    "stream_session_windows": session_windows,
    "stream_upsert_foreachbatch": upsert_foreachbatch,
    "stream_phash_ingest": phash_ingest,
    "stream_minhash_ingest": minhash_ingest,
}


def _phash_ingest_oracle() -> str:
    """Sequential replay of the streaming admission in DuckDB: a recursive
    CTE carries the accepted-hash LIST batch by batch; per batch a row is
    admitted iff no accepted hash is within PHASH_HAMMING AND no
    smaller-id state-surviving row of the same batch is. Hashes come from
    the shared member-level image-hash CTE chain (multimodal.py) — so the
    external check re-derives the hashes from payload bytes AND replays
    the stream's admission order."""
    from parquet_near_storage_compute_spark.operators import multimodal as M

    case_sql = (
        "CASE "
        + " ".join(
            f"WHEN img_id IN ({', '.join(map(str, ids))}) THEN {b}"
            for b, ids in enumerate(PHASH_INGEST_BATCHES)
        )
        + " END"
    )
    last = len(PHASH_INGEST_BATCHES) - 1
    ham = M.PHASH_HAMMING
    near = "len(list_filter(r.acc, h -> bit_count(xor(h, {x})) <= %d)) = 0" % ham
    return f"""
        WITH RECURSIVE {M.PHASH_HSH_CTES},
        batches AS (
          SELECT img_id, phash, {case_sql} AS bno FROM hsh
        ),
        rec AS (
          SELECT -1 AS bno, CAST([] AS BIGINT[]) AS acc
          UNION ALL
          SELECT r.bno + 1,
                 r.acc || COALESCE((
                   SELECT list(s.phash ORDER BY s.img_id) FROM batches s
                   WHERE s.bno = r.bno + 1
                     AND {near.format(x='s.phash')}
                     AND NOT EXISTS (
                       SELECT 1 FROM batches t
                       WHERE t.bno = s.bno AND t.img_id < s.img_id
                         AND bit_count(xor(t.phash, s.phash)) <= {ham}
                         AND {near.format(x='t.phash')})
                 ), [])
          FROM rec r WHERE r.bno < {last}
        )
        SELECT s.img_id, s.phash, CAST(s.bno AS INT) AS batch_no
        FROM batches s JOIN rec r ON r.bno = s.bno - 1
        WHERE {near.format(x='s.phash')}
          AND NOT EXISTS (
            SELECT 1 FROM batches t
            WHERE t.bno = s.bno AND t.img_id < s.img_id
              AND bit_count(xor(t.phash, s.phash)) <= {ham}
              AND {near.format(x='t.phash')})
    """

def _minhash_ingest_oracle() -> str:
    """Sequential replay of the streaming MinHash admission in DuckDB:
    the band+Jaccard near-dup PAIR table is derived once member-level
    from the text (the shared shingle/minhash SQL — signatures
    bit-identical to functions/text.py), then a recursive CTE carries
    the accepted-id list batch by batch with the same two rejection
    branches the stream applies (vs state, then min-wins within the
    state-surviving batch rows)."""
    nb = MINHASH_INGEST_BATCHES
    last = nb - 1
    return f"""
        WITH RECURSIVE
        base AS (
          SELECT doc_id, CAST(doc_id % {nb} AS INT) AS bno,
                 string_split(text, ' ') AS ws
          FROM documents
        ),
        sh AS (
          SELECT doc_id,
                 unnest(list_distinct(list_transform(
                   CASE WHEN len(ws) >= 3 THEN range(len(ws)-2) ELSE [] END,
                   i -> array_to_string(ws[i+1:i+3], ' ')))) AS s
          FROM base
        ),
        sets AS (SELECT doc_id, list(DISTINCT s) AS sset FROM sh
                 GROUP BY doc_id),
        mh AS (
          SELECT doc_id,
                 min(substr(md5('0:'||s),  1, 8)) AS mh0,
                 min(substr(md5('0:'||s),  9, 8)) AS mh1,
                 min(substr(md5('0:'||s), 17, 8)) AS mh2,
                 min(substr(md5('0:'||s), 25, 8)) AS mh3,
                 min(substr(md5('1:'||s),  1, 8)) AS mh4,
                 min(substr(md5('1:'||s),  9, 8)) AS mh5,
                 min(substr(md5('1:'||s), 17, 8)) AS mh6,
                 min(substr(md5('1:'||s), 25, 8)) AS mh7
          FROM sh GROUP BY doc_id
        ),
        bands AS (
          SELECT doc_id, 0 AS band, md5(mh0||'|'||mh1) AS bh FROM mh
          UNION ALL SELECT doc_id, 1, md5(mh2||'|'||mh3) FROM mh
          UNION ALL SELECT doc_id, 2, md5(mh4||'|'||mh5) FROM mh
          UNION ALL SELECT doc_id, 3, md5(mh6||'|'||mh7) FROM mh
        ),
        pairs AS (
          -- directed: da is rejected by db (any band shared, J >= 0.5
          -- as 2*inter >= union — integer algebra, both engines)
          SELECT DISTINCT a.doc_id AS da, b.doc_id AS db
          FROM bands a
          JOIN bands b ON a.band = b.band AND a.bh = b.bh
                       AND a.doc_id <> b.doc_id
          JOIN sets sa ON sa.doc_id = a.doc_id
          JOIN sets sb ON sb.doc_id = b.doc_id
          WHERE {MINHASH_INGEST_J_NUM} * len(list_intersect(sa.sset, sb.sset))
                >= len(sa.sset) + len(sb.sset)
                   - len(list_intersect(sa.sset, sb.sset))
        ),
        rec AS (
          SELECT -1 AS bno, CAST([] AS BIGINT[]) AS acc
          UNION ALL
          SELECT r.bno + 1,
                 r.acc || COALESCE((
                   SELECT list(s.doc_id ORDER BY s.doc_id) FROM base s
                   WHERE s.bno = r.bno + 1
                     AND NOT EXISTS (SELECT 1 FROM pairs p
                       WHERE p.da = s.doc_id AND list_contains(r.acc, p.db))
                     AND NOT EXISTS (
                       SELECT 1 FROM base t
                       JOIN pairs p2 ON p2.da = s.doc_id
                                    AND p2.db = t.doc_id
                       WHERE t.bno = s.bno AND t.doc_id < s.doc_id
                         AND NOT EXISTS (SELECT 1 FROM pairs p3
                           WHERE p3.da = t.doc_id
                             AND list_contains(r.acc, p3.db)))
                 ), [])
          FROM rec r WHERE r.bno < {last}
        )
        SELECT s.doc_id, CAST(s.bno AS INT) AS batch_no
        FROM base s JOIN rec r ON r.bno = s.bno - 1
        WHERE NOT EXISTS (SELECT 1 FROM pairs p
                WHERE p.da = s.doc_id AND list_contains(r.acc, p.db))
          AND NOT EXISTS (
            SELECT 1 FROM base t
            JOIN pairs p2 ON p2.da = s.doc_id AND p2.db = t.doc_id
            WHERE t.bno = s.bno AND t.doc_id < s.doc_id
              AND NOT EXISTS (SELECT 1 FROM pairs p3
                WHERE p3.da = t.doc_id AND list_contains(r.acc, p3.db)))
    """


ORACLE_SQL: dict[str, str] = {
    "stream_phash_ingest": _phash_ingest_oracle(),
    "stream_minhash_ingest": _minhash_ingest_oracle(),
    # the incremental foreachBatch merge must converge to the one-shot
    # batch merge — same SQL as relational_merge_upsert's oracle
    "stream_upsert_foreachbatch": """
        SELECT user_id,
               event_id AS last_event_id,
               event_type AS last_event_type,
               CAST(floor(value * 100) AS BIGINT) AS last_value_cents,
               n_versions
        FROM (
          SELECT user_id, event_id, event_type, value,
                 ROW_NUMBER() OVER (PARTITION BY user_id
                                    ORDER BY ts DESC, event_id DESC) AS rn,
                 CAST(COUNT(*) OVER (PARTITION BY user_id) AS BIGINT)
                   AS n_versions
          FROM events
        ) WHERE rn = 1
    """,
    # identical islands logic to the time_session_window_native oracle
    # (new session when ts >= prev + gap), reduced to integer counts
    "stream_session_windows": """
        WITH flagged AS (
          SELECT user_id, ts, event_id,
                 CASE WHEN LAG(ts) OVER w IS NULL
                        OR ts >= LAG(ts) OVER w + INTERVAL 30 MINUTE
                      THEN 1 ELSE 0 END AS new_session
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessioned AS (
          SELECT user_id,
                 SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS session_id
          FROM flagged
        ),
        per_session AS (
          SELECT user_id, session_id, COUNT(*) AS n
          FROM sessioned GROUP BY user_id, session_id
        )
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(MAX(n) AS BIGINT) AS max_session_events,
               CAST(SUM(n) AS BIGINT) AS n_events
        FROM per_session GROUP BY user_id ORDER BY user_id
    """,
    "stream_windowed_counts": """
        SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
               event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(value) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2
    """,
    "stream_sliding_counts": """
        -- same expansion as the batch time_sliding_window oracle: each
        -- event belongs to [trunc(ts)-1h, +2h) and [trunc(ts), +2h)
        WITH expanded AS (
          SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS win_start FROM events
          UNION ALL
          SELECT date_trunc('hour', ts) AS win_start FROM events
        )
        SELECT strftime(win_start, '%Y-%m-%d %H:%M:%S') AS win_start,
               strftime(win_start + INTERVAL 2 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
               CAST(COUNT(*) AS BIGINT) AS n_events
        FROM expanded GROUP BY 1, 2
    """,
    "stream_append_closed_windows": """
        -- append-mode emission rule: a window surfaces only when the
        -- watermark (max event time - 1h) has passed its end
        WITH wm AS (SELECT MAX(ts) - INTERVAL 1 HOUR AS w FROM events),
        b AS (
          SELECT date_trunc('hour', ts) AS h,
                 CAST(COUNT(*) AS BIGINT) AS n_events
          FROM events GROUP BY 1
        )
        SELECT strftime(h, '%Y-%m-%d %H:%M:%S') AS win_start,
               strftime(h + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS win_end,
               n_events
        FROM b, wm
        WHERE h + INTERVAL 1 HOUR <= wm.w
        ORDER BY win_start
    """,
    "stream_stateful_user_stats": """
        -- integer-cents sum (r10): order-free integer addition, one
        -- exactly-determined /100.0 on emit — bit-exact vs Spark
        SELECT user_id,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
                   / 100.0 AS total_value
        FROM events GROUP BY user_id
    """,
    "stream_dedup_exact": """
        SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM events GROUP BY event_type
    """,
    "stream_stream_join": """
        -- ts truncated to MICROSECONDS on both sides: the Spark plan
        -- compares timestamp_micros(ts div 1000) (the nanos rebuild), so
        -- the oracle must band/compare at the same precision rather than
        -- native TIMESTAMP_NS (ADVICE r2 — lossless today, but this pins
        -- it against sub-microsecond fixtures)
        WITH c AS (SELECT user_id, make_timestamp(epoch_ns(ts)//1000) AS ts
                   FROM events WHERE event_type = 'click'),
             p AS (SELECT user_id, make_timestamp(epoch_ns(ts)//1000) AS ts,
                          value
                   FROM events WHERE event_type = 'purchase')
        SELECT c.user_id,
               CAST(COUNT(*) AS BIGINT) AS n_attributed,
               CAST(SUM(p.value) AS DOUBLE) AS attributed_value
        FROM c JOIN p ON c.user_id = p.user_id
                     AND p.ts > c.ts
                     AND p.ts <= c.ts + INTERVAL 30 MINUTE
        GROUP BY c.user_id ORDER BY c.user_id
    """,
}
