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
