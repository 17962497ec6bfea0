"""SparkSession factory with scale-aware defaults.

The reference engines hard-code their parallelism (16 tasks x 40 files,
``v1/src/main.rs:119-156``) and read granularity (4 MiB batches / 512 KiB
stream blocks). In Spark those decisions belong to the scheduler and the
vectorized Parquet reader; we pin only the knobs that matter for a
100 TB-scale deployment and let AQE adapt the rest at runtime.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: Default configs. Rationale per key:
#: - AQE on: runtime coalescing of shuffle partitions + skew-join splitting,
#:   which replaces the reference's static 16-way partitioning.
#: - shuffle.partitions: sized for the local harness; on a real cluster AQE's
#:   ``coalescePartitions`` makes the initial number mostly irrelevant.
#: - ANSI off: v1 sums integers with wrap-on-overflow release semantics
#:   (``v1/src/main.rs:1401-1403``); ANSI-on would error instead. Also keeps
#:   div-by-zero → NULL, matching the reference's NULLIF guards.
#: - timeZone UTC: the oracle (DuckDB) treats parquet timestamps as naive;
#:   pinning UTC makes datetime literals deterministic.
#: - filterPushdown / aggregatePushDown: the near-storage behaviors the
#:   reference implements by hand (row-group pruning ``v1/src/main.rs:626-685``,
#:   selective chunk reads ``v2/src/main.rs:400-503``) are delegated to the
#:   Parquet data source.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.ansi.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.parquet.aggregatePushDown": "true",
    "spark.sql.parquet.enableVectorizedReader": "true",
    "spark.sql.files.maxPartitionBytes": "134217728",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": "32",
    # events.parquet stores TIMESTAMP(NANOS), which the vectorized reader
    # rejects; read as long and rebuild in tables.load_table.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.ui.enabled": "false",
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"),
}


def get_spark(
    app_name: str = "parquet-near-storage-compute-spark",
    master: str | None = None,
    conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (32 if unset) so the
    same entry points serve both the local harness and a real cluster (where
    ``master`` is supplied by spark-submit and this argument stays None).
    """
    builder = SparkSession.builder.appName(app_name)
    if master is None and "SPARK_GRAFT_MASTER" not in os.environ:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
        master = f"local[{cpus}]"
    elif master is None:
        master = os.environ["SPARK_GRAFT_MASTER"]
    builder = builder.master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for k, v in merged.items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
