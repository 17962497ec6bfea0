"""fan_out is the CPU/IO decoupling helper (tables.py): compact scans get
one round-robin exchange before per-row-expensive work. Since r9 it is
CONDITIONAL (VERDICT r8 #2): when the scan already yields enough splits —
the 100 TB case, where the input arrives as ~10^5 byte-sized partitions —
the exchange is skipped entirely, so the engine never re-shuffles a corpus
just to undo split geometry that was never compact. Both branches pinned
here."""

from __future__ import annotations

from parquet_near_storage_compute_spark.tables import fan_out, load_table


def test_compact_scan_fans_out(spark, sf_dir):
    """sf0.001 documents is one compact file → a handful of splits; the
    fan-out branch must fire and spread rows to defaultParallelism."""
    docs = load_table(spark, sf_dir, "documents")
    n_in = docs.rdd.getNumPartitions()
    target = spark.sparkContext.defaultParallelism
    assert n_in < target  # precondition: the corpus under-parallelizes
    out = fan_out(docs)
    assert out.rdd.getNumPartitions() == target
    assert "Repartition" in (
        out._jdf.queryExecution().optimizedPlan().toString()
    )


def test_parallel_input_is_left_alone(spark, sf_dir):
    """An input that already meets the parallelism target must pass through
    untouched — same object, no Exchange added (the 100 TB branch)."""
    docs = load_table(spark, sf_dir, "documents")
    target = spark.sparkContext.defaultParallelism
    wide = docs.repartition(target)
    assert fan_out(wide) is wide
    # and an explicit smaller target is also satisfied by a wide input
    assert fan_out(wide, partitions=2) is wide


def test_explicit_partition_target_still_honored(spark, sf_dir):
    """Callers that pass an explicit target above the input's split count
    still get exactly that many partitions."""
    docs = load_table(spark, sf_dir, "documents")
    out = fan_out(docs, partitions=11)
    assert out.rdd.getNumPartitions() == 11
