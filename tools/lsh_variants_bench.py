"""One-off: measure _banded_buckets variants for dedup_minhash_lsh at sf0.1.

Run: python tools/lsh_variants_bench.py
"""

from __future__ import annotations

import time

import pyspark.sql.functions as F

from parquet_near_storage_compute_spark.session import get_spark
from parquet_near_storage_compute_spark.operators import dedup as D

SF = "/root/testdata/sf0.1"


def buckets_current(bands, keys):
    return D._banded_buckets(bands, keys)


def make_two_level(salt, l1_sort):
    def f(bands, keys):
        part = bands.groupBy(
            *keys, F.pmod(F.hash("doc_id"), F.lit(salt)).alias("_salt")
        ).agg(
            F.count(F.lit(1)).alias("_n_part"),
            (
                F.slice(
                    F.sort_array(F.collect_list("doc_id")), 1, D.LSH_BUCKET_CAP + 1
                )
                if l1_sort
                else F.slice(F.collect_list("doc_id"), 1, D.LSH_BUCKET_CAP + 1)
            ).alias("_ds_part"),
            F.min("doc_id").alias("_min_part"),
        )
        return part.groupBy(*keys).agg(
            F.sum("_n_part").alias("n_docs"),
            F.sort_array(F.flatten(F.collect_list("_ds_part"))).alias("ds"),
            F.min("_min_part").alias("min_id"),
        )

    return f


def buckets_single(bands, keys):
    return bands.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sort_array(F.collect_list("doc_id")).alias("ds"),
    )


def run(name, bucket_fn, spark, n=3):
    times = []
    for _ in range(n):
        t0 = time.monotonic()
        docs = D.load_table(spark, SF, "documents")
        sig = D._minhash_signatures(docs)
        pairs = D._bucket_pairs(bucket_fn(D._bands(sig), ["band", "bh"]))
        rows = pairs.orderBy("doc_a", "doc_b").collect()
        times.append(time.monotonic() - t0)
    print(f"{name:28s} best={min(times):.2f}s all={[round(t,2) for t in times]} rows={len(rows)}")
    return min(times)


def main():
    spark = get_spark(
        master="local[32]", conf={"spark.sql.shuffle.partitions": "32"}
    )
    # warm up the JVM/scan path once
    D.load_table(spark, SF, "documents").count()
    run("sig-only (floor)", lambda b, k: None, spark, n=0) if False else None
    variants = [
        ("current salt16 l1sort", buckets_current),
        ("salt16 no-l1-sort", make_two_level(16, False)),
        ("salt4 l1sort", make_two_level(4, True)),
        ("salt4 no-l1-sort", make_two_level(4, False)),
        ("single-level (r1-ish)", buckets_single),
    ]
    for name, fn in variants:
        run(name, fn, spark)
    # isolate signature cost
    t0 = time.monotonic()
    docs = D.load_table(spark, SF, "documents")
    D._minhash_signatures(docs).count()
    print(f"signatures only: {time.monotonic()-t0:.2f}s")
    t0 = time.monotonic()
    D._bands(D._minhash_signatures(D.load_table(spark, SF, "documents"))).count()
    print(f"bands only: {time.monotonic()-t0:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
