"""Interleaved A/B: JVM HOF-fold cosine scoring vs an Arrow/NumPy batch
scorer on the brute-force top-k scoring pass (VERDICT r12 #3).

Form A (declared engine form): broadcast(queries) crossJoin candidates →
cos_sim via the sequential-fold `dot` (interpreted HOF) → top-k window.
Form B: identical join, then the (qv, cv, qn, cn) columns cross the Arrow
boundary once and NumPy computes the dot as a PER-DIMENSION ACCUMULATION
LOOP — `acc += qv[:, d] * cv[:, d]` for d in 0..63 — which preserves the
per-row sequential fold order bit-exactly (each row's adds happen in the
same order as the fold; IEEE doubles throughout), vectorized ACROSS rows.
np.dot/np.sum would NOT be bit-exact (pairwise/SIMD summation).

Both forms are built fresh per run and timed through the noop sink,
alternating A/B in one session (the r12 discipline). Bit-exactness is
asserted on the first pair via collect+struct.pack comparison.

Usage: [SPARK_GRAFT_SF_DIR=...] python tools/arrow_scoring_ab.py [--n 4]
"""

from __future__ import annotations

import argparse
import json
import os
import struct
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

DIM = 64


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=4)
    args = ap.parse_args()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

    import pyarrow as pa
    from pyspark.sql import functions as F

    from parquet_near_storage_compute_spark.functions.vectors import dot, norm
    from parquet_near_storage_compute_spark.session import get_spark
    from parquet_near_storage_compute_spark.tables import fan_out, load_table

    spark = get_spark(
        app_name="arrow-scoring-ab",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": str(max(int(cpus), 8))},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(8).selectExpr("id % 2 AS k").groupBy("k").count().collect()

    def pairs():
        emb = load_table(spark, sf_dir, "embeddings")
        v = (
            fan_out(emb)
            .select("vec_id", F.col("embedding").cast("array<double>").alias("v"))
            .withColumn("nrm", norm(F.col("v")))
        )
        q = v.filter(F.col("vec_id") < 10).select(
            F.col("vec_id").alias("query_id"),
            F.col("v").alias("qv"),
            F.col("nrm").alias("qn"),
        )
        c = v.select(
            F.col("vec_id").alias("cand_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
        return (
            F.broadcast(q)
            .crossJoin(c)
            .filter(F.col("query_id") != F.col("cand_id"))
        )

    def form_a():
        return pairs().select(
            "query_id",
            "cand_id",
            (dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
                "cos_sim"
            ),
        )

    def _score_batches(it):
        import numpy as np

        for batch in it:
            n = batch.num_rows
            qv = np.asarray(batch.column("qv").flatten(), dtype=np.float64)
            cv = np.asarray(batch.column("cv").flatten(), dtype=np.float64)
            qv = qv.reshape(n, DIM)
            cv = cv.reshape(n, DIM)
            acc = np.zeros(n, dtype=np.float64)
            for d in range(DIM):
                acc += qv[:, d] * cv[:, d]
            cos = acc / (
                np.asarray(batch.column("qn"), dtype=np.float64)
                * np.asarray(batch.column("cn"), dtype=np.float64)
            )
            yield pa.RecordBatch.from_arrays(
                [batch.column("query_id"), batch.column("cand_id"), pa.array(cos)],
                names=["query_id", "cand_id", "cos_sim"],
            )

    def form_b():
        return (
            pairs()
            .select("query_id", "cand_id", "qv", "cv", "qn", "cn")
            .mapInArrow(
                _score_batches,
                "query_id bigint, cand_id bigint, cos_sim double",
            )
        )

    # bit-exactness audit on one fresh pair
    a_rows = {
        (r.query_id, r.cand_id): struct.pack("<d", r.cos_sim)
        for r in form_a().collect()
    }
    b_rows = {
        (r.query_id, r.cand_id): struct.pack("<d", r.cos_sim)
        for r in form_b().collect()
    }
    assert set(a_rows) == set(b_rows)
    mismatches = sum(1 for k in a_rows if a_rows[k] != b_rows[k])
    print(
        json.dumps(
            {"pairs": len(a_rows), "bitwise_mismatches": mismatches, "sf": sf_dir}
        ),
        flush=True,
    )

    def timed(build):
        df = build()
        t0 = time.perf_counter()
        df.write.format("noop").mode("overwrite").save()
        return round(time.perf_counter() - t0, 4)

    timed(form_a)  # one untimed warm-up each
    timed(form_b)
    a, b = [], []
    for _ in range(args.n):
        a.append(timed(form_a))
        b.append(timed(form_b))
    print(
        json.dumps(
            {
                "jvm_fold": a,
                "jvm_fold_best": min(a),
                "arrow_numpy": b,
                "arrow_numpy_best": min(b),
                "cpus": cpus,
                "sf_dir": sf_dir,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
