"""Recall sweep for the trained PQ codebooks (VERDICT r7 #3).

Measures recall@TOP_K of `sim_topk_pq` vs the exact-cosine oracle
(`sim_topk_bruteforce`) as a function of Lloyd training rounds, at each
test SF — DuckDB only, so the sweep is independent of the Spark session.
The committed PQ_ITERS is the knee of this curve; NOTES_r8 records the
table.

Usage: python tools/pq_train_sweep.py [max_iters]
"""

from __future__ import annotations

import sys

import os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_near_storage_compute_spark.operators import similarity as S

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def recall(sf_dir: str, iters: int) -> float:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    # splice the unrolled-training CTE text for `iters` in place of the
    # committed PQ_ITERS version
    sql = S.ORACLE_SQL["sim_topk_pq"].replace(
        S._pq_train_ctes(), S._pq_train_ctes(iters)
    )
    exact = set(
        map(
            tuple,
            con.execute(S.ORACLE_SQL["sim_topk_bruteforce"])
            .df()[["query_id", "cand_id"]]
            .values.tolist(),
        )
    )
    pq = set(
        map(
            tuple,
            con.execute(sql).df()[["query_id", "cand_id"]].values.tolist(),
        )
    )
    return len(exact & pq) / len(exact)


def main() -> None:
    max_iters = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    print(f"recall@{S.TOP_K} vs exact cosine (PQ_M={S.PQ_M}, "
          f"grid={S.PQ_GRID}, tmag={S.PQ_TMAG})")
    header = "sf      " + "".join(f"  it={i}" for i in range(max_iters + 1))
    print(header)
    for sf in ["0.001", "0.01", "0.1"]:
        row = [f"sf{sf:<6}"]
        for it in range(max_iters + 1):
            row.append(f" {recall(f'/root/testdata/sf{sf}', it):.3f}")
        print("".join(row))


if __name__ == "__main__":
    main()
