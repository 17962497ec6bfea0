"""nprobe operating curve for `sim_topk_ivf_mp` (VERDICT r7 #8).

The committed contract fixes NPROBE=2; the deployment artifact is the
recall / candidates-scanned curve — at 100 TB nprobe IS the number of
partitions a query touches, so this curve is the recall-vs-IO dial an
operator would tune. Sweeps nprobe 1..MAX × SF, DuckDB-only (the same
splice pattern as tools/pq_train_sweep.py), recording:

- recall@TOP_K vs the exact-cosine oracle (`sim_topk_bruteforce`)
- mean candidates scanned per query (the probed cells' occupancy —
  the IO proxy)
- cells touched (= nprobe, by construction)

Usage: python tools/nprobe_curve.py [max_nprobe]
       python tools/nprobe_curve.py [max_nprobe] --emb PATH
         (swap the embeddings view for a fixture — e.g.
         fixtures/embeddings_clustered.parquet, the representative
         clustered corpus of VERDICT r8 #4 — and sweep that instead
         of the near-random testdata corpora)
"""

from __future__ import annotations

import argparse
import sys

import os
import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parquet_near_storage_compute_spark.operators import similarity as S

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _con(sf_dir: str, emb: str | None = None) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        src = emb if (t == "embeddings" and emb) else f"{sf_dir}/{t}.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    return con


def sweep_point(
    sf_dir: str, nprobe: int, emb: str | None = None
) -> tuple[float, float]:
    """(recall@TOP_K, mean candidates scanned per query) at nprobe."""
    con = _con(sf_dir, emb)
    base = S.ORACLE_SQL["sim_topk_ivf_mp"]
    needle = f"crk <= {S.NPROBE}"
    assert base.count(needle) == 1, base.count(needle)
    sql = base.replace(needle, f"crk <= {nprobe}")
    exact = set(
        map(
            tuple,
            con.execute(S.ORACLE_SQL["sim_topk_bruteforce"])
            .df()[["query_id", "cand_id"]]
            .values.tolist(),
        )
    )
    got = set(
        map(
            tuple,
            con.execute(sql).df()[["query_id", "cand_id"]].values.tolist(),
        )
    )
    recall = len(exact & got) / len(exact)
    # candidates scanned per query: the probed cells' total occupancy
    # (join size before top-k) — reuse the oracle's CTE chain up to
    # `ranked` and count the pair volume instead of ranking it
    head = sql[: sql.rindex("SELECT query_id")]
    cand = con.execute(
        head
        + f"""
        SELECT CAST(COUNT(*) AS DOUBLE) / {S.N_QUERIES}
        FROM ranked a
        JOIN ranked b ON a.cell = b.cell AND b.crk = 1
                      AND b.vec_id != a.vec_id
        WHERE a.vec_id < {S.N_QUERIES}
        """
    ).fetchone()[0]
    return recall, cand


def main() -> None:
    # argparse (ADVICE r9): the old by-value argv surgery mishandled an
    # --emb path string equal to the positional, or a repeated flag
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("max_nprobe", nargs="?", type=int, default=8)
    ap.add_argument("--emb", default=None,
                    help="swap the embeddings view for a fixture parquet")
    ns = ap.parse_args()
    emb, max_np = ns.emb, ns.max_nprobe
    print(f"recall@{S.TOP_K} and mean candidates/query vs nprobe "
          f"(committed NPROBE={S.NPROBE}, K_CLUSTERS cells)")
    if emb:
        n_vec = _con("/root/testdata/sf0.1", emb).execute(
            "SELECT COUNT(*) FROM embeddings"
        ).fetchone()[0]
        print(f"{emb} ({n_vec} vectors):")
        for np_ in range(1, max_np + 1):
            r, c = sweep_point("/root/testdata/sf0.1", np_, emb)
            print(f"  nprobe={np_}: recall={r:.3f} "
                  f"candidates/query={c:.1f} ({100 * c / n_vec:.1f}% of corpus)")
        return
    for sf in ["0.001", "0.01", "0.1"]:
        n_vec = _con(f"/root/testdata/sf{sf}").execute(
            "SELECT COUNT(*) FROM embeddings"
        ).fetchone()[0]
        print(f"sf{sf} ({n_vec} vectors):")
        for np_ in range(1, max_np + 1):
            r, c = sweep_point(f"/root/testdata/sf{sf}", np_)
            print(f"  nprobe={np_}: recall={r:.3f} "
                  f"candidates/query={c:.1f} ({100 * c / n_vec:.1f}% of corpus)")


if __name__ == "__main__":
    main()
