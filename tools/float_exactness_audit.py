"""Engine-exactness audit for every registered contract's float columns.

Two checks per contract (default sf0.001):

1. **Partition invariance** (the driver-flake vector): run the query under
   ``spark.sql.shuffle.partitions`` = 7 and = 32 and require BIT-IDENTICAL
   float outputs.  Double addition is order-dependent, so any multi-level
   or post-shuffle SUM/AVG of doubles whose partial-aggregation order can
   change shows up here — the exact failure mode that made
   ``join_outer_full`` flake in the round-4 driver window (a few-ulp drift
   at 1.6e9 magnitude, outside the driver's hash epsilon).

2. **Cross-engine raw drift**: compare Spark's floats against the DuckDB
   oracle WITHOUT the test harness's 9-significant-digit rounding, and
   report the worst relative drift per contract.  0 drift = engine-exact.

Usage::

    python tools/float_exactness_audit.py [sf_dir] [name_substring ...]

Prints one line per contract: ``OK`` (bit-stable + exact vs oracle),
``DRIFT r=<rel>`` (bit-stable but last-ulp drift vs DuckDB), or
``UNSTABLE`` (partition-order dependent — fix before it lands in a driver
window).  Exits nonzero if any contract is UNSTABLE.  A full run (no name
filter) also records the per-contract verdicts into ``EXACTNESS.json`` at
the repo root — the per-round evidence artifact.
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, ".")

from parquet_near_storage_compute_spark import registry  # noqa: E402
from parquet_near_storage_compute_spark.session import get_spark  # noqa: E402


def _flatten(v, out):
    if isinstance(v, float):
        out.append(v)
    elif isinstance(v, (list, tuple)):
        for x in v:
            _flatten(x, out)
    elif isinstance(v, dict):
        for k in sorted(v):
            _flatten(v[k], out)


def _rows(df):
    cols = df.columns
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    rows = [tuple(r[i] for i in order) for r in df.collect()]
    return sorted(rows, key=repr)


def _floats(rows):
    out: list[float] = []
    for r in rows:
        _flatten(r, out)
    return out


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = sys.argv[2:]
    from tests.oracle import duckdb_con

    spark = get_spark(
        master="local[8]", conf={"spark.sql.shuffle.partitions": "7"}
    )
    con = duckdb_con(sf)
    queries = registry.all_queries()
    oracles = registry.all_oracles()
    unstable, drifted = [], []
    record: dict[str, dict] = {}
    for name, fn in queries.items():
        if only and not any(s in name for s in only):
            continue
        try:
            spark.conf.set("spark.sql.shuffle.partitions", "7")
            a = _rows(fn(spark, sf))
            spark.conf.set("spark.sql.shuffle.partitions", "32")
            b = _rows(fn(spark, sf))
        except Exception as e:  # noqa: BLE001
            print(f"{name:40s} ERROR {type(e).__name__}: {e}")
            unstable.append(name)
            continue
        fa, fb = _floats(a), _floats(b)
        bitstable = len(fa) == len(fb) and all(
            repr(x) == repr(y)
            or (math.isnan(x) and math.isnan(y))
            for x, y in zip(fa, fb)
        ) and a == b
        worst = 0.0
        if name in oracles:
            try:
                rel = con.execute(oracles[name])
                dcols = [d[0] for d in rel.description]
                dorder = sorted(range(len(dcols)), key=lambda i: dcols[i])
                drows = sorted(
                    [tuple(r[i] for i in dorder) for r in rel.fetchall()],
                    key=repr,
                )
                fd = _floats(drows)
                if len(fd) == len(fb):
                    for x, y in zip(fb, fd):
                        if math.isnan(x) and math.isnan(y):
                            continue
                        if x != y:
                            denom = max(abs(x), abs(y), 1e-300)
                            worst = max(worst, abs(x - y) / denom)
                else:
                    worst = float("inf")
            except Exception as e:  # noqa: BLE001
                print(f"{name:40s} ORACLE-ERROR {type(e).__name__}: {e}")
        if not bitstable:
            unstable.append(name)
            record[name] = {"status": "UNSTABLE"}
            print(f"{name:40s} UNSTABLE")
        elif worst > 0:
            drifted.append((name, worst))
            record[name] = {
                "status": "DRIFT",
                "worst_rel_drift": float(f"{worst:.3e}"),
            }
            print(f"{name:40s} DRIFT r={worst:.3e}")
        else:
            record[name] = {"status": "EXACT"}
            print(f"{name:40s} OK")
    print(
        f"\n{len(unstable)} unstable, {len(drifted)} drifted, "
        f"{len(queries) - len(unstable) - len(drifted)} exact"
    )
    if not only:
        out = {
            "sf_dir": sf,
            "n_contracts": len(record),
            "n_unstable": len(unstable),
            "n_drifted": len(drifted),
            "n_exact": len(record) - len(unstable) - len(drifted),
            "contracts": dict(sorted(record.items())),
        }
        path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "EXACTNESS.json")
        with open(path, "w") as fh:
            json.dump(out, fh, indent=1)
        print(f"wrote {path}")
    spark.stop()
    return 1 if unstable else 0


if __name__ == "__main__":
    raise SystemExit(main())
