"""Exact fixed-point integer math shared across operators.

The centerpiece is the engine-exact base-2 logarithm
``lg(x) = floor(log2(x) · 2^LOG2_FRAC_BITS)`` for integer ``x ≥ 1``,
computed by a shift-and-square loop with NO transcendental libm call on
either engine — the same loop, step for step, as a Spark column chain
(`with_ilog2fp`) and as a generated DuckDB CTE chain (`ilog2fp_ctes`),
so any contract built on it compares bit-exact. First used by
`train_dsir_resample` (r12); `train_drift_psi` shares it.

Algorithm: m = len(bin(x)) − 1 is the integer part; one conditional
shift normalizes x into [2^30, 2^31) (left shifts only fire when
m ≤ 30, so the product stays < 2^31 — no overflow); LOG2_FRAC_BITS
truncating squaring steps then extract fractional bits (y < 2^31 ⇒
y² < 2^62 fits int64). Accumulated truncation stays below 2 fixed-point
ulps of the true log2 (pinned by tests/test_r12b_ops.py against an
independent Python big-int implementation and ``math.log2``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fractional bits of the fixed-point log2 lattice.
LOG2_FRAC_BITS = 20

_TWO31 = 1 << 31


def with_ilog2fp(df: DataFrame, src: str, dst: str) -> DataFrame:
    """Append ``dst`` = floor(log2(src) · 2^LOG2_FRAC_BITS) for integer
    ``src`` ≥ 1. Steps are chained as NAMED columns, never nested Column
    expressions — each step's `y` feeds the next through a projection, so
    the expression tree stays linear in LOG2_FRAC_BITS (a pure-Column
    fold would double the tree per step: the condition and both branches
    all reference y). Only ever applied to dimension-sized frames
    (bucket tables, totals rows) — never the corpus."""
    m = (F.length(F.bin(F.col(src))) - 1).cast("int")
    df = (
        df.withColumn("_m", m)
        .withColumn(
            "_y",
            F.when(
                F.col("_m") <= 30, F.expr(f"shiftleft({src}, 30 - _m)")
            )
            .otherwise(F.expr(f"shiftright({src}, _m - 30)"))
            .cast("long"),
        )
        .withColumn("_acc", F.lit(0).cast("long"))
    )
    for _ in range(LOG2_FRAC_BITS):
        df = (
            df.withColumn(
                "_y2", F.shiftright(F.col("_y") * F.col("_y"), 30)
            )
            .withColumn(
                "_acc",
                F.when(
                    F.col("_y2") >= F.lit(_TWO31), F.col("_acc") * 2 + 1
                ).otherwise(F.col("_acc") * 2),
            )
            .withColumn(
                "_y",
                F.when(
                    F.col("_y2") >= F.lit(_TWO31),
                    F.shiftright(F.col("_y2"), 1),
                ).otherwise(F.col("_y2")),
            )
        )
    return df.withColumn(
        dst,
        (
            F.col("_m").cast("long") * F.lit(1 << LOG2_FRAC_BITS)
            + F.col("_acc")
        ).cast("long"),
    ).drop("_m", "_y", "_acc", "_y2")


def ilog2fp_ctes(src_cte: str, key_cols: str = "b, kind") -> str:
    """Generated DuckDB CTE chain mirroring `with_ilog2fp` step for step
    over rows of ``src_cte`` carrying (``key_cols``, val ≥ 1): n0
    normalizes val into [2^30, 2^31) with one conditional shift off
    len(bin(val))−1; n1..nF are the squaring steps; `lgt` exposes
    (``key_cols``, lg)."""
    msb = "(length(bin(val)) - 1)"
    parts = [
        f"""n0 AS (
          SELECT {key_cols}, CAST({msb} AS BIGINT) AS m,
                 CAST(CASE WHEN {msb} <= 30 THEN val << (30 - {msb})
                      ELSE val >> ({msb} - 30) END AS BIGINT) AS y,
                 CAST(0 AS BIGINT) AS acc
          FROM {src_cte})"""
    ]
    for i in range(1, LOG2_FRAC_BITS + 1):
        parts.append(
            f"""n{i} AS (
          SELECT {key_cols}, m,
                 CASE WHEN ((y*y) >> 30) >= {_TWO31}
                      THEN ((y*y) >> 30) >> 1 ELSE (y*y) >> 30 END AS y,
                 CASE WHEN ((y*y) >> 30) >= {_TWO31}
                      THEN acc*2 + 1 ELSE acc*2 END AS acc
          FROM n{i-1})"""
        )
    parts.append(
        f"""lgt AS (
          SELECT {key_cols}, m * {1 << LOG2_FRAC_BITS} + acc AS lg
          FROM n{LOG2_FRAC_BITS})"""
    )
    return ",\n        ".join(parts)
