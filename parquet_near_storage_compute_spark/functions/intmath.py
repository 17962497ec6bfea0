"""Exact fixed-point integer math shared across operators.

The centerpiece is the engine-exact base-2 logarithm
``lg(x) = floor(log2(x) · 2^LOG2_FRAC_BITS)`` for integer ``x ≥ 1``,
computed by a shift-and-square loop with NO transcendental libm call on
either engine — the same loop, step for step, as one Spark fold
expression (`with_ilog2fp`) and as a generated DuckDB CTE chain
(`ilog2fp_ctes`),
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
    ``src`` ≥ 1, as ONE ``aggregate()`` fold expression.

    r12: the first form chained the squaring steps as ~64 named
    ``withColumn`` projections per call — linear expression trees, but
    each withColumn re-analyzes the whole accumulated plan, so a
    4-chain consumer (dsir_resample) paid **6.4 s of driver-side plan
    construction** for arithmetic over ≤1025 rows. Folding the loop
    into a single ``aggregate(sequence(1, F), struct(y, acc), …)``
    expression keeps the tree linear in LOG2_FRAC_BITS (the struct
    state threads y through the iterations, so nothing doubles) and
    builds in 0.22 s for the same 4 chains (29×). The fold body is
    interpreted (higher-order functions run outside whole-stage
    codegen — the §4.1 lesson), which is why this device is only ever
    applied to dimension-sized frames (bucket tables, totals rows),
    never the corpus: measured runtime on 1025 rows is ~0.5 s noop
    wall including scheduling, same as the chain form. Bit-exactness
    vs the chain form and the independent Python big-int reference is
    pinned by tests/test_r12b_ops.py (310-value differential incl.
    2^31/2^62/2^63−1 edges)."""
    msb = f"(length(bin({src})) - 1)"
    return df.withColumn(
        dst,
        F.expr(
            f"""
            CAST({msb} AS BIGINT) * {1 << LOG2_FRAC_BITS} + aggregate(
              sequence(1, {LOG2_FRAC_BITS}),
              named_struct(
                'y', CAST(CASE WHEN {msb} <= 30
                               THEN shiftleft({src}, 30 - {msb})
                               ELSE shiftright({src}, {msb} - 30)
                          END AS BIGINT),
                'acc', CAST(0 AS BIGINT)),
              (s, i) -> named_struct(
                'y', CAST(CASE WHEN shiftright(s.y * s.y, 30) >= {_TWO31}
                               THEN shiftright(shiftright(s.y * s.y, 30), 1)
                               ELSE shiftright(s.y * s.y, 30)
                          END AS BIGINT),
                'acc', CAST(CASE WHEN shiftright(s.y * s.y, 30) >= {_TWO31}
                                 THEN s.acc * 2 + 1 ELSE s.acc * 2
                            END AS BIGINT)),
              s -> s.acc)
            """
        ),
    )


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
