"""Generate the unsigned/decimal parquet fixture (deterministic, committed).

The reference's type system covers unsigned ints end-to-end (filters and
aggregates over UInt8-64, ``v1/src/main.rs:1015-1033, 1326-1330``; all seven
physical types in v2, ``v2/src/main.rs:35-44``). The driver's sf tables carry
none, so this fixture provides parquet files with true UINT_8/16/32/64
logical types plus a DECIMAL(18,4) column. u64 values straddle 2^63 so the
unsigned-64 path (Spark reads it as DECIMAL(20,0)) is genuinely exercised,
not just a signed value in unsigned clothing.

Run once: ``python tools/make_type_fixture.py`` — output is committed at
``fixtures/types_unsigned_decimal.parquet`` so tests and the contract query
never depend on write access or generation order.
"""

from __future__ import annotations

import datetime as dt
import os
from decimal import Decimal

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N = 1000
_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
OUT = os.path.join(_FIXTURES, "types_unsigned_decimal.parquet")
#: §1.3 remnants (round 3): Float16 (v1/src/main.rs:1066 widens f16→f32 in
#: its reader — Spark 4 rejects FLOAT16 parquet at schema inference, so the
#: engine ships the same widening as an ingestion shim) and INT96 (legacy
#: timestamp physical type, v2/src/main.rs:35-44; Spark reads it natively).
#: Separate files: one FLOAT16 column poisons schema inference for every
#: other column in the same file.
OUT_F16 = os.path.join(_FIXTURES, "types_f16.parquet")
OUT_INT96 = os.path.join(_FIXTURES, "types_int96.parquet")


def build_table() -> pa.Table:
    ids = list(range(N))
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "grp": pa.array([i % 5 for i in ids], pa.int32()),
            "u8": pa.array([(i * 7) % 256 for i in ids], pa.uint8()),
            "u16": pa.array([(i * 131) % 65536 for i in ids], pa.uint16()),
            "u32": pa.array(
                [(i * 2654435761) % (2**32) for i in ids], pa.uint32()
            ),
            # straddle the int64 boundary: values start 500 below 2^63 and
            # climb past it, so most rows exceed the signed-64 max
            "u64": pa.array(
                [
                    (2**63 - 500 + i * 12345) % (2**64)
                    for i in ids
                ],
                pa.uint64(),
            ),
            "dec": pa.array(
                [
                    Decimal((1 if i % 3 else -1) * ((i * 137) % 1000000))
                    / Decimal(10000)
                    for i in ids
                ],
                pa.decimal128(18, 4),
            ),
        }
    )


def build_f16_table() -> pa.Table:
    ids = list(range(N))
    # exact half-float values (multiples of 1/8 within ±125) so the
    # f16→f32 widening is lossless and test expectations are exact
    vals = np.array([((i * 37) % 2000 - 1000) / 8.0 for i in ids],
                    dtype=np.float16)
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "grp": pa.array([i % 5 for i in ids], pa.int32()),
            "f16": pa.array(vals, pa.float16()),
        }
    )


def build_int96_table() -> pa.Table:
    ids = list(range(N))
    ts = [dt.datetime(2021, 1, 1) + dt.timedelta(hours=i) for i in ids]
    return pa.table(
        {
            "id": pa.array(ids, pa.int64()),
            "grp": pa.array([i % 5 for i in ids], pa.int32()),
            "ts96": pa.array(ts, pa.timestamp("us")),
        }
    )


if __name__ == "__main__":
    os.makedirs(_FIXTURES, exist_ok=True)
    # two row groups so row-group pruning on unsigned stats is observable
    pq.write_table(build_table(), OUT, row_group_size=500)
    print("wrote", OUT)
    print(pq.read_schema(OUT))
    pq.write_table(build_f16_table(), OUT_F16, row_group_size=500)
    print("wrote", OUT_F16)
    # use_deprecated_int96_timestamps turns the timestamp column into the
    # legacy INT96 physical encoding (which carries NO column statistics —
    # pruning over INT96 is impossible by format design)
    pq.write_table(
        build_int96_table(), OUT_INT96, row_group_size=500,
        use_deprecated_int96_timestamps=True,
    )
    print("wrote", OUT_INT96)
