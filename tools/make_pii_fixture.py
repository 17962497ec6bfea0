"""Generate the PII-document parquet fixture (deterministic, committed).

The driver's synthetic ``documents`` corpus is clean word-salad, so a PII
redaction operator over it would trivially match zero rows and test
nothing. This fixture interleaves PII-shaped tokens (emails, US-style
phone fragments, IPv4 addresses) into word-salad text with a fixed seed so
``text_pii_scrub`` exercises real match/replace paths on both engines.

Run once: ``python tools/make_pii_fixture.py`` — output is committed at
``fixtures/pii_docs.parquet`` so the contract never depends on write
access or generation order (same device as types_unsigned_decimal).
"""

from __future__ import annotations

import os
import random

import pyarrow as pa
import pyarrow.parquet as pq

N = 200
_FIXTURES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "fixtures"
)
OUT = os.path.join(_FIXTURES, "pii_docs.parquet")

_WORDS = (
    "the data scan filter value table row batch query spark column agg "
    "join sort stream window group key hash merge fast slow big small part"
).split()


def main() -> None:
    rng = random.Random(20260813)
    docs = []
    for i in range(N):
        toks = [rng.choice(_WORDS) for _ in range(rng.randint(8, 40))]
        # ~70% of docs get 1-4 PII tokens spliced at random positions
        if rng.random() < 0.7:
            for _ in range(rng.randint(1, 4)):
                kind = rng.randrange(3)
                if kind == 0:
                    tok = f"user{rng.randrange(1000)}@example{rng.randrange(10)}.com"
                elif kind == 1:
                    tok = f"555-{rng.randrange(10000):04d}"
                else:
                    tok = (
                        f"{rng.randrange(256)}.{rng.randrange(256)}"
                        f".{rng.randrange(256)}.{rng.randrange(256)}"
                    )
                toks.insert(rng.randrange(len(toks) + 1), tok)
        docs.append(" ".join(toks))
    table = pa.table(
        {
            "doc_id": pa.array(range(N), pa.int64()),
            "text": pa.array(docs, pa.string()),
        }
    )
    pq.write_table(table, OUT)
    print(f"wrote {OUT} ({N} rows)")


if __name__ == "__main__":
    main()
