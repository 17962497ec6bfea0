"""`stream_phash_ingest` (r7): streaming perceptual-dedup ingest — the
streaming × modality bridge. Micro-batches of image payloads are admitted
against the accepted pHash state via foreachBatch; the DuckDB oracle
replays the admission SEQUENTIALLY with a recursive CTE over the pinned
batch order, re-deriving every hash member-level from payload hex.

Beyond the full-parity compare, this file pins the batch semantics (the
within-batch min-wins branch fires in batch 0, the state branch rejects
the re-encode waves), the batch partition of the fixture, and the
greedy-equivalence precondition the batch-local rule relies on."""

from __future__ import annotations

import duckdb

from parquet_near_storage_compute_spark.operators import multimodal as M
from parquet_near_storage_compute_spark.streaming import stream_ops as SO
from tests.oracle import compare


def test_contract_matches_sequential_oracle(spark, sf_dir):
    con = duckdb.connect()
    compare(
        SO.phash_ingest(spark, sf_dir),
        con,
        SO.ORACLE_SQL["stream_phash_ingest"],
    )


def test_batches_partition_the_fixture():
    con = duckdb.connect()
    ids = sorted(
        r[0]
        for r in con.execute(
            f"SELECT img_id FROM read_parquet('{M.IMG_DEDUP_FIXTURE}')"
        ).fetchall()
    )
    flat = sorted(i for b in SO.PHASH_INGEST_BATCHES for i in b)
    assert flat == ids  # every asset in exactly one batch


def test_admission_semantics(spark, sf_dir):
    rows = {r.img_id: r for r in SO.phash_ingest(spark, sf_dir).collect()}
    # all 24 bases accepted, in their arrival batches
    assert sorted(rows) == list(range(24))
    for b, ids in enumerate(SO.PHASH_INGEST_BATCHES):
        for i in ids:
            if i in rows:
                assert rows[i].batch_no == b
    # the within-batch branch fired: base 0's exact copies arrived IN
    # batch 0 (empty state) and were still dropped
    assert 1024 not in rows and 1025 not in rows
    # the state branch fired: every re-encode wave asset was rejected
    assert not any(1000 <= i <= 1023 for i in rows)


def test_fixture_near_pairs_are_band_reachable():
    """Band-reachability precondition (ADVICE r7): Spark's admission
    generates candidates via 4×16-bit bands — approximate, since with
    PHASH_HAMMING=10 the differing bits can spread across all 4 bands and
    miss the band join — while the oracle replays admission with exact
    all-pairs Hamming. The contract is total only because every near pair
    in THIS fixture shares a clean band; assert that (the
    `_banding_recall_holds` discipline from test_sig_decisions_random) so
    regenerating the image fixture cannot silently flip the contract."""
    con = duckdb.connect()
    rows = con.execute(
        f"SELECT img_id, payload FROM read_parquet('{M.IMG_DEDUP_FIXTURE}')"
    ).fetchall()
    ph = {i: M.phash64(M.decode_image(bytes(p))) for i, p in rows}

    def band_keys(h):
        return {(b, (h >> (16 * b)) & 0xFFFF) for b in range(M.PHASH_BANDS)}

    ids = sorted(ph)
    near_pairs = 0
    for x, a in enumerate(ids):
        for b in ids[x + 1 :]:
            if bin(ph[a] ^ ph[b]).count("1") <= M.PHASH_HAMMING:
                near_pairs += 1
                assert band_keys(ph[a]) & band_keys(ph[b]), (
                    f"near pair ({a}, {b}) shares no 16-bit band — the "
                    "banded Spark admission would miss it while the exact "
                    "oracle replay finds it"
                )
    assert near_pairs >= 2  # the fixture plants real near pairs


def test_within_batch_rule_equals_greedy():
    """The batch-local rule (drop any state-survivor with a smaller
    state-surviving same-batch row within threshold) equals TRUE
    sequential greedy iff every row it drops would also be dropped by
    greedy — i.e. every within-batch-dropped row has at least one
    ACCEPTED same-batch partner with a smaller id. Assert that
    precondition on the fixture (e.g. 1024/1025 both drop against the
    accepted base 0, not merely against each other)."""
    con = duckdb.connect()
    accepted = {
        r[0]: r[2]
        for r in con.execute(SO.ORACLE_SQL["stream_phash_ingest"]).fetchall()
    }
    rows = con.execute(
        f"SELECT img_id, payload FROM read_parquet('{M.IMG_DEDUP_FIXTURE}')"
    ).fetchall()
    ph = {i: M.phash64(M.decode_image(bytes(p))) for i, p in rows}

    def near(a, b):
        return bin(ph[a] ^ ph[b]).count("1") <= M.PHASH_HAMMING

    checked = 0
    for b, ids in enumerate(SO.PHASH_INGEST_BATCHES):
        earlier_accepted = [a for a, ab in accepted.items() if ab < b]
        for x in ids:
            if x in accepted:
                continue
            if any(near(x, a) for a in earlier_accepted):
                continue  # dropped by STATE — within-batch rule not involved
            # dropped by the within-batch rule: greedy agreement needs an
            # ACCEPTED smaller same-batch partner
            assert any(
                a in accepted and near(x, a) for a in ids if a < x
            ), (b, x)
            checked += 1
    assert checked >= 2  # 1024 and 1025 exercise the branch
