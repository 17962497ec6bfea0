"""Smoke the chained network→disk microbenchmark (VERDICT r10 missing
item: the reference's network_disk server measures TCP receive → bounded
channel → parallel O_DIRECT writers as one overlapped path)."""

from __future__ import annotations

from tools.netdisk_microbench import BLOCK_SIZE, run_one


def test_chained_transfer_delivers_every_byte():
    size = 32 * BLOCK_SIZE  # 8 MiB — fast, still multi-chunk
    out = run_one(file_bytes=size, want_odirect=True)
    assert out["bytes"] == size
    assert out["bytes_on_disk"] == size
    assert out["end_to_end_secs"] > 0
    assert out["end_to_end_mib_s"] > 0
    # the write leg can only finish at or after the receive leg
    assert out["drain_tail_secs"] >= 0


def test_buffered_fallback_also_delivers():
    size = 16 * BLOCK_SIZE
    out = run_one(file_bytes=size, want_odirect=False)
    assert out["bytes_on_disk"] == size
    assert out["odirect"] is False
