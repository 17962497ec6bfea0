"""Generate fixtures/audio_dedup.parquet: a near-duplicate audio corpus for
the ``dedup_audio_fingerprint`` contract — the audio leg of the per-modality
near-dup matrix (text MinHash / embedding sign-LSH / image pHash / THIS).

Every clip is mono RIFF/PCM16, 4000 Hz, exactly 2000 samples (0.5 s) with
the canonical 44-byte header (asserted at build, like the mm_audio_decode
fixture), so the hex-wise DuckDB oracle uses fixed offsets and a fixed
frame grid.

Corpus law (pinned by the committed bytes):
- N_BASE base clips: a mixture of 4 sinusoids (frequency 200–1800 Hz,
  amplitude 1500–5000, random phase) + mild Gaussian noise — banded
  spectral structure for the fingerprint to summarize.
- Near-duplicate variants of the first N_VARIED bases, one each of:
  gain 0.85× (re-mastering), additive noise (σ=30), and quantization to
  multiples of 32 (re-encode stand-in). All three preserve band-energy
  DIFFERENTIALS, so the fingerprint must cluster them with their base.
- N_EXACT exact byte copies of base 0 (hamming 0, the value-collapse
  fast lane).
Variant clip_ids are strictly greater than every base id, so min-id-wins
decisions keep exactly the bases.

Run: PYTHONPATH=/root/repo python tools/make_audio_dedup_fixture.py
"""

from __future__ import annotations

import io
import os
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_BASE = 24
N_VARIED = 8
N_EXACT = 2
SAMPLE_RATE = 4000
N_SAMPLES = 2000
DATA_OFFSET = 44
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures",
    "audio_dedup.parquet",
)


def base_clip(rng: np.random.Generator) -> np.ndarray:
    t = np.arange(N_SAMPLES) / SAMPLE_RATE
    x = np.zeros(N_SAMPLES)
    for _ in range(4):
        f = rng.uniform(200.0, 1800.0)
        a = rng.uniform(1500.0, 5000.0)
        ph = rng.uniform(0.0, 2 * np.pi)
        x += a * np.sin(2 * np.pi * f * t + ph)
    x += rng.normal(0.0, 50.0, size=N_SAMPLES)
    return np.clip(x, -32768, 32767)


def wav_bytes(x: np.ndarray) -> bytes:
    pcm = np.clip(np.round(x), -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(SAMPLE_RATE)
        w.writeframes(pcm.tobytes())
    payload = buf.getvalue()
    assert payload[36:40] == b"data", "non-canonical WAV header"
    assert len(payload) == DATA_OFFSET + 2 * N_SAMPLES
    return payload


def main() -> None:
    rng = np.random.default_rng(1234)
    rows: list[tuple[int, bytes]] = []
    bases = [base_clip(rng) for _ in range(N_BASE)]
    for i, x in enumerate(bases):
        rows.append((i, wav_bytes(x)))
    next_id = 1000
    for i in range(N_VARIED):
        x = bases[i]
        gain = x * 0.85
        noisy = x + rng.normal(0.0, 30.0, size=N_SAMPLES)
        quant = np.round(x / 32.0) * 32.0
        for var in (gain, noisy, quant):
            rows.append((next_id, wav_bytes(var)))
            next_id += 1
    for _ in range(N_EXACT):
        rows.append((next_id, wav_bytes(bases[0])))
        next_id += 1
    table = pa.table(
        {
            "clip_id": pa.array([r[0] for r in rows], pa.int64()),
            "sample_rate": pa.array([SAMPLE_RATE] * len(rows), pa.int32()),
            "n_frames": pa.array([N_SAMPLES] * len(rows), pa.int64()),
            "mime": pa.array(["audio/x-wav"] * len(rows)),
            "payload": pa.array([r[1] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, OUT, compression="zstd")
    print(f"wrote {len(rows)} clips, {os.path.getsize(OUT)} bytes -> {OUT}")


if __name__ == "__main__":
    main()
