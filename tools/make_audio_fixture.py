"""Generate fixtures/audio.parquet: tiny deterministic WAV (RIFF/PCM16)
clips as binary payloads + typed metadata — the committed real-bytes
fixture for the mm_audio_decode contract (the driver corpus has no audio
column; WAV needs only the stdlib ``wave`` module on the decode side and
nothing at all on the oracle side, which re-reads the bytes hex-wise).

Sample law (pinned; the oracle never regenerates it, it only re-reads the
bytes): interleaved sample value(j, clip) = ((17·j + 31·clip) mod 65536)
− 32768 as little-endian int16.

The ``wave`` module writes the canonical 44-byte PCM header (RIFF + fmt16
+ data); the generator asserts the 'data' marker sits at byte 36 so the
oracle's fixed 44-byte offset is guaranteed at fixture-build time.

Run: PYTHONPATH=/root/repo python tools/make_audio_fixture.py
"""

from __future__ import annotations

import io
import os
import wave

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

N_CLIPS = 150
DATA_OFFSET = 44  # canonical RIFF/PCM16 header length
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "fixtures", "audio.parquet")


def wav_bytes(clip_id: int) -> tuple[int, int, int, bytes]:
    n_channels = 1 + clip_id % 2
    sample_rate = 8000 + 1000 * (clip_id % 5)
    n_frames = 200 + (37 * clip_id) % 400
    j = np.arange(n_frames * n_channels)
    pcm = (((17 * j + 31 * clip_id) % 65536) - 32768).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(pcm.tobytes())
    payload = buf.getvalue()
    assert payload[36:40] == b"data", "non-canonical WAV header"
    assert len(payload) == DATA_OFFSET + 2 * n_frames * n_channels
    return n_channels, sample_rate, n_frames, payload


def main() -> None:
    rows = [wav_bytes(i) for i in range(N_CLIPS)]
    table = pa.table(
        {
            "clip_id": pa.array(range(N_CLIPS), pa.int64()),
            "n_channels": pa.array([r[0] for r in rows], pa.int32()),
            "sample_rate": pa.array([r[1] for r in rows], pa.int32()),
            "n_frames": pa.array([r[2] for r in rows], pa.int64()),
            "mime": pa.array(["audio/x-wav"] * N_CLIPS),
            "payload": pa.array([r[3] for r in rows], pa.binary()),
        }
    )
    pq.write_table(table, OUT, compression="snappy")
    print(f"wrote {N_CLIPS} clips, {os.path.getsize(OUT)} bytes -> {OUT}")


if __name__ == "__main__":
    main()
