"""Multimodal decode kernels: binary PPM (round 4) and RIFF/PCM WAV
(round 5) decode for real — pure numpy + stdlib; PNG/JPEG and lossy audio
codecs remain clearly-marked NotImplementedError (those libraries are not
in this container; BASELINE.json's stub contract). The fake feature
kernel stays deterministic."""

from __future__ import annotations

import io
import wave

import numpy as np
import pytest

from parquet_near_storage_compute_spark.operators.multimodal import (
    decode_audio,
    decode_image,
    fake_features,
)


def test_decode_stubs_raise():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
    with pytest.raises(NotImplementedError):  # mp3 needs soundfile/librosa
        decode_audio(b"ID3\x04\x00...")


def test_ppm_16bit_decode():
    # 2x1 16-bit PPM: big-endian u2 samples per the netpbm spec
    samples = np.array([[0, 1, 513], [65535, 256, 2]], dtype=">u2")
    img = decode_image(b"P6\n2 1\n65535\n" + samples.tobytes())
    assert img.dtype == np.dtype(">u2")
    assert img.shape == (1, 2, 3)
    assert np.array_equal(img.reshape(2, 3), samples)


def test_pgm_grayscale_decode():
    px = np.arange(12, dtype=np.uint8).reshape(3, 4)
    img = decode_image(b"P5\n4 3\n255\n" + px.tobytes())
    assert img.shape == (3, 4)
    assert np.array_equal(img, px)
    img16 = decode_image(
        b"P5\n2 2\n65535\n" + np.array([1, 2, 300, 65535], dtype=">u2").tobytes()
    )
    assert img16.shape == (2, 2) and int(img16[1, 1]) == 65535


def _wav(pcm: np.ndarray, n_channels: int, rate: int = 8000) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.astype("<i2").tobytes())
    return buf.getvalue()


def test_wav_decode_round_trip():
    pcm = np.array([0, 1, -1, 32767, -32768, 12345], dtype="<i2")
    n_ch, rate, samples = decode_audio(_wav(pcm, 2, rate=44100))
    assert (n_ch, rate) == (2, 44100)
    assert samples.shape == (3, 2)
    assert np.array_equal(samples.ravel(), pcm)


def test_wav_truncated_raises_not_hangs():
    full = _wav(np.arange(100, dtype="<i2"), 1)
    # header cuts (wave.Error -> ValueError) and a data-chunk cut (the
    # declared frame count exceeds the surviving bytes)
    for cut in (4, 12, 30, 43, 60):
        with pytest.raises(ValueError):
            decode_audio(full[:cut])


def test_wav_fixture_matches_generator_law():
    import pyarrow.parquet as pq

    from parquet_near_storage_compute_spark.operators.multimodal import (
        AUDIO_FIXTURE,
    )

    r = pq.read_table(AUDIO_FIXTURE).to_pylist()[11]
    n_ch, rate, samples = decode_audio(r["payload"])
    assert n_ch == r["n_channels"]
    assert rate == r["sample_rate"]
    assert samples.shape == (r["n_frames"], n_ch)
    flat = samples.ravel()
    for j in (0, 7, len(flat) - 1):
        assert flat[j] == ((17 * j + 31 * r["clip_id"]) % 65536) - 32768


def test_ppm_decode_round_trip():
    # 12x3, multi-digit width: pixel (x,y,c) = x + 10*y + 100*c mod 256
    w, h = 12, 3
    px = np.array(
        [[[(x + 10 * y + 100 * c) % 256 for c in range(3)] for x in range(w)]
         for y in range(h)],
        dtype=np.uint8,
    )
    payload = f"P6\n{w} {h}\n255\n".encode() + px.tobytes()
    img = decode_image(payload)
    assert img.shape == (h, w, 3)
    assert np.array_equal(img, px)


def test_ppm_decode_fixture_matches_generator_law(spark):
    import pyarrow.parquet as pq

    from parquet_near_storage_compute_spark.operators.multimodal import (
        IMAGE_FIXTURE,
    )

    t = pq.read_table(IMAGE_FIXTURE).to_pylist()
    r = t[7]
    img = decode_image(r["payload"])
    assert img.shape == (r["height"], r["width"], 3)
    x, y, c = 3, 5, 2
    assert img[y, x, c] == (7 * x + 13 * y + 29 * c + 31 * r["img_id"]) % 256


def test_fake_features_deterministic():
    assert fake_features(b"abcd more") == [97.0, 98.0, 99.0, 100.0]
    assert fake_features(b"ab") == [97.0, 98.0]


# ----------------------------------------------------- decode quarantine
def test_decode_quarantine_matches_oracle(spark, sf_dir):
    import duckdb

    from parquet_near_storage_compute_spark.operators import multimodal as M
    from tests.oracle import compare

    compare(
        M.decode_quarantine(spark, sf_dir),
        duckdb.connect(),
        M.ORACLE_SQL["mm_decode_quarantine"],
    )


def test_decode_quarantine_per_row_not_per_task(spark, sf_dir):
    """The robustness claim: corrupt payloads quarantine PER ROW — every
    asset (healthy or corrupt) yields exactly one classified output row,
    no task failure, and each corruption mode maps to its decode_image
    exception surface."""
    from parquet_near_storage_compute_spark.operators import multimodal as M

    rows = {r.img_id: r for r in M.decode_quarantine(spark, sf_dir).collect()}
    n_fixture = 50
    assert len(rows) == n_fixture + 2 * len(M.QUARANTINE_SEED_IDS)
    for i in M.QUARANTINE_SEED_IDS:
        assert rows[i].status == "ok" and rows[i].n_pixels == 64 * 64
        assert rows[i + 2000].status == "corrupt"  # truncated pixel block
        assert rows[i + 3000].status == "unsupported_format"  # zeroed magic
        assert rows[i + 2000].n_pixels == -1 and rows[i + 3000].n_pixels == -1
    assert sum(r.status == "ok" for r in rows.values()) == n_fixture
