"""Property tests for the per-modality perceptual-hash kernels (r7):
`phash64` and `audio_fingerprint63` are pure functions feeding 63-bit
BIGINT columns, so their domain invariants — range, determinism,
byte-roundtrip stability, exact-duplicate collapse — must hold on ANY
input, not just the committed fixtures."""

from __future__ import annotations

import io
import wave

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_near_storage_compute_spark.operators import multimodal as M


def _image(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    coarse = rng.uniform(0, 255, size=(8, 8, 3))
    src = np.linspace(0, 7, 64)
    i0 = np.floor(src).astype(int)
    i1 = np.minimum(i0 + 1, 7)
    t = src - i0
    rows = coarse[i0] * (1 - t)[:, None, None] + coarse[i1] * t[:, None, None]
    img = rows[:, i0] * (1 - t)[None, :, None] + rows[:, i1] * t[None, :, None]
    return np.clip(img, 0, 255).astype(np.uint8)


def _ppm(img: np.ndarray) -> bytes:
    h, w, _ = img.shape
    return f"P6\n{w} {h}\n255\n".encode() + img.tobytes()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_phash_range_determinism_roundtrip(seed):
    img = _image(seed)
    h1 = M.phash64(img)
    assert 0 <= h1 < 2**63
    assert M.phash64(img) == h1  # deterministic
    # encode → netpbm decode → hash must equal the direct hash (the
    # contract's actual path goes through payload bytes)
    assert M.phash64(M.decode_image(_ppm(img))) == h1


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
def test_phash_exact_duplicates_collapse(seed_a, seed_b):
    a, b = _image(seed_a), _image(seed_b)
    assert M.phash64(a.copy()) == M.phash64(a)
    if seed_a != seed_b and not np.array_equal(a, b):
        # distinct structured images essentially never hash-collide; a
        # failure here would mean the hash ignores content
        assert M.phash64(a) != M.phash64(b)


def _clip(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    t = np.arange(M.AUDIO_FP_SAMPLES) / M.AUDIO_FP_RATE
    x = np.zeros(M.AUDIO_FP_SAMPLES)
    for _ in range(4):
        x += rng.uniform(1500, 5000) * np.sin(
            2 * np.pi * rng.uniform(200, 1800) * t + rng.uniform(0, 2 * np.pi)
        )
    x += rng.normal(0, 50, size=x.shape)
    return np.clip(np.round(x), -32768, 32767).astype("<i2")


def _wav(pcm: np.ndarray) -> bytes:
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(M.AUDIO_FP_RATE)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


@settings(max_examples=25, deadline=None)
@given(st.integers(0, 2**31 - 1))
def test_audio_fp_range_determinism_roundtrip(seed):
    pcm = _clip(seed)
    f1 = M.audio_fingerprint63(pcm)
    assert 0 <= f1 < 2**63
    assert M.audio_fingerprint63(pcm.copy()) == f1
    # WAV encode → stdlib decode → fingerprint must equal the direct one
    _, _, samples = M.decode_audio(_wav(pcm))
    assert M.audio_fingerprint63(samples[:, 0]) == f1


@settings(max_examples=15, deadline=None)
@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
def test_audio_fp_distinguishes_content(seed_a, seed_b):
    a, b = _clip(seed_a), _clip(seed_b)
    assert M.audio_fingerprint63(a) == M.audio_fingerprint63(np.array(a))
    if seed_a != seed_b and not np.array_equal(a, b):
        assert M.audio_fingerprint63(a) != M.audio_fingerprint63(b)
