"""Multimodal decode kernels: binary PPM decodes for real (pure numpy,
round 4); PNG/JPEG/audio remain clearly-marked NotImplementedError (those
libraries are not in this container; BASELINE.json's stub contract). The
fake feature kernel stays deterministic."""

from __future__ import annotations

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
    with pytest.raises(NotImplementedError):
        decode_audio(b"RIFF...")
    with pytest.raises(NotImplementedError):  # 16-bit PPM
        decode_image(b"P6\n2 1\n65535\n" + bytes(12))


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
