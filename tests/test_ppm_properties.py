"""Property-based round-trip for the pure-numpy PPM decoder: any dims and
pixel content encode→decode losslessly, including multi-digit dims and
whitespace-sensitive headers (no Spark session needed)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from parquet_near_storage_compute_spark.operators.multimodal import (
    decode_image,
)


@settings(max_examples=60, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=40),
    h=st.integers(min_value=1, max_value=40),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_ppm_round_trip(w, h, seed):
    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    payload = f"P6\n{w} {h}\n255\n".encode("ascii") + px.tobytes()
    img = decode_image(payload)
    assert img.shape == (h, w, 3)
    assert np.array_equal(img, px)


def test_ppm_trailing_bytes_ignored_and_pixel_values_raw():
    # decoder must count exactly w*h*3 bytes from the data offset; pixel
    # bytes that collide with ASCII whitespace (0x0a, 0x20) are data here
    px = np.full((2, 2, 3), 0x0A, dtype=np.uint8)
    payload = b"P6\n2 2\n255\n" + px.tobytes() + b"garbage-tail"
    img = decode_image(payload)
    assert np.array_equal(img, px)
