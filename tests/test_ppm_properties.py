"""Property-based round-trip for the pure-numpy PPM decoder: any dims and
pixel content encode→decode losslessly, including multi-digit dims and
whitespace-sensitive headers (no Spark session needed)."""

from __future__ import annotations

import numpy as np
import pytest
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


def test_ppm_truncated_header_raises_not_hangs():
    # regression: a truncated header used to spin forever once pos ran past
    # the payload end (b''.isspace() is False); in the mapInPandas kernel
    # that wedged an executor task. Must raise, promptly.
    for bad in (b"P6\n2", b"P6", b"P6\n", b"P6\n2 3", b"P6\n2 3\n255"):
        with pytest.raises(ValueError):
            decode_image(bad)


def test_ppm_truncated_pixel_block_raises():
    payload = b"P6\n4 4\n255\n" + b"\x01" * 10  # needs 48 bytes
    with pytest.raises(ValueError):
        decode_image(payload)
