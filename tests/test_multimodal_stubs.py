"""Multimodal decode stubs: clearly-marked NotImplementedError (the real
image/audio libraries are not in this container; BASELINE.json's stub
contract), while the fake feature kernel stays deterministic."""

from __future__ import annotations

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


def test_fake_features_deterministic():
    assert fake_features(b"abcd more") == [97.0, 98.0, 99.0, 100.0]
    assert fake_features(b"ab") == [97.0, 98.0]
