"""Golden tests for RLE encoders vs the reference implementation."""

import numpy as np
import pytest

from plastic_unet_tpu.ops import encode, encode_batch, rle_decode, rle_encode

from conftest import has_reference, import_reference_module


def _cases(rng):
    yield np.zeros((101, 101), dtype=np.uint8)
    yield np.ones((101, 101), dtype=np.uint8)
    m = np.zeros((101, 101), dtype=np.uint8)
    m[0, 0] = 1
    yield m
    m = np.zeros((101, 101), dtype=np.uint8)
    m[-1, -1] = 1
    yield m
    for _ in range(8):
        yield (rng.random((101, 101)) > 0.5).astype(np.uint8)
    for _ in range(4):
        yield (rng.random((13, 7)) > 0.3).astype(np.uint8)


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
def test_encode_matches_reference(rng):
    ref = import_reference_module("utils.rle_encode")
    for m in _cases(rng):
        assert encode(m) == ref.encode(m)


@pytest.mark.skipif(not has_reference(), reason="reference tree unavailable")
def test_rle_encode_matches_reference(rng):
    ref = import_reference_module("utils.rle_encode")
    for m in _cases(rng):
        assert rle_encode(m) == ref.rle_encode(m)
        assert rle_encode(m, format=False) == ref.rle_encode(m, format=False)
        assert rle_encode(m, order="C") == ref.rle_encode(m, order="C")


def test_encoders_agree(rng):
    for m in _cases(rng):
        assert encode(m) == rle_encode(m)


def test_roundtrip(rng):
    for m in _cases(rng):
        assert np.array_equal(rle_decode(encode(m), m.shape), m)


def test_encode_batch(rng):
    masks = (rng.random((5, 101, 101)) > 0.5).astype(np.uint8)
    assert encode_batch(masks) == [encode(m) for m in masks]


def test_known_values():
    # Column-major: mask[1,0] is flat position 2 (1-based).
    m = np.zeros((3, 3), dtype=np.uint8)
    m[1, 0] = 1
    m[2, 0] = 1
    m[0, 2] = 1
    assert encode(m) == "2 2 7 1"
    assert rle_encode(m, format=False) == [(2, 2), (7, 1)]
    assert encode(np.zeros((2, 2), dtype=np.uint8)) == ""
