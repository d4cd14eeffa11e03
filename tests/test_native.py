"""Native C++ data-kernel tests: parity vs numpy + actual .so build."""

import numpy as np
import pytest

from lfm_tpu import native


def test_builds_real_library():
    lib = native.get_lib()
    assert lib is not None, "C++ build failed — g++ toolchain expected in this image"


def test_normalize_batch_matches_numpy():
    rng = np.random.default_rng(0)
    src = rng.integers(0, 256, (4, 16, 20, 3), np.uint8)
    flip = np.array([0, 1, 0, 1], np.uint8)
    got = native.normalize_batch(src, flip)
    want = src.astype(np.float32) / 127.5 - 1.0
    want[1] = want[1][:, ::-1]
    want[3] = want[3][:, ::-1]
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_crop_normalize_batch():
    rng = np.random.default_rng(1)
    src = rng.integers(0, 256, (3, 32, 32, 3), np.uint8)
    tops = np.array([0, 4, 8], np.int32)
    lefts = np.array([8, 4, 0], np.int32)
    flip = np.array([0, 0, 1], np.uint8)
    got = native.crop_normalize_batch(src, 16, tops, lefts, flip)
    assert got.shape == (3, 16, 16, 3)
    want0 = src[0, 0:16, 8:24].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got[0], want0, atol=1e-6)
    want2 = src[2, 8:24, 0:16, :][:, ::-1].astype(np.float32) / 127.5 - 1.0
    np.testing.assert_allclose(got[2], want2, atol=1e-6)


def test_one_hot():
    labels = np.array([[[0, 2], [1, 3]]], np.int32)
    got = native.one_hot(labels, 4)
    assert got.shape == (1, 2, 2, 4)
    want = np.eye(4, dtype=np.float32)[labels]
    np.testing.assert_array_equal(got, want)


def test_one_hot_out_of_range_is_zero():
    labels = np.array([[[5, -1]]], np.int32)
    got = native.one_hot(labels, 4)
    np.testing.assert_array_equal(got, np.zeros((1, 1, 2, 4), np.float32))
