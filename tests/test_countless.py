"""COUNTLESS downsampling vs a brute-force per-block oracle and vs the
reference implementation imported from /root/reference."""

import itertools
import sys

import numpy as np
import pytest

from lfm_tpu.data.countless import countless2d, countless3d, downsample_segmentation

REF_COUNTLESS = "/root/reference/datasets_prep/inpaint_preprocess/masks/countless"


def oracle_block(vals):
    """Mode of a block with COUNTLESS precedence: largest repeat-count wins;
    among equal counts, the first matching position-subset in lexicographic
    combination order wins; no repeats -> last position."""
    k = len(vals)
    for m in range(k // 2, 1, -1):
        for idx in itertools.combinations(range(k), m):
            if m == 2 and idx[-1] == k - 1:
                # COUNTLESS never tests a lone pair against the fallback
                # position (countless2d.py:44-46 checks only AB, AC, BC;
                # countless3d.py:63-65 drops the last element at level 2)
                continue
            if len(set(vals[i] for i in idx)) == 1:
                return vals[idx[0]]
    return vals[-1]


def oracle2d(img):
    h, w = img.shape
    out = np.empty((h // 2, w // 2), img.dtype)
    for y in range(0, h, 2):
        for x in range(0, w, 2):
            block = (img[y, x], img[y, x + 1], img[y + 1, x], img[y + 1, x + 1])
            out[y // 2, x // 2] = oracle_block(block)
    return out


def oracle3d(vol):
    d, h, w = vol.shape
    out = np.empty((d // 2, h // 2, w // 2), vol.dtype)
    for z in range(0, d, 2):
        for y in range(0, h, 2):
            for x in range(0, w, 2):
                block = tuple(
                    vol[z + oz, y + oy, x + ox]
                    for oz, oy, ox in itertools.product((0, 1), repeat=3)
                )
                out[z // 2, y // 2, x // 2] = oracle_block(block)
    return out


@pytest.mark.parametrize("dtype,hi", [(np.uint8, 4), (np.uint8, 255), (np.int32, 1000)])
def test_countless2d_matches_oracle(dtype, hi):
    rng = np.random.default_rng(0)
    img = rng.integers(0, hi + 1, size=(16, 18)).astype(dtype)
    got = countless2d(img)
    assert got.dtype == dtype and got.shape == (8, 9)
    np.testing.assert_array_equal(got, oracle2d(img))


def test_countless2d_zeros_and_saturation():
    # zeros (the value the select chain is blind to without the shift) and
    # dtype-max values (the shift's overflow hazard) in every position
    vals = np.array([0, 1, 255], np.uint8)
    blocks = np.stack(np.meshgrid(vals, vals, vals, vals, indexing="ij"), -1)
    flat = blocks.reshape(-1, 4)  # 81 blocks, every combination
    img = np.zeros((2, 2 * len(flat)), np.uint8)
    img[0, 0::2], img[0, 1::2], img[1, 0::2], img[1, 1::2] = flat.T
    np.testing.assert_array_equal(countless2d(img), oracle2d(img))


def test_countless3d_matches_oracle():
    rng = np.random.default_rng(1)
    vol = rng.integers(0, 5, size=(6, 8, 10)).astype(np.uint8)
    got = countless3d(vol)
    assert got.shape == (3, 4, 5)
    np.testing.assert_array_equal(got, oracle3d(vol))


def test_batched_leading_axes():
    rng = np.random.default_rng(2)
    batch = rng.integers(0, 7, size=(3, 2, 12, 14)).astype(np.int32)
    got = countless2d(batch)
    assert got.shape == (3, 2, 6, 7)
    for i in range(3):
        for j in range(2):
            np.testing.assert_array_equal(got[i, j], oracle2d(batch[i, j]))


def test_downsample_segmentation_mip_chain():
    rng = np.random.default_rng(3)
    seg = rng.integers(0, 10, size=(32, 32)).astype(np.uint8)
    got = downsample_segmentation(seg, 4)
    assert got.shape == (8, 8)
    np.testing.assert_array_equal(got, oracle2d(oracle2d(seg)))
    np.testing.assert_array_equal(downsample_segmentation(seg, 1), seg)
    with pytest.raises(ValueError):
        downsample_segmentation(seg, 3)


def test_jax_path_matches_numpy():
    import jax.numpy as jnp

    rng = np.random.default_rng(4)
    img = rng.integers(0, 30, size=(24, 24)).astype(np.int32)
    got = countless2d(jnp.asarray(img))
    np.testing.assert_array_equal(np.asarray(got), countless2d(img))


def test_matches_reference_countless2d():
    """Same outputs as the reference's own simplest_countless +
    zero_corrected_countless (imported, not copied)."""
    sys.path.insert(0, REF_COUNTLESS)
    try:
        import countless2d as ref
    except ImportError as e:  # pragma: no cover - scipy/PIL/six missing
        pytest.skip(f"reference countless2d not importable: {e}")
    finally:
        sys.path.pop(0)
    rng = np.random.default_rng(5)
    img = rng.integers(1, 50, size=(32, 32)).astype(np.uint16)  # no zeros
    np.testing.assert_array_equal(countless2d(img), ref.simplest_countless(img.copy()))
    img0 = rng.integers(0, 50, size=(32, 32)).astype(np.uint16)  # with zeros
    np.testing.assert_array_equal(countless2d(img0), ref.zero_corrected_countless(img0.copy()))
