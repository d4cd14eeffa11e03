"""Data pipeline tests: transforms, masks, loader, registry."""

import numpy as np
import pytest
from PIL import Image

from lfm_tpu.core.config import Config, DataConfig, ModelConfig
from lfm_tpu.data import DataLoader, get_dataset, get_mask_generator
from lfm_tpu.data.datasets import ImageFolderDataset, SyntheticImageDataset, Subset
from lfm_tpu.data.inpainting import InpaintingTrainDataset
from lfm_tpu.data.masks import (
    make_random_irregular_mask,
    make_random_rectangle_mask,
    make_random_superres_mask,
)
from lfm_tpu.data.transforms import center_crop_arr, resize_and_crop, to_neg1_1


def _write_images(d, n=6, size=96, subdirs=None):
    rng = np.random.default_rng(0)
    if subdirs:
        for s in subdirs:
            (d / s).mkdir(parents=True, exist_ok=True)
            for i in range(n):
                arr = rng.integers(0, 255, (size, size, 3), np.uint8)
                Image.fromarray(arr).save(d / s / f"{i}.png")
    else:
        d.mkdir(parents=True, exist_ok=True)
        for i in range(n):
            arr = rng.integers(0, 255, (size + i, size, 3), np.uint8)
            Image.fromarray(arr).save(d / f"{i}.png")


def test_center_crop_arr():
    img = Image.fromarray(np.zeros((300, 500, 3), np.uint8))
    out = center_crop_arr(img, 64)
    assert out.size == (64, 64)
    big = Image.fromarray(np.zeros((1024, 700, 3), np.uint8))
    assert center_crop_arr(big, 64).size == (64, 64)


def test_to_neg1_1():
    arr = np.array([[[0, 127, 255]]], np.uint8)
    out = to_neg1_1(arr)
    np.testing.assert_allclose(out, [[[-1.0, -0.00392157, 1.0]]], atol=1e-5)


def test_masks():
    for fn in (make_random_irregular_mask, make_random_rectangle_mask,
               make_random_superres_mask):
        m = fn((128, 128), rng=np.random.default_rng(3))
        assert m.shape == (128, 128)
        assert set(np.unique(m)) <= {0.0, 1.0}
    gen = get_mask_generator(seed=0)
    masks = [gen((128, 128)) for _ in range(8)]
    assert any(m.sum() > 0 for m in masks)
    # deterministic under seed
    g1 = get_mask_generator(seed=5)
    g2 = get_mask_generator(seed=5)
    np.testing.assert_array_equal(g1((64, 64)), g2((64, 64)))


def test_image_folder_dataset(tmp_path):
    _write_images(tmp_path / "flat")
    ds = ImageFolderDataset(str(tmp_path / "flat"), image_size=32)
    assert len(ds) == 6
    x, y = ds[0]
    assert x.shape == (32, 32, 3) and y == 0
    assert -1.0 <= x.min() and x.max() <= 1.0

    _write_images(tmp_path / "cls", subdirs=["a", "b"])
    ds2 = ImageFolderDataset(str(tmp_path / "cls"), image_size=32,
                             transform_kind="adm_center_crop")
    assert ds2.num_classes == 2
    labels = {ds2[i][1] for i in range(len(ds2))}
    assert labels == {0, 1}


def test_loader_prefetch_and_epochs(tmp_path):
    ds = SyntheticImageDataset(n=20, image_size=16, num_classes=3)
    dl = DataLoader(ds, batch_size=8, shuffle=True, drop_last=True, seed=1)
    batches = list(dl)
    assert len(batches) == 2 == len(dl)
    assert batches[0]["x"].shape == (8, 16, 16, 3)
    assert batches[0]["y"].shape == (8,)
    # different epoch -> different order
    dl.set_epoch(1)
    b2 = list(dl)
    assert not np.array_equal(batches[0]["x"], b2[0]["x"])


def test_registry_synthetic_and_subset():
    cfg = Config(dataset="synthetic",
                 model=ModelConfig(model_type="DiT-S/2", image_size=32, num_classes=5))
    ds = get_dataset(cfg)
    assert len(ds) == 256
    sub = Subset(ds, range(10))
    assert len(sub) == 10


def test_registry_folder_fallback(tmp_path):
    _write_images(tmp_path / "celeba")
    cfg = Config(
        dataset="celeba_256",
        model=ModelConfig(model_type="DiT-L/2", image_size=64),
        data=DataConfig(dataset="celeba_256", datadir=str(tmp_path / "celeba")),
    )
    ds = get_dataset(cfg)
    x, y = ds[0]
    assert x.shape[2] == 3 and min(x.shape[:2]) == 64


def test_inpainting_dataset(tmp_path):
    _write_images(tmp_path / "inp", size=80)
    gen = get_mask_generator(seed=0)
    ds = InpaintingTrainDataset(str(tmp_path / "inp"), gen, image_size=64)
    img, mask, masked = ds[0]
    assert img.shape == (64, 64, 3)
    assert mask.shape == (64, 64, 1)
    np.testing.assert_allclose(masked, img * (1 - mask), atol=1e-6)


def test_loader_host_sharding():
    """Union of per-host shards == full (truncated) dataset; disjoint."""
    ds = SyntheticImageDataset(n=21, image_size=8, num_classes=1)
    seen = []
    for rank in range(4):
        dl = DataLoader(ds, batch_size=1, shuffle=True, drop_last=True,
                        seed=3, shard=(rank, 4), with_labels=False)
        assert len(dl) == 5  # 21 -> 20 usable, 5 per host
        order = dl._order()
        seen.append(order)
    flat = np.concatenate(seen)
    assert len(flat) == 20
    assert len(np.unique(flat)) == 20  # disjoint cover
