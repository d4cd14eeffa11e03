"""Dataset registry (reference datasets_prep/__init__.py:10-122).

Same dataset names and preprocessing as the reference; LMDB-backed entries
additionally accept a plain image folder at ``datadir`` (auto-detected) so
the pipeline runs without the lmdb binding.
"""

from __future__ import annotations

import os
from typing import Optional

from lfm_tpu.core.config import Config
from lfm_tpu.data.datasets import (
    CIFAR10Dataset,
    ImageFolderDataset,
    LatentDataset,
    Subset,
    SyntheticImageDataset,
    SyntheticLatentDataset,
)
from lfm_tpu.data.loader import DataLoader
from lfm_tpu.data.masks import get_mask_generator


def _folder_fallback(datadir: str) -> bool:
    """True when datadir holds plain images instead of an LMDB."""
    if not os.path.isdir(datadir):
        return False
    entries = os.listdir(datadir)
    return not any(e.endswith((".lmdb", ".mdb")) or e == "data.mdb" for e in entries)


def get_dataset(config: Config, seed: int = 0):
    name = config.dataset
    datadir = config.data.datadir
    size = config.model.image_size

    if name.startswith("latent_"):
        return LatentDataset(datadir)
    if name.startswith("synthetic"):
        if "latent" in name:
            return SyntheticLatentDataset(
                n=256, latent_size=config.model.latent_size,
                channels=config.model.num_in_channels,
                num_classes=config.model.num_classes or 1, seed=seed,
            )
        return SyntheticImageDataset(
            n=256, image_size=size,
            num_classes=config.model.num_classes or 1, seed=seed,
        )
    if name == "cifar10":
        return CIFAR10Dataset(datadir, train=True, seed=seed)
    if name == "imagenet_256":
        return ImageFolderDataset(
            os.path.join(datadir, "train") if os.path.isdir(os.path.join(datadir, "train")) else datadir,
            image_size=256, transform_kind="adm_center_crop", seed=seed,
        )
    if name in ("lsun_church", "lsun_bedroom"):
        cls = "church_outdoor_train" if name == "lsun_church" else "bedroom_train"
        if _folder_fallback(datadir):
            ds = ImageFolderDataset(datadir, size, "resize_crop", seed=seed)
        else:
            from lfm_tpu.data.lmdb_datasets import LSUN

            ds = LSUN(root=datadir, classes=[cls], image_size=size, seed=seed)
        # 120k subsets (reference datasets_prep/__init__.py:50-65)
        return Subset(ds, range(min(120_000, len(ds))))
    if name in ("celeba_256", "ffhq_256"):
        if _folder_fallback(datadir):
            return ImageFolderDataset(datadir, size, "resize", seed=seed)
        from lfm_tpu.data.lmdb_datasets import LMDBDataset

        return LMDBDataset(root=datadir, name=name.split("_")[0], train=True,
                           image_size=size, seed=seed)
    if name in ("celeba_512", "celeba_1024"):
        if _folder_fallback(datadir):
            return ImageFolderDataset(datadir, size, "resize", seed=seed)
        from lfm_tpu.data.lmdb_datasets import ImageLMDB

        return ImageLMDB(db_path=datadir, db_name=name, image_size=size, seed=seed)
    raise KeyError(f"unknown dataset {name!r}")


def get_inpainting_dataset(config: Config, seed: int = 0):
    """(reference datasets_prep/__init__.py:117-122) — images + LaMa masks."""
    from lfm_tpu.data.inpainting import InpaintingTrainDataset

    mask_gen = get_mask_generator(None, None, seed=seed)
    indir = config.data.datadir
    return InpaintingTrainDataset(indir=indir, mask_generator=mask_gen,
                                  image_size=config.model.image_size, seed=seed)


__all__ = [
    "DataLoader",
    "get_dataset",
    "get_inpainting_dataset",
    "get_mask_generator",
]
