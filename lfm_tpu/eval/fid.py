"""FID computation: pool3 statistics + Fréchet distance.

Mirrors the reference scoring path (reference pytorch_fid/fid_score.py):
activations batched through InceptionV3 on device, mu/sigma on host,
``scipy.linalg.sqrtm`` Fréchet distance with the same eps fallback
(fid_score.py:177-227), and the same stats-file format — ``.npy`` holding a
pickled {"mu", "sigma"} dict or an ``.npz`` with those keys
(fid_score.py:254-265), so the reference's precomputed dataset stats load
unchanged.
"""

from __future__ import annotations

import os
import pathlib
from typing import Iterable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

IMAGE_EXTENSIONS = {"bmp", "jpg", "jpeg", "pgm", "png", "ppm", "tif", "tiff", "webp"}


def calculate_frechet_distance(mu1, sigma1, mu2, sigma2, eps: float = 1e-6) -> float:
    """Stable Fréchet distance (fid_score.py:177-227)."""
    from scipy import linalg

    mu1, mu2 = np.atleast_1d(mu1), np.atleast_1d(mu2)
    sigma1, sigma2 = np.atleast_2d(sigma1), np.atleast_2d(sigma2)
    assert mu1.shape == mu2.shape and sigma1.shape == sigma2.shape

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            raise ValueError(f"Imaginary component {np.max(np.abs(covmean.imag))}")
        covmean = covmean.real
    return float(diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean))


class ActivationExtractor:
    """jitted pool3 feature extractor over [0,1] NHWC image batches."""

    def __init__(self, params, dtype=jnp.float32):
        from lfm_tpu.eval.inception import FIDInceptionV3

        self._model = FIDInceptionV3(dtype=dtype)
        self._params = params
        self._fn = jax.jit(lambda p, x: self._model.apply(p, x))

    def __call__(self, images: np.ndarray) -> np.ndarray:
        return np.asarray(self._fn(self._params, jnp.asarray(images)))

    def over_batches(self, batches: Iterable[np.ndarray]) -> np.ndarray:
        return np.concatenate([self(b) for b in batches], axis=0)


def activation_statistics(acts: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    mu = np.mean(acts, axis=0)
    sigma = np.cov(acts, rowvar=False)
    return mu, sigma


def load_statistics(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Read the reference's stats format (fid_score.py:254-261)."""
    f = np.load(path, allow_pickle=True)
    try:
        return f["mu"][:], f["sigma"][:]
    except IndexError:
        d = f.item()
        return d["mu"][:], d["sigma"][:]


def save_statistics(path: str, mu: np.ndarray, sigma: np.ndarray) -> None:
    """Write stats compatible with the reference's .npy dict format
    (pytorch_fid/compute_dataset_stat.py:50-57)."""
    np.save(path, {"mu": mu, "sigma": sigma})


def _iter_image_files(path: str):
    p = pathlib.Path(path)
    return sorted(f for ext in IMAGE_EXTENSIONS for f in p.glob(f"*.{ext}"))


def statistics_of_path(path: str, extractor: ActivationExtractor,
                       batch_size: int = 50) -> Tuple[np.ndarray, np.ndarray]:
    if path.endswith((".npz", ".npy")):
        return load_statistics(path)
    from PIL import Image

    files = _iter_image_files(path)
    if not files:
        raise RuntimeError(f"no images found in {path}")
    acts = []
    for i in range(0, len(files), batch_size):
        imgs = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
                for f in files[i : i + batch_size]]
        acts.append(extractor(np.stack(imgs)))
    return activation_statistics(np.concatenate(acts, axis=0))


def calculate_fid_given_paths(paths: Sequence[str], inception_params,
                              batch_size: int = 50) -> float:
    """Drop-in equivalent of fid_score.py:268-283 (paths may be image dirs or
    precomputed-stats files)."""
    for p in paths:
        if not os.path.exists(p):
            raise RuntimeError(f"Invalid path: {p}")
    extractor = ActivationExtractor(inception_params)
    m1, s1 = statistics_of_path(paths[0], extractor, batch_size)
    m2, s2 = statistics_of_path(paths[1], extractor, batch_size)
    return calculate_frechet_distance(m1, s1, m2, s2)


def fid_from_activations(acts: np.ndarray, stats_path: str) -> float:
    """FID of in-memory generated-sample activations vs precomputed stats —
    the sharded-generation fast path (no JPEG round-trip)."""
    mu1, sigma1 = activation_statistics(acts)
    mu2, sigma2 = load_statistics(stats_path)
    return calculate_frechet_distance(mu1, sigma1, mu2, sigma2)
