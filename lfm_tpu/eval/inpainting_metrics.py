"""Inpainting metrics: FID + PIDS/UIDS (reference pytorch_fid/cal_inpainting.py).

P-IDS/U-IDS (paired / unpaired inception discriminative score, CoModGAN):
fit a LinearSVC separating real vs fake pool3 activations;
UIDS = 1 - accuracy (reference cal_inpainting.py:173-180), PIDS = fraction
of fakes scored more real than their paired real image (:181-182). Instead
of the StyleGAN TorchScript inception the reference downloads
(cal_inpainting.py:137-140), activations come from the same JAX FID
InceptionV3 (eval/inception.py) — the detector choice shifts absolute FID
slightly but PIDS/UIDS are rank-based on a single detector, so comparisons
remain valid.
"""

from __future__ import annotations

import glob
import os
from typing import Optional, Sequence, Tuple

import numpy as np

from lfm_tpu.eval.fid import ActivationExtractor, calculate_frechet_distance


def _list_images(folder: str, limit: Optional[int] = None):
    files = sorted(glob.glob(os.path.join(folder, "*.png"))
                   + glob.glob(os.path.join(folder, "*.jpg")))
    return files[:limit] if limit else files


def _activations(files: Sequence[str], extractor: ActivationExtractor,
                 batch_size: int = 50) -> np.ndarray:
    from PIL import Image

    acts = []
    for i in range(0, len(files), batch_size):
        imgs = [np.asarray(Image.open(f).convert("RGB"), np.float32) / 255.0
                for f in files[i : i + batch_size]]
        acts.append(extractor(np.stack(imgs)))
    return np.concatenate(acts, axis=0)


def pids_uids(fake_acts: np.ndarray, real_acts: np.ndarray) -> Tuple[float, float]:
    """(reference cal_inpainting.py:173-182)."""
    from sklearn import svm as sk_svm

    clf = sk_svm.LinearSVC(dual=False)
    inputs = np.concatenate([real_acts, fake_acts])
    targets = np.array([1] * len(real_acts) + [0] * len(fake_acts))
    clf.fit(inputs, targets)
    uids = 1.0 - clf.score(inputs, targets)
    real_out = clf.decision_function(real_acts)
    fake_out = clf.decision_function(fake_acts)
    pids = float(np.mean(fake_out > real_out))
    return pids, float(uids)


def calculate_metrics(fake_folder: str, real_folder: str, inception_params,
                      batch_size: int = 50, limit: Optional[int] = 2950):
    """(reference cal_inpainting.py:126-184): returns (fid, pids, uids)."""
    l_fake = _list_images(fake_folder)
    l_real = _list_images(real_folder, limit=limit)
    assert len(l_fake) == len(l_real), (len(l_fake), len(l_real))

    extractor = ActivationExtractor(inception_params)
    fake_acts = _activations(l_fake, extractor, batch_size)
    real_acts = _activations(l_real, extractor, batch_size)

    mu1, sigma1 = fake_acts.mean(0), np.cov(fake_acts, rowvar=False)
    mu2, sigma2 = real_acts.mean(0), np.cov(real_acts, rowvar=False)
    fid = calculate_frechet_distance(mu1, sigma1, mu2, sigma2)
    pids, uids = pids_uids(fake_acts, real_acts)
    return fid, pids, uids


def metrics_from_activations(fake_acts: np.ndarray, real_acts: np.ndarray):
    """In-memory variant for the sharded generation path."""
    mu1, sigma1 = fake_acts.mean(0), np.cov(fake_acts, rowvar=False)
    mu2, sigma2 = real_acts.mean(0), np.cov(real_acts, rowvar=False)
    fid = calculate_frechet_distance(mu1, sigma1, mu2, sigma2)
    pids, uids = pids_uids(fake_acts, real_acts)
    return fid, pids, uids
