"""Auxiliary subsystem tests: logger, profiling, segmentation, IS, PIDS/UIDS."""

import os

import numpy as np
import pytest
from PIL import Image

from lfm_tpu.eval.inception_score import inception_score_from_probs
from lfm_tpu.eval.inpainting_metrics import metrics_from_activations, pids_uids
from lfm_tpu.utils.logger import MetricLogger
from lfm_tpu.utils.profiling import Timer, measure_latency


def test_metric_logger(tmp_path):
    log = MetricLogger(str(tmp_path), stdout=False)
    log.logkv("loss", 1.5)
    log.logkv_mean("acc", 0.5)
    log.logkv_mean("acc", 1.0)
    out = log.dumpkvs(step=1)
    assert out["loss"] == 1.5
    assert out["acc"] == 0.75
    log.logkv("loss", 1.0)
    log.logkv("new_key", 7)
    log.dumpkvs(step=2)
    log.close()
    assert os.path.exists(tmp_path / "progress.csv")
    assert os.path.exists(tmp_path / "metrics.jsonl")
    import csv

    rows = list(csv.DictReader(open(tmp_path / "progress.csv")))
    assert len(rows) == 2
    assert "new_key" in rows[0]


def test_profiling_timer():
    import jax.numpy as jnp

    def f(x):
        return x * 2

    mean, std = measure_latency(f, jnp.ones(8), warmup=1, reps=3)
    assert mean >= 0
    with Timer() as t:
        pass
    assert t.elapsed >= 0


def test_inception_score_uniform_vs_confident():
    n, k = 100, 10
    uniform = np.full((n, k), 1.0 / k)
    is_u, _ = inception_score_from_probs(uniform, splits=2)
    assert abs(is_u - 1.0) < 1e-5  # no information -> IS = 1
    confident = np.eye(k)[np.arange(n) % k] * 0.99 + 0.001
    confident /= confident.sum(1, keepdims=True)
    is_c, _ = inception_score_from_probs(confident, splits=2)
    assert is_c > 5.0  # diverse + confident -> high IS


def test_pids_uids_separable_vs_identical():
    rng = np.random.default_rng(0)
    real = rng.normal(size=(100, 16))
    # clearly separable fakes -> SVM separates -> uids ~ 0, pids ~ 0
    fake_far = real + 10.0
    pids, uids = pids_uids(fake_far, real)
    assert uids < 0.1
    assert pids < 0.1
    # identical distributions -> indistinguishable -> uids ~ 0.5
    fake_same = rng.normal(size=(100, 16))
    pids2, uids2 = pids_uids(fake_same, real)
    assert uids2 > 0.2
    fid, p3, u3 = metrics_from_activations(fake_same, real)
    assert fid < 10


def test_segmentation_base(tmp_path):
    from lfm_tpu.data.segmentation import SegmentationBase

    rng = np.random.default_rng(0)
    img_dir = tmp_path / "images"
    seg_dir = tmp_path / "segs"
    img_dir.mkdir()
    seg_dir.mkdir()
    names = []
    for i in range(3):
        name = f"{i}.jpg"
        Image.fromarray(rng.integers(0, 255, (80, 100, 3), np.uint8)).save(img_dir / name)
        Image.fromarray(rng.integers(0, 10, (80, 100), np.uint8), mode="L").save(
            seg_dir / name.replace(".jpg", ".png"))
        names.append(name)
    csv = tmp_path / "train.txt"
    csv.write_text("\n".join(names))

    ds = SegmentationBase(str(csv), str(img_dir), str(seg_dir), size=64, n_labels=10)
    img, seg = ds[0]
    assert img.shape == (64, 64, 3)
    assert seg.shape == (64, 64)
    assert seg.max() < 10
    assert -1.0 <= img.min() and img.max() <= 1.0


def test_celebamask_rasterizer(tmp_path):
    from lfm_tpu.data.segmentation import CelebAMask, rasterize_celebamask_parts

    anno = tmp_path / "anno"
    (anno / "0").mkdir(parents=True)
    m = np.zeros((32, 32), np.uint8)
    m[4:10, 4:10] = 255
    Image.fromarray(m).save(anno / "0" / "00000_skin.png")
    m2 = np.zeros((32, 32), np.uint8)
    m2[20:25, 20:25] = 255
    Image.fromarray(m2).save(anno / "0" / "00000_hair.png")

    out = tmp_path / "mask"
    rasterize_celebamask_parts(str(anno), str(out), image_size=32, num_images=1)
    lab = np.asarray(Image.open(out / "0.png"))
    assert lab[5, 5] == 1  # skin = class 1
    assert lab[22, 22] == CelebAMask.CLASSES.index("hair")
    assert lab[0, 0] == 0
