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


def test_crc32c_known_vectors():
    """RFC 3720 / Castagnoli check value and the TFRecord mask transform."""
    from lfm_tpu.utils.logger import crc32c, masked_crc32c

    assert crc32c(b"123456789") == 0xE3069283
    assert crc32c(b"") == 0
    assert crc32c(b"\x00" * 32) == 0x8A9136AA  # iSCSI all-zeros test vector
    c = crc32c(b"123456789")
    assert masked_crc32c(b"123456789") == (
        (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def test_tensorboard_writer_event_file_roundtrip(tmp_path):
    """Parse the emitted events file with an independent TFRecord/proto
    decoder: framing CRCs must check out and the scalar tags/values/steps
    must round-trip (reference logger.py TensorBoardOutputFormat:110-139,
    reimplemented without the TF dependency)."""
    import glob
    import struct

    from lfm_tpu.utils.logger import MetricLogger, masked_crc32c

    lg = MetricLogger(str(tmp_path), stdout=False, tensorboard=True)
    lg.logkv("loss", 0.5)
    lg.logkv("lr", 1e-4)
    lg.dumpkvs(step=7)
    lg.logkv("loss", 0.25)
    lg.dumpkvs(step=8)
    lg.close()

    files = glob.glob(str(tmp_path / "tb" / "events.out.tfevents.*"))
    assert len(files) == 1
    blob = open(files[0], "rb").read()

    def records(b):
        off = 0
        while off < len(b):
            (length,) = struct.unpack_from("<Q", b, off)
            (len_crc,) = struct.unpack_from("<I", b, off + 8)
            assert len_crc == masked_crc32c(b[off:off + 8])
            data = b[off + 12: off + 12 + length]
            (data_crc,) = struct.unpack_from("<I", b, off + 12 + length)
            assert data_crc == masked_crc32c(data)
            yield data
            off += 12 + length + 4

    def parse_fields(data):
        """Minimal proto wire-format walk -> {field_num: [values]}."""
        out = {}
        off = 0
        while off < len(data):
            key = 0
            shift = 0
            while True:
                b7 = data[off]; off += 1
                key |= (b7 & 0x7F) << shift
                shift += 7
                if not b7 & 0x80:
                    break
            num, wire = key >> 3, key & 7
            if wire == 0:
                v = 0; shift = 0
                while True:
                    b7 = data[off]; off += 1
                    v |= (b7 & 0x7F) << shift
                    shift += 7
                    if not b7 & 0x80:
                        break
            elif wire == 1:
                v = struct.unpack_from("<d", data, off)[0]; off += 8
            elif wire == 5:
                v = struct.unpack_from("<f", data, off)[0]; off += 4
            elif wire == 2:
                ln = 0; shift = 0
                while True:
                    b7 = data[off]; off += 1
                    ln |= (b7 & 0x7F) << shift
                    shift += 7
                    if not b7 & 0x80:
                        break
                v = data[off:off + ln]; off += ln
            else:
                raise AssertionError(f"wire {wire}")
            out.setdefault(num, []).append(v)
        return out

    recs = list(records(blob))
    assert len(recs) == 3  # file_version + 2 scalar events
    first = parse_fields(recs[0])
    assert first[3] == [b"brain.Event:2"]

    seen = {}
    for rec in recs[1:]:
        ev = parse_fields(rec)
        step = ev[2][0]
        for val_bytes in parse_fields(ev[5][0])[1]:
            val = parse_fields(val_bytes)
            seen[(step, val[1][0].decode())] = val[2][0]
    assert abs(seen[(7, "loss")] - 0.5) < 1e-7
    assert abs(seen[(7, "lr")] - 1e-4) < 1e-10
    assert abs(seen[(8, "loss")] - 0.25) < 1e-7
