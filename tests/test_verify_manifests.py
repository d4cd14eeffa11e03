"""The weight-validation tools (tools/verify_fid_weights.py,
tools/verify_inpainting_detector.py) execute protocols pinned in
tools/manifests/*.json the moment the published checkpoints can be
downloaded (zero egress here). Everything EXCEPT the download is testable
now: the manifests' structure, the deterministic probe constructions, and
the framework-side feature paths the tools drive.

Reference: pytorch_fid/inception.py:23,70-77 (FID bit-comparability) and
pytorch_fid/cal_inpainting.py:17-29,137-140 (StyleGAN2-ADA TorchScript
detector for P-IDS/U-IDS).
"""

import importlib
import json
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

vfw = importlib.import_module("tools.verify_fid_weights")
vid = importlib.import_module("tools.verify_inpainting_detector")


def _manifest(name):
    with open(os.path.join(REPO, "tools", "manifests", name)) as f:
        return json.load(f)


def test_fid_manifest_structure():
    m = _manifest("fid_inception.json")
    assert m["sha256_prefix"] == "6726825d"  # pinned in the published name
    assert m["file"].endswith(f"-{m['sha256_prefix']}.pth")
    assert {"probe64", "probe299"} <= set(m["fingerprints"])
    shapes = {s["name"]: s["shape"] for s in m["probe"]["sets"]}
    batches = vfw.probe_batches()
    for name, batch in batches.items():
        assert list(batch.shape) == shapes[name]
        assert batch.dtype == np.float32


def test_inpainting_manifest_structure():
    m = _manifest("inpainting_detector.json")
    assert m["file"] == "inception-2015-12-05.pt"
    assert {"probe64", "probe299", "substitution_delta"} <= set(m["fingerprints"])
    shapes = {s["name"]: s["shape"] for s in m["probe"]["sets"]}
    batches = vid.probe_batches(vid._rng())
    for name, batch in batches.items():
        assert list(batch.shape) == shapes[name]
        assert batch.dtype == np.uint8


def test_probe_constructions_deterministic():
    a = vfw.probe_batches()
    b = vfw.probe_batches()
    for k in a:
        np.testing.assert_array_equal(a[k], b[k])
    r1, r2 = vid._rng(), vid._rng()
    pa, pb = vid.probe_batches(r1), vid.probe_batches(r2)
    for k in pa:
        np.testing.assert_array_equal(pa[k], pb[k])
    # the delta sets are drawn AFTER the probes with the SAME generator —
    # order is part of the pinned protocol
    (ra, fa), (rb, fb) = vid.delta_sets(r1), vid.delta_sets(r2)
    np.testing.assert_array_equal(ra, rb)
    np.testing.assert_array_equal(fa, fb)
    assert ra.dtype == fa.dtype == np.uint8
    # fake is a bounded perturbation of its paired real
    assert np.max(np.abs(fa.astype(np.int16) - ra.astype(np.int16))) <= 24
    assert np.any(fa != ra)


@pytest.mark.slow
def test_substituted_feature_path_runs():
    """Drives the exact framework-side path the delta experiment uses
    (uint8 NCHW -> NHWC [0,1] -> FIDInceptionV3 pool3), with random-init
    weights — the real ones need the blocked download."""
    import jax
    import jax.numpy as jnp

    from lfm_tpu.eval.inception import FIDInceptionV3

    real, _ = vid.delta_sets(vid._rng())
    model = FIDInceptionV3(dtype=jnp.float32)
    params = model.init(jax.random.PRNGKey(0),
                        jnp.zeros((1, 64, 64, 3), jnp.float32))
    feats = vid.substituted_features(params, real[:2])
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()
    fp = vid.fingerprint(feats)
    assert set(fp) == {"feat_mean", "feat_std", "feat_first8"}
    assert len(fp["feat_first8"]) == 8
