"""SSIM / LPIPS / InpaintingEvaluator tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.eval.evaluator import InpaintingEvaluator
from lfm_tpu.eval.perceptual import LPIPS, VGG16Features, convert_lpips_state_dict, ssim


def test_ssim_identity_and_noise():
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 32, 32, 3)).astype(np.float32))
    s_same = ssim(img, img)
    np.testing.assert_allclose(np.asarray(s_same), 1.0, atol=1e-5)
    noisy = jnp.clip(img + 0.3 * rng.normal(size=img.shape).astype(np.float32), 0, 1)
    s_noisy = ssim(img, noisy)
    assert float(s_noisy.mean()) < 0.9
    # more noise -> lower ssim
    worse = jnp.clip(img + 0.8 * rng.normal(size=img.shape).astype(np.float32), 0, 1)
    assert float(ssim(img, worse).mean()) < float(s_noisy.mean())


def test_lpips_zero_for_identical():
    m = LPIPS()
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 64, 64, 3)) * 2 - 1
    p = m.init(jax.random.PRNGKey(1), x, x)
    # force positive linear weights (converted LPIPS weights are nonneg)
    p = jax.tree_util.tree_map(lambda a: jnp.abs(a), p)
    d_same = m.apply(p, x, x)
    np.testing.assert_allclose(np.asarray(d_same), 0.0, atol=1e-6)
    y = jax.random.uniform(jax.random.PRNGKey(2), (1, 64, 64, 3)) * 2 - 1
    assert float(m.apply(p, x, y)[0]) > 0


def test_lpips_converter_structure():
    rng = np.random.default_rng(0)
    vgg_sd = {}
    cfg = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
           512, 512, 512)
    i, cin = 0, 3
    for v in cfg:
        if v == "M":
            i += 1
        else:
            vgg_sd[f"features.{i}.weight"] = rng.normal(size=(v, cin, 3, 3)).astype(np.float32)
            vgg_sd[f"features.{i}.bias"] = np.zeros(v, np.float32)
            cin = v
            i += 2
    chans = [64, 128, 256, 512, 512]
    lin_sd = {
        f"lin{k}.model.1.weight": np.abs(rng.normal(size=(1, chans[k], 1, 1))).astype(np.float32)
        for k in range(5)
    }
    params = convert_lpips_state_dict(vgg_sd, lin_sd)
    m = LPIPS()
    x = jnp.zeros((1, 64, 64, 3))
    init = m.init(jax.random.PRNGKey(0), x, x)
    pi = {jax.tree_util.keystr(p): l.shape for p, l in jax.tree_util.tree_leaves_with_path(init)}
    pc = {jax.tree_util.keystr(p): np.shape(l) for p, l in jax.tree_util.tree_leaves_with_path(params)}
    assert pi == pc
    out = m.apply(params, x, x + 0.1)
    assert np.isfinite(np.asarray(out)).all()


def test_inpainting_evaluator():
    rng = np.random.default_rng(1)
    ev = InpaintingEvaluator()
    real = rng.uniform(0, 1, (4, 32, 32, 3)).astype(np.float32)
    fake = np.clip(real + 0.1 * rng.normal(size=real.shape).astype(np.float32), 0, 1)
    mask = np.zeros((4, 32, 32, 1), np.float32)
    mask[:2, 8:16, 8:16] = 1   # ~6% holes
    mask[2:, 4:28, 4:28] = 1   # ~56% holes
    ev.process_batch(real, fake, mask)
    out = ev.evaluation_end()
    assert 0 < out["ssim"] <= 1
    assert len(out["ssim_by_area"]) == 2
