"""Int8 (w8a8) DiT sampling path: quantization error bounds and wiring.

The int8 path is pure XLA (nn/dit_int8.py), so the exact program the TPU
runs is exercised here on CPU — only the MXU int8 rate differs on chip.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lfm_tpu.nn.dit import DiT
from lfm_tpu.nn.dit_int8 import (dit_int8_apply, int8_applicable,
                                 quantize_params_int8, quantize_weight)


def _small_dit_and_params(num_classes=10):
    model = DiT(img_resolution=16, patch_size=2, in_channels=4,
                hidden_size=128, depth=3, num_heads=4,
                num_classes=num_classes, dtype=jnp.bfloat16,
                scan_blocks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    t = jnp.linspace(0.1, 0.9, 4)
    y = jnp.array([0, 3, 5, 9]) if num_classes > 1 else None
    params = model.init(jax.random.PRNGKey(1), t, x, y)
    # randomize zero-init tables so the comparison is nontrivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.05
              for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    return model, params, t, x, y


def test_quantize_weight_roundtrip():
    """Per-output-channel symmetric int8: dequantized weight within one
    quantization step of the original, per column; stacked layout too."""
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 96)) * 0.3
    q, s = quantize_weight(w)
    assert q.dtype == jnp.int8 and s.shape == (1, 96)
    err = np.abs(np.asarray(q, np.float32) * np.asarray(s) - np.asarray(w))
    assert (err <= np.asarray(s) * 0.5 + 1e-7).all()

    ws = jnp.stack([w, 2 * w])  # scan-stacked (L, K, N)
    qs, ss = quantize_weight(ws)
    assert qs.shape == (2, 64, 96) and ss.shape == (2, 1, 96)
    np.testing.assert_allclose(np.asarray(ss[1]), 2 * np.asarray(ss[0]),
                               rtol=1e-6)


def test_int8_forward_parity():
    """Full forward: int8 path within a few percent of the f32 module path
    (the same tolerance regime as the bf16 fused path, which itself sits
    at ~1-2% on these shapes)."""
    model, params, t, x, y = _small_dit_and_params()
    want = np.asarray(model.apply(params, t, x, y), np.float32)
    qp = quantize_params_int8(model, params)
    got = np.asarray(jax.jit(
        lambda qp, t, x, y: dit_int8_apply(model, qp, t, x, y)
    )(qp, t, x, y), np.float32)
    assert got.shape == want.shape
    denom = max(1e-3, float(np.abs(want).max()))
    assert float(np.abs(got - want).max()) / denom < 0.08
    # correlation: quantization must not decorrelate the field
    cos = float((got * want).sum()
                / (np.linalg.norm(got) * np.linalg.norm(want) + 1e-9))
    assert cos > 0.995


def test_int8_unconditional_and_gate():
    # unconditional = single-class table, y=None (bench/celeb presets)
    model, params, t, x, _ = _small_dit_and_params(num_classes=1)
    qp = quantize_params_int8(model, params)
    want = np.asarray(model.apply(params, t, x, None), np.float32)
    got = np.asarray(dit_int8_apply(model, qp, t, x, None), np.float32)
    denom = max(1e-3, float(np.abs(want).max()))
    assert float(np.abs(got - want).max()) / denom < 0.08

    assert int8_applicable(model, x)
    assert not int8_applicable(model.copy(scan_blocks=False), x)
    assert not int8_applicable(object(), x)  # non-DiT


def test_int8_sampler_end_to_end():
    """make_sampler with use_int8_dit integrates the ODE through the int8
    path and lands near the bf16 sampler's latents (CLI --int8_dit)."""
    from lfm_tpu.core.config import Config, ModelConfig, SampleConfig
    from lfm_tpu.core.rng import SampleRNG
    from lfm_tpu.sample.sample import make_sampler

    model, params, _, _, _ = _small_dit_and_params()
    mc = ModelConfig(model_type="DiT-S/2", image_size=128, num_classes=10)
    base = dict(method="euler", num_steps=6, cfg_scale=1.5)
    noise = SampleRNG(0).randn(jnp.arange(4), (16, 16, 4))
    y = jnp.array([1, 2, 3, 4])

    cfg8 = Config(model=mc, sample=SampleConfig(use_int8_dit=True, **base))
    out8 = make_sampler(cfg8, model, params, jit=True)(noise, y)
    cfg16 = Config(model=mc, sample=SampleConfig(use_fused_dit=False, **base))
    out16 = make_sampler(cfg16, model, params, jit=True)(noise, y)

    a = np.asarray(out8.latents, np.float32)
    b = np.asarray(out16.latents, np.float32)
    assert np.isfinite(a).all()
    denom = max(1e-3, float(np.abs(b).max()))
    # quantization error accumulates over 6 euler steps; stays bounded
    assert float(np.abs(a - b).max()) / denom < 0.15


def test_int8_quantized_tree_is_jit_stable():
    """The quantized pytree flows through jit as an argument (the repo's
    params-as-arguments rule) and reuses the cache across calls."""
    model, params, t, x, y = _small_dit_and_params()
    qp = quantize_params_int8(model, params)
    f = jax.jit(lambda qp, t, x, y: dit_int8_apply(model, qp, t, x, y))
    a = f(qp, t, x, y)
    b = f(qp, t, x, y)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert f._cache_size() == 1
