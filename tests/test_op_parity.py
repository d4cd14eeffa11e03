"""Operator-level parity vs torch core ops.

The converters' layout conventions (OIHW->HWIO, asymmetric padding,
interpolation modes, count_include_pad pooling, GroupNorm math) are where
checkpoint-conversion fidelity lives (SURVEY.md hard part #3). These tests
pin each building block against the exact torch op the reference uses —
torch core only, no reference code.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp


def _t(x):
    return torch.from_numpy(np.asarray(x))


def test_conv3x3_same_padding():
    """nn.Conv(padding=1) NHWC vs torch conv2d(padding=1) NCHW with
    transposed weights."""
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 11, 3)).astype(np.float32)
    w = rng.normal(size=(5, 3, 3, 3)).astype(np.float32)  # OIHW
    b = rng.normal(size=(5,)).astype(np.float32)

    want = torch.nn.functional.conv2d(_t(x.transpose(0, 3, 1, 2)), _t(w), _t(b),
                                      padding=1).numpy()

    from flax import linen as nn

    conv = nn.Conv(5, (3, 3), padding=1)
    params = {"params": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b)}}
    got = np.asarray(conv.apply(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_vae_asymmetric_downsample():
    """SD-VAE Downsample: pad (0,1,0,1) + stride-2 VALID conv
    (diffusers Downsample2D semantics)."""
    rng = np.random.default_rng(1)
    x = rng.normal(size=(1, 8, 8, 3)).astype(np.float32)
    w = rng.normal(size=(4, 3, 3, 3)).astype(np.float32)
    b = np.zeros(4, np.float32)

    xt = _t(x.transpose(0, 3, 1, 2))
    xt = torch.nn.functional.pad(xt, (0, 1, 0, 1))
    want = torch.nn.functional.conv2d(xt, _t(w), _t(b), stride=2).numpy()

    from lfm_tpu.vae.autoencoder_kl import Downsample

    m = Downsample(4)
    params = {"params": {"conv": {"kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
                                  "bias": jnp.asarray(b)}}}
    got = np.asarray(m.apply(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_nearest_upsample_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 5, 7, 2)).astype(np.float32)
    want = torch.nn.functional.interpolate(_t(x.transpose(0, 3, 1, 2)),
                                           scale_factor=2, mode="nearest").numpy()
    got = np.asarray(jax.image.resize(jnp.asarray(x), (1, 10, 14, 2),
                                      method="nearest")).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_bilinear_resize_matches_torch():
    """SpatialRescaler's half-res bilinear (align_corners=False)."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(1, 16, 16, 3)).astype(np.float32)
    want = torch.nn.functional.interpolate(_t(x.transpose(0, 3, 1, 2)),
                                           scale_factor=0.5, mode="bilinear",
                                           align_corners=False).numpy()
    got = np.asarray(jax.image.resize(jnp.asarray(x), (1, 8, 8, 3),
                                      method="bilinear",
                                      antialias=False)).transpose(0, 3, 1, 2)
    # (antialias=True, jax's default, does NOT match torch on downsampling —
    # SpatialRescaler must pass antialias=False; see nn/encoders.py)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_avg_pool_count_include_pad_false():
    """FID inception pool branches (pytorch_fid FIDInceptionA/C)."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(1, 6, 6, 2)).astype(np.float32)
    want = torch.nn.functional.avg_pool2d(_t(x.transpose(0, 3, 1, 2)), 3,
                                          stride=1, padding=1,
                                          count_include_pad=False).numpy()
    from lfm_tpu.eval.inception import _avg_pool_no_pad_count

    got = np.asarray(_avg_pool_no_pad_count(jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_groupnorm_matches_torch():
    rng = np.random.default_rng(5)
    x = rng.normal(size=(2, 4, 4, 32)).astype(np.float32)
    wt = rng.normal(size=(32,)).astype(np.float32)
    bs = rng.normal(size=(32,)).astype(np.float32)
    want = torch.nn.functional.group_norm(_t(x.transpose(0, 3, 1, 2)), 8,
                                          _t(wt), _t(bs), eps=1e-5).numpy()
    from flax import linen as nn

    gn = nn.GroupNorm(num_groups=8, epsilon=1e-5)
    params = {"params": {"scale": jnp.asarray(wt), "bias": jnp.asarray(bs)}}
    got = np.asarray(gn.apply(params, jnp.asarray(x))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_gelu_tanh_and_silu():
    x = np.linspace(-4, 4, 101).astype(np.float32)
    want_gelu = torch.nn.functional.gelu(_t(x), approximate="tanh").numpy()
    got_gelu = np.asarray(jax.nn.gelu(jnp.asarray(x), approximate=True))
    np.testing.assert_allclose(got_gelu, want_gelu, rtol=1e-5, atol=1e-6)
    want_silu = torch.nn.functional.silu(_t(x)).numpy()
    got_silu = np.asarray(jax.nn.silu(jnp.asarray(x)))
    np.testing.assert_allclose(got_silu, want_silu, rtol=1e-5, atol=1e-6)


def test_edm_depthwise_resample_matches_torch():
    """EDM Conv2d up/down with the [1,3,3,1] filter (models/EDM.py:96-127
    semantics, implemented with torch core ops here)."""
    rng = np.random.default_rng(6)
    c = 3
    x = rng.normal(size=(1, 8, 8, c)).astype(np.float32)
    f = np.asarray([1.0, 3.0, 3.0, 1.0], np.float32)
    k = np.outer(f, f) / f.sum() ** 2
    f_pad = (len(f) - 1) // 2

    xt = _t(x.transpose(0, 3, 1, 2))
    kt = _t(np.tile(k[None, None], (c, 1, 1, 1)))

    want_down = torch.nn.functional.conv2d(xt, kt, stride=2, padding=f_pad,
                                           groups=c).numpy()
    from lfm_tpu.nn.edm_unet import depthwise_down, depthwise_up

    got_down = np.asarray(depthwise_down(jnp.asarray(x), tuple(f))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_down, want_down, rtol=1e-4, atol=1e-5)

    # grouped conv_transpose2d weight layout: (in_ch, out_ch/groups, kH, kW)
    want_up = torch.nn.functional.conv_transpose2d(
        xt, _t(np.tile((k * 4)[None, None], (c, 1, 1, 1))),
        stride=2, padding=f_pad, groups=c).numpy()
    got_up = np.asarray(depthwise_up(jnp.asarray(x), tuple(f))).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got_up, want_up, rtol=1e-4, atol=1e-5)


def test_timestep_embedding_matches_torch_formula():
    """cos-first sinusoidal embedding (models/DiT.py:53-62 formula written
    in torch here)."""
    import math

    t = np.array([0.0, 0.25, 0.5, 1.0], np.float32)
    dim = 256
    half = dim // 2
    freqs = torch.exp(-math.log(10000) * torch.arange(half, dtype=torch.float32) / half)
    args = _t(t)[:, None] * freqs[None]
    want = torch.cat([torch.cos(args), torch.sin(args)], dim=-1).numpy()

    from lfm_tpu.nn.layers import timestep_embedding

    got = np.asarray(timestep_embedding(jnp.asarray(t), dim))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
