"""Activation-level parity of the FID InceptionV3 port (VERDICT round-1 #3).

Ground truth is an INDEPENDENT straight-line NumPy forward, hand-ported from
the reference ``pytorch_fid/inception.py`` (TF-ported graph + FID
modifications: InceptionA/C avg-pool with count_include_pad=False, Mixed_7c
max-pool branch) with exact torch conv/BN/pool semantics in NCHW. Both sides
consume the SAME random state dict in pytorch-fid tensor naming, so this
also validates ``convert_inception_state_dict`` end to end — the same
technique test_convert.py uses for DiT.

Covers: the 299 bilinear resize path (half-pixel centers /
align_corners=False), the [0,1] -> [-1,1] normalization, every block type,
the 2048-d pool3 output, and the 1008-way fc head (Inception Score path).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from lfm_tpu.eval.inception import FIDInceptionV3, convert_inception_state_dict

# ---------------------------------------------------------------------------
# torch-semantics NumPy ops (NCHW)
# ---------------------------------------------------------------------------


def conv2d(x, w, stride=1, pad=(0, 0)):
    """F.conv2d, no bias. x (N,C,H,W), w (O,I,kh,kw), symmetric per-dim pad."""
    ph, pw = pad
    x = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)))
    n, c, h, wdt = x.shape
    o, i, kh, kw = w.shape
    assert i == c
    ho = (h - kh) // stride + 1
    wo = (wdt - kw) // stride + 1
    s = x.strides
    view = np.lib.stride_tricks.as_strided(
        x, (n, c, ho, wo, kh, kw),
        (s[0], s[1], s[2] * stride, s[3] * stride, s[2], s[3]),
    )
    return np.einsum("nchwij,ocij->nohw", view, w, optimize=True).astype(np.float32)


def _pool_view(x, k, stride, pad, fill):
    ph, pw = pad
    x = np.pad(x, ((0, 0), (0, 0), (ph, ph), (pw, pw)),
               constant_values=fill)
    n, c, h, w = x.shape
    ho = (h - k) // stride + 1
    wo = (w - k) // stride + 1
    s = x.strides
    return np.lib.stride_tricks.as_strided(
        x, (n, c, ho, wo, k, k),
        (s[0], s[1], s[2] * stride, s[3] * stride, s[2], s[3]),
    )


def max_pool(x, k=3, stride=2, pad=(0, 0)):
    return _pool_view(x, k, stride, pad, -np.inf).max(axis=(4, 5))


def avg_pool_cip_false(x, k=3, stride=1, pad=(1, 1)):
    """F.avg_pool2d(count_include_pad=False): divide by the number of
    NON-PAD elements under each window."""
    summed = _pool_view(x, k, stride, pad, 0.0).sum(axis=(4, 5))
    ones = np.ones((1, 1) + x.shape[2:], np.float32)
    counts = _pool_view(ones, k, stride, pad, 0.0).sum(axis=(4, 5))
    return (summed / counts).astype(np.float32)


def resize_bilinear_half_pixel(x, oh, ow):
    """F.interpolate(mode='bilinear', align_corners=False): half-pixel
    source coordinates, edge-clamped."""
    n, c, h, w = x.shape

    def axis_weights(in_size, out_size):
        coords = (np.arange(out_size) + 0.5) * (in_size / out_size) - 0.5
        lo = np.floor(coords).astype(np.int64)
        frac = (coords - lo).astype(np.float32)
        lo0 = np.clip(lo, 0, in_size - 1)
        lo1 = np.clip(lo + 1, 0, in_size - 1)
        return lo0, lo1, frac

    y0, y1, fy = axis_weights(h, oh)
    x0, x1, fx = axis_weights(w, ow)
    top = x[:, :, y0][:, :, :, x0] * (1 - fx) + x[:, :, y0][:, :, :, x1] * fx
    bot = x[:, :, y1][:, :, :, x0] * (1 - fx) + x[:, :, y1][:, :, :, x1] * fx
    return (top * (1 - fy)[None, None, :, None]
            + bot * fy[None, None, :, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# lazy random state dict in pytorch-fid naming (plain numpy, OIHW)
# ---------------------------------------------------------------------------


class LazySD(dict):
    def __init__(self, seed=0):
        super().__init__()
        self.rng = np.random.default_rng(seed)

    def conv_w(self, name, o, i, kh, kw):
        if name not in self:
            fan_in = i * kh * kw
            self[name] = (self.rng.standard_normal((o, i, kh, kw))
                          * np.sqrt(2.0 / fan_in)).astype(np.float32)
        return self[name]

    def bn(self, prefix, c):
        for leaf, lo, hi in (("weight", 0.5, 1.5), ("bias", -0.2, 0.2),
                             ("running_mean", -0.2, 0.2),
                             ("running_var", 0.5, 1.5)):
            key = f"{prefix}.bn.{leaf}"
            if key not in self:
                self[key] = self.rng.uniform(lo, hi, (c,)).astype(np.float32)
        p = f"{prefix}.bn."
        return (self[p + "weight"], self[p + "bias"],
                self[p + "running_mean"], self[p + "running_var"])

    def fc(self, o, i):
        if "fc.weight" not in self:
            self["fc.weight"] = (self.rng.standard_normal((o, i))
                                 * np.sqrt(1.0 / i)).astype(np.float32)
            self["fc.bias"] = self.rng.uniform(-0.1, 0.1, (o,)).astype(np.float32)
        return self["fc.weight"], self["fc.bias"]


# ---------------------------------------------------------------------------
# straight-line network (mirrors pytorch_fid/inception.py + torchvision
# Inception3 topology)
# ---------------------------------------------------------------------------


def basic_conv(sd, prefix, x, o, k, stride=1, pad=(0, 0)):
    kh, kw = (k, k) if isinstance(k, int) else k
    w = sd.conv_w(f"{prefix}.conv.weight", o, x.shape[1], kh, kw)
    x = conv2d(x, w, stride, pad)
    g, b, m, v = sd.bn(prefix, o)
    sh = (1, o, 1, 1)
    x = (x - m.reshape(sh)) / np.sqrt(v.reshape(sh) + 1e-3) * g.reshape(sh) + b.reshape(sh)
    return np.maximum(x, 0.0)


def inception_a(sd, p, x, pool_features):
    b1 = basic_conv(sd, f"{p}.branch1x1", x, 64, 1)
    b5 = basic_conv(sd, f"{p}.branch5x5_1", x, 48, 1)
    b5 = basic_conv(sd, f"{p}.branch5x5_2", b5, 64, 5, pad=(2, 2))
    b3 = basic_conv(sd, f"{p}.branch3x3dbl_1", x, 64, 1)
    b3 = basic_conv(sd, f"{p}.branch3x3dbl_2", b3, 96, 3, pad=(1, 1))
    b3 = basic_conv(sd, f"{p}.branch3x3dbl_3", b3, 96, 3, pad=(1, 1))
    bp = avg_pool_cip_false(x, 3, 1, (1, 1))  # FID modification
    bp = basic_conv(sd, f"{p}.branch_pool", bp, pool_features, 1)
    return np.concatenate([b1, b5, b3, bp], axis=1)


def inception_b(sd, p, x):
    b3 = basic_conv(sd, f"{p}.branch3x3", x, 384, 3, stride=2)
    bd = basic_conv(sd, f"{p}.branch3x3dbl_1", x, 64, 1)
    bd = basic_conv(sd, f"{p}.branch3x3dbl_2", bd, 96, 3, pad=(1, 1))
    bd = basic_conv(sd, f"{p}.branch3x3dbl_3", bd, 96, 3, stride=2)
    bp = max_pool(x, 3, 2)
    return np.concatenate([b3, bd, bp], axis=1)


def inception_c(sd, p, x, c7):
    b1 = basic_conv(sd, f"{p}.branch1x1", x, 192, 1)
    b7 = basic_conv(sd, f"{p}.branch7x7_1", x, c7, 1)
    b7 = basic_conv(sd, f"{p}.branch7x7_2", b7, c7, (1, 7), pad=(0, 3))
    b7 = basic_conv(sd, f"{p}.branch7x7_3", b7, 192, (7, 1), pad=(3, 0))
    bd = basic_conv(sd, f"{p}.branch7x7dbl_1", x, c7, 1)
    bd = basic_conv(sd, f"{p}.branch7x7dbl_2", bd, c7, (7, 1), pad=(3, 0))
    bd = basic_conv(sd, f"{p}.branch7x7dbl_3", bd, c7, (1, 7), pad=(0, 3))
    bd = basic_conv(sd, f"{p}.branch7x7dbl_4", bd, c7, (7, 1), pad=(3, 0))
    bd = basic_conv(sd, f"{p}.branch7x7dbl_5", bd, 192, (1, 7), pad=(0, 3))
    bp = avg_pool_cip_false(x, 3, 1, (1, 1))  # FID modification
    bp = basic_conv(sd, f"{p}.branch_pool", bp, 192, 1)
    return np.concatenate([b1, b7, bd, bp], axis=1)


def inception_d(sd, p, x):
    b3 = basic_conv(sd, f"{p}.branch3x3_1", x, 192, 1)
    b3 = basic_conv(sd, f"{p}.branch3x3_2", b3, 320, 3, stride=2)
    b7 = basic_conv(sd, f"{p}.branch7x7x3_1", x, 192, 1)
    b7 = basic_conv(sd, f"{p}.branch7x7x3_2", b7, 192, (1, 7), pad=(0, 3))
    b7 = basic_conv(sd, f"{p}.branch7x7x3_3", b7, 192, (7, 1), pad=(3, 0))
    b7 = basic_conv(sd, f"{p}.branch7x7x3_4", b7, 192, 3, stride=2)
    bp = max_pool(x, 3, 2)
    return np.concatenate([b3, b7, bp], axis=1)


def inception_e(sd, p, x, pool_kind):
    b1 = basic_conv(sd, f"{p}.branch1x1", x, 320, 1)
    b3 = basic_conv(sd, f"{p}.branch3x3_1", x, 384, 1)
    b3a = basic_conv(sd, f"{p}.branch3x3_2a", b3, 384, (1, 3), pad=(0, 1))
    b3b = basic_conv(sd, f"{p}.branch3x3_2b", b3, 384, (3, 1), pad=(1, 0))
    b3 = np.concatenate([b3a, b3b], axis=1)
    bd = basic_conv(sd, f"{p}.branch3x3dbl_1", x, 448, 1)
    bd = basic_conv(sd, f"{p}.branch3x3dbl_2", bd, 384, 3, pad=(1, 1))
    bda = basic_conv(sd, f"{p}.branch3x3dbl_3a", bd, 384, (1, 3), pad=(0, 1))
    bdb = basic_conv(sd, f"{p}.branch3x3dbl_3b", bd, 384, (3, 1), pad=(1, 0))
    bd = np.concatenate([bda, bdb], axis=1)
    if pool_kind == "avg":  # Mixed_7b: FID avg (count_include_pad=False)
        bp = avg_pool_cip_false(x, 3, 1, (1, 1))
    else:  # Mixed_7c: FID max-pool branch (FIDInceptionE_2)
        bp = max_pool(x, 3, 1, (1, 1))
    bp = basic_conv(sd, f"{p}.branch_pool", bp, 192, 1)
    return np.concatenate([b1, b3, bd, bp], axis=1)


def numpy_fid_inception(sd, x01, include_head=False):
    """x01: (N,3,H,W) in [0,1]. Returns (N,2048) pool3 (or (N,1008) logits)."""
    x = x01
    if x.shape[2] != 299 or x.shape[3] != 299:
        x = resize_bilinear_half_pixel(x, 299, 299)
    x = 2.0 * x - 1.0
    x = basic_conv(sd, "Conv2d_1a_3x3", x, 32, 3, stride=2)
    x = basic_conv(sd, "Conv2d_2a_3x3", x, 32, 3)
    x = basic_conv(sd, "Conv2d_2b_3x3", x, 64, 3, pad=(1, 1))
    x = max_pool(x, 3, 2)
    x = basic_conv(sd, "Conv2d_3b_1x1", x, 80, 1)
    x = basic_conv(sd, "Conv2d_4a_3x3", x, 192, 3)
    x = max_pool(x, 3, 2)
    x = inception_a(sd, "Mixed_5b", x, 32)
    x = inception_a(sd, "Mixed_5c", x, 64)
    x = inception_a(sd, "Mixed_5d", x, 64)
    x = inception_b(sd, "Mixed_6a", x)
    x = inception_c(sd, "Mixed_6b", x, 128)
    x = inception_c(sd, "Mixed_6c", x, 160)
    x = inception_c(sd, "Mixed_6d", x, 160)
    x = inception_c(sd, "Mixed_6e", x, 192)
    x = inception_d(sd, "Mixed_7a", x)
    x = inception_e(sd, "Mixed_7b", x, "avg")
    x = inception_e(sd, "Mixed_7c", x, "max")
    feat = x.mean(axis=(2, 3))
    if include_head:
        w, b = sd.fc(1008, 2048)
        return feat @ w.T + b
    return feat


# ---------------------------------------------------------------------------
# tests
# ---------------------------------------------------------------------------


def test_resize_matches_torch_half_pixel_bilinear():
    """jax.image.resize('bilinear') must equal F.interpolate
    (align_corners=False) — validated against the closed-form numpy
    implementation on an awkward non-integer scale."""
    import jax

    rng = np.random.default_rng(0)
    x = rng.uniform(0, 1, (2, 3, 7, 9)).astype(np.float32)
    want = resize_bilinear_half_pixel(x, 13, 17)
    got = np.asarray(jax.image.resize(
        jnp.asarray(x.transpose(0, 2, 3, 1)), (2, 13, 17, 3),
        method="bilinear", antialias=False)).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_pool3_activation_parity_with_resize():
    """Full-network pool3 parity on random converted weights, INCLUDING the
    128->299 resize path (VERDICT: assert <=1e-4)."""
    sd = LazySD(seed=1)
    rng = np.random.default_rng(2)
    x01 = rng.uniform(0, 1, (2, 3, 128, 128)).astype(np.float32)

    want = numpy_fid_inception(sd, x01)  # also materializes all weights

    model = FIDInceptionV3()
    params = convert_inception_state_dict(sd)
    got = np.asarray(model.apply(params, jnp.asarray(x01.transpose(0, 2, 3, 1))))

    assert got.shape == (2, 2048)
    assert np.abs(want).mean() > 1e-3  # the comparison is not vacuous
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_logits_head_parity_at_299():
    """fc head (Inception Score path) at native 299 input — no resize."""
    sd = LazySD(seed=3)
    rng = np.random.default_rng(4)
    x01 = rng.uniform(0, 1, (1, 3, 299, 299)).astype(np.float32)

    want = numpy_fid_inception(sd, x01, include_head=True)

    model = FIDInceptionV3(include_head=True)
    params = convert_inception_state_dict(sd)
    got = np.asarray(model.apply(params, jnp.asarray(x01.transpose(0, 2, 3, 1))))

    assert got.shape == (1, 1008)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
