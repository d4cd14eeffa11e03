"""Activation-level parity of the LPIPS/VGG16 port (VERDICT round-1 #3).

Ground truth is an independent straight-line NumPy implementation of the
reference's vendored LaMa LPIPS (reference
datasets_prep/inpaint_preprocess/losses/lpips.py: ScalingLayer shift/scale,
torchvision VGG16 features, channel-unit-normalized squared diffs, 1x1
linear heads, spatial mean). Both sides consume the SAME random state dicts
in torchvision/lpips tensor naming, validating convert_lpips_state_dict too.
"""

import jax.numpy as jnp
import numpy as np

from lfm_tpu.eval.perceptual import LPIPS, convert_lpips_state_dict

_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
        512, 512, 512)
_TAPS = (1, 3, 6, 9, 12)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32).reshape(1, 3, 1, 1)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32).reshape(1, 3, 1, 1)


def conv2d_bias(x, w, b, pad=1):
    """F.conv2d stride 1, symmetric pad. x (N,C,H,W), w (O,I,3,3)."""
    x = np.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)))
    n, c, h, wd = x.shape
    o, i, kh, kw = w.shape
    s = x.strides
    view = np.lib.stride_tricks.as_strided(
        x, (n, c, h - kh + 1, wd - kw + 1, kh, kw),
        (s[0], s[1], s[2], s[3], s[2], s[3]))
    out = np.einsum("nchwij,ocij->nohw", view, w, optimize=True)
    return (out + b.reshape(1, o, 1, 1)).astype(np.float32)


def max_pool2(x):
    n, c, h, w = x.shape
    return x.reshape(n, c, h // 2, 2, w // 2, 2).max(axis=(3, 5))


def make_state_dicts(seed=0):
    rng = np.random.default_rng(seed)
    vgg_sd, lin_sd = {}, {}
    ti, in_ch = 0, 3
    tap_channels = []
    conv_i = 0
    for v in _CFG:
        if v == "M":
            ti += 1
            continue
        vgg_sd[f"features.{ti}.weight"] = (
            rng.standard_normal((v, in_ch, 3, 3)) * np.sqrt(2.0 / (in_ch * 9))
        ).astype(np.float32)
        vgg_sd[f"features.{ti}.bias"] = rng.uniform(-0.1, 0.1, (v,)).astype(np.float32)
        if conv_i in _TAPS:
            tap_channels.append(v)
        in_ch = v
        ti += 2  # conv + relu
        conv_i += 1
    for i, ch in enumerate(tap_channels):
        lin_sd[f"lin{i}.model.1.weight"] = (
            rng.uniform(0, 0.1, (1, ch, 1, 1))).astype(np.float32)
    return vgg_sd, lin_sd


def numpy_vgg_taps(vgg_sd, x):
    feats = []
    ti = 0
    conv_i = 0
    for v in _CFG:
        if v == "M":
            x = max_pool2(x)
            ti += 1
            continue
        x = conv2d_bias(x, vgg_sd[f"features.{ti}.weight"],
                        vgg_sd[f"features.{ti}.bias"])
        x = np.maximum(x, 0.0)
        if conv_i in _TAPS:
            feats.append(x)
        ti += 2
        conv_i += 1
    return feats


def numpy_lpips(vgg_sd, lin_sd, x, y):
    """x, y: (N,3,H,W) in [-1,1] — LaMa lpips.py forward, straight-line."""
    fx = numpy_vgg_taps(vgg_sd, (x - _SHIFT) / _SCALE)
    fy = numpy_vgg_taps(vgg_sd, (y - _SHIFT) / _SCALE)
    total = 0.0
    for i, (a, b) in enumerate(zip(fx, fy)):
        na = a / (np.sqrt((a ** 2).sum(axis=1, keepdims=True)) + 1e-10)
        nb = b / (np.sqrt((b ** 2).sum(axis=1, keepdims=True)) + 1e-10)
        diff = (na - nb) ** 2
        w = lin_sd[f"lin{i}.model.1.weight"][:, :, 0, 0]  # (1, C)
        lin = np.einsum("nchw,oc->nohw", diff, w)
        total = total + lin.mean(axis=(1, 2, 3))
    return total.astype(np.float32)


def test_lpips_parity_on_random_converted_weights():
    vgg_sd, lin_sd = make_state_dicts(seed=5)
    rng = np.random.default_rng(6)
    x = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)
    y = rng.uniform(-1, 1, (2, 3, 64, 64)).astype(np.float32)

    want = numpy_lpips(vgg_sd, lin_sd, x, y)

    model = LPIPS()
    params = convert_lpips_state_dict(vgg_sd, lin_sd)
    got = np.asarray(model.apply(params, jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 jnp.asarray(y.transpose(0, 2, 3, 1))))

    assert got.shape == (2,)
    assert np.all(want > 1e-4)  # non-vacuous distances
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lpips_zero_for_identical_inputs():
    vgg_sd, lin_sd = make_state_dicts(seed=7)
    x = np.random.default_rng(8).uniform(-1, 1, (1, 3, 32, 32)).astype(np.float32)
    model = LPIPS()
    params = convert_lpips_state_dict(vgg_sd, lin_sd)
    xin = jnp.asarray(x.transpose(0, 2, 3, 1))
    got = float(model.apply(params, xin, xin)[0])
    assert abs(got) < 1e-7
