"""Perceptual metrics for inpainting evaluation: SSIM + LPIPS.

Port of the reference's vendored LaMa evaluation losses
(reference datasets_prep/inpaint_preprocess/losses/ssim.py, lpips.py):
  * SSIM: gaussian-window structural similarity (window 11, sigma 1.5);
  * LPIPS: VGG16 feature distances with learned linear weights. The network
    is defined here in flax with a converter for the published
    torchvision-VGG16 + LPIPS-linear checkpoints (no weights are shipped;
    zero-egress environments must provide the files).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


# ---------------------------------------------------------------------------
# SSIM (losses/ssim.py)
# ---------------------------------------------------------------------------

def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, data_range: float = 1.0) -> jnp.ndarray:
    """Mean SSIM per batch item. img: (N, H, W, C) in [0, data_range]."""
    c = img1.shape[-1]
    w = _gaussian_window(window_size, sigma)
    kern = w[:, :, None, None] * jnp.ones((1, 1, 1, c), jnp.float32)
    pad = window_size // 2

    def filt(x):
        return jax.lax.conv_general_dilated(
            x.astype(jnp.float32), kern, (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu1, mu2 = filt(img1), filt(img2)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(img1 * img1) - mu1_sq
    s2 = filt(img2 * img2) - mu2_sq
    s12 = filt(img1 * img2) - mu12
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    m = ((2 * mu12 + c1) * (2 * s12 + c2)) / ((mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return m.mean(axis=(1, 2, 3))


# ---------------------------------------------------------------------------
# LPIPS (losses/lpips.py): VGG16 features + linear heads
# ---------------------------------------------------------------------------

_VGG16_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M", 512, 512, 512, "M",
              512, 512, 512)
# feature taps after relu1_2, relu2_2, relu3_3, relu4_3, relu5_3
_TAPS = (1, 3, 6, 9, 12)  # indices into the conv list (0-based, post-relu)

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class VGG16Features(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        feats = []
        conv_i = 0
        for v in _VGG16_CFG:
            if v == "M":
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            else:
                x = nn.Conv(v, (3, 3), padding=1, dtype=self.dtype,
                            name=f"conv{conv_i}")(x)
                x = nn.relu(x)
                if conv_i in _TAPS:
                    feats.append(x)
                conv_i += 1
        return feats


class LPIPS(nn.Module):
    """Perceptual distance. Inputs in [-1, 1], NHWC."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        shift = jnp.asarray(_SHIFT)
        scale = jnp.asarray(_SCALE)

        def norm_in(z):
            return (z - shift) / scale

        vgg = VGG16Features(dtype=self.dtype, name="vgg")
        fx = vgg(norm_in(x))
        fy = vgg(norm_in(y))
        total = 0.0
        for i, (a, b) in enumerate(zip(fx, fy)):
            a = a / (jnp.linalg.norm(a, axis=-1, keepdims=True) + 1e-10)
            b = b / (jnp.linalg.norm(b, axis=-1, keepdims=True) + 1e-10)
            diff = (a - b) ** 2
            lin = nn.Dense(1, use_bias=False, dtype=self.dtype, name=f"lin{i}")(diff)
            total = total + lin.mean(axis=(1, 2, 3))
        return total


def convert_lpips_state_dict(vgg_sd: Mapping, lin_sd: Mapping) -> Dict:
    """torchvision vgg16 ``features.*`` + lpips ``lin{i}.model.1.weight``
    -> flax params."""

    def _np(t):
        return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)

    conv_layers = [i for i, v in enumerate(_VGG16_CFG) if v != "M"]
    # torchvision indices of conv layers inside features
    tv_idx = []
    i = 0
    for v in _VGG16_CFG:
        if v == "M":
            i += 1  # maxpool
        else:
            tv_idx.append(i)
            i += 2  # conv + relu
    vgg_params = {}
    for ci, ti in enumerate(tv_idx):
        w = _np(vgg_sd[f"features.{ti}.weight"])
        b = _np(vgg_sd[f"features.{ti}.bias"])
        vgg_params[f"conv{ci}"] = {"kernel": w.transpose(2, 3, 1, 0), "bias": b}
    params = {"vgg": vgg_params}
    for i in range(5):
        w = _np(lin_sd[f"lin{i}.model.1.weight"])  # (1, C, 1, 1)
        params[f"lin{i}"] = {"kernel": w[:, :, 0, 0].T}
    return {"params": params}
