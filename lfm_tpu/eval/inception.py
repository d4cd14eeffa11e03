"""FID InceptionV3 (pool3 features) in JAX/flax, NHWC.

TPU-native port of the pytorch-fid network the reference evaluates with
(reference pytorch_fid/inception.py:23,70-77): the TF inception-2015-12-05
graph with pytorch-fid's modifications — InceptionA/C pool branches use
average pooling with ``count_include_pad=False``, and the second InceptionE
(Mixed_7c) uses a MAX pool branch. Weights are converted from the published
``pt_inception-2015-12-05-6726825d.pth`` by :func:`convert_inception_state_dict`
(the framework cannot ship the weights; point the loader at a downloaded copy).

Input contract matches pytorch_fid/inception.py:113-124 (via fid_score.py):
images in [0, 1], NHWC; bilinear resize to 299 (half-pixel centers /
align_corners=False), then scaled to [-1, 1]. Output: (N, 2048) pool3
activations. BatchNorm runs in inference form with the checkpoint's running
statistics, unfolded, in the same operation order as torch.
"""

from __future__ import annotations

from typing import Any, Dict, Mapping, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any


class BasicConv(nn.Module):
    """conv(no bias) + BatchNorm(eps=1e-3, inference) + relu."""

    out_ch: int
    kernel: Tuple[int, int] = (3, 3)
    stride: int = 1
    padding: Any = 0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        pad = self.padding
        if isinstance(pad, int):
            pad = ((pad, pad), (pad, pad))
        x = nn.Conv(self.out_ch, self.kernel, strides=self.stride, padding=pad,
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        scale = self.param("bn_scale", nn.initializers.ones, (self.out_ch,))
        offset = self.param("bn_offset", nn.initializers.zeros, (self.out_ch,))
        mean = self.param("bn_mean", nn.initializers.zeros, (self.out_ch,))
        var = self.param("bn_var", nn.initializers.ones, (self.out_ch,))
        x = (x - mean) / jnp.sqrt(var + 1e-3) * scale + offset
        return nn.relu(x)


def _max_pool(x, k=3, s=2, p=0):
    pads = ((0, 0), (p, p), (p, p), (0, 0))
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, k, k, 1), (1, s, s, 1), pads
    )


def _avg_pool_no_pad_count(x, k=3, s=1, p=1):
    """Average pooling with count_include_pad=False (the FID modification,
    pytorch_fid/inception.py FIDInceptionA/C/E)."""
    pads = ((0, 0), (p, p), (p, p), (0, 0))
    summed = jax.lax.reduce_window(
        x, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), pads
    )
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    counts = jax.lax.reduce_window(
        ones, 0.0, jax.lax.add, (1, k, k, 1), (1, s, s, 1), pads
    )
    return summed / counts


class InceptionA(nn.Module):
    pool_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b5 = BasicConv(48, (1, 1), dtype=self.dtype, name="branch5x5_1")(x)
        b5 = BasicConv(64, (5, 5), padding=2, dtype=self.dtype, name="branch5x5_2")(b5)
        b3 = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(b3)
        b3 = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_3")(b3)
        bp = _avg_pool_no_pad_count(x)
        bp = BasicConv(self.pool_features, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(384, (3, 3), stride=2, dtype=self.dtype, name="branch3x3")(x)
        bd = BasicConv(64, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(96, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bd = BasicConv(96, (3, 3), stride=2, dtype=self.dtype, name="branch3x3dbl_3")(bd)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, bd, bp], axis=-1)


class InceptionC(nn.Module):
    c7: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c7 = self.c7
        b1 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b7 = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7_1")(x)
        b7 = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7_3")(b7)
        bd = BasicConv(c7, (1, 1), dtype=self.dtype, name="branch7x7dbl_1")(x)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_2")(bd)
        bd = BasicConv(c7, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_3")(bd)
        bd = BasicConv(c7, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7dbl_4")(bd)
        bd = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7dbl_5")(bd)
        bp = _avg_pool_no_pad_count(x)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b3 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3 = BasicConv(320, (3, 3), stride=2, dtype=self.dtype, name="branch3x3_2")(b3)
        b7 = BasicConv(192, (1, 1), dtype=self.dtype, name="branch7x7x3_1")(x)
        b7 = BasicConv(192, (1, 7), padding=((0, 0), (3, 3)), dtype=self.dtype,
                       name="branch7x7x3_2")(b7)
        b7 = BasicConv(192, (7, 1), padding=((3, 3), (0, 0)), dtype=self.dtype,
                       name="branch7x7x3_3")(b7)
        b7 = BasicConv(192, (3, 3), stride=2, dtype=self.dtype, name="branch7x7x3_4")(b7)
        bp = _max_pool(x, 3, 2)
        return jnp.concatenate([b3, b7, bp], axis=-1)


class InceptionE(nn.Module):
    pool_kind: str = "avg"  # Mixed_7b: avg (count_include_pad=False); 7c: max
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv(320, (1, 1), dtype=self.dtype, name="branch1x1")(x)
        b3 = BasicConv(384, (1, 1), dtype=self.dtype, name="branch3x3_1")(x)
        b3a = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3_2a")(b3)
        b3b = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3_2b")(b3)
        b3 = jnp.concatenate([b3a, b3b], axis=-1)
        bd = BasicConv(448, (1, 1), dtype=self.dtype, name="branch3x3dbl_1")(x)
        bd = BasicConv(384, (3, 3), padding=1, dtype=self.dtype, name="branch3x3dbl_2")(bd)
        bda = BasicConv(384, (1, 3), padding=((0, 0), (1, 1)), dtype=self.dtype,
                        name="branch3x3dbl_3a")(bd)
        bdb = BasicConv(384, (3, 1), padding=((1, 1), (0, 0)), dtype=self.dtype,
                        name="branch3x3dbl_3b")(bd)
        bd = jnp.concatenate([bda, bdb], axis=-1)
        if self.pool_kind == "avg":
            bp = _avg_pool_no_pad_count(x)
        else:
            bp = _max_pool(x, 3, 1, 1)
        bp = BasicConv(192, (1, 1), dtype=self.dtype, name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class FIDInceptionV3(nn.Module):
    """pool3-feature extractor. Input (N, H, W, 3) in [0, 1].
    ``include_head`` adds the 1008-way fc logits (for Inception Score)."""

    resize_input: bool = True
    normalize_input: bool = True
    include_head: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n = x.shape[0]
        if self.resize_input and (x.shape[1] != 299 or x.shape[2] != 299):
            x = jax.image.resize(x, (n, 299, 299, 3), method="bilinear", antialias=False)
        if self.normalize_input:
            x = 2.0 * x - 1.0
        x = x.astype(self.dtype)

        x = BasicConv(32, (3, 3), stride=2, dtype=self.dtype, name="Conv2d_1a_3x3")(x)
        x = BasicConv(32, (3, 3), dtype=self.dtype, name="Conv2d_2a_3x3")(x)
        x = BasicConv(64, (3, 3), padding=1, dtype=self.dtype, name="Conv2d_2b_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = BasicConv(80, (1, 1), dtype=self.dtype, name="Conv2d_3b_1x1")(x)
        x = BasicConv(192, (3, 3), dtype=self.dtype, name="Conv2d_4a_3x3")(x)
        x = _max_pool(x, 3, 2)
        x = InceptionA(32, dtype=self.dtype, name="Mixed_5b")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5c")(x)
        x = InceptionA(64, dtype=self.dtype, name="Mixed_5d")(x)
        x = InceptionB(dtype=self.dtype, name="Mixed_6a")(x)
        x = InceptionC(128, dtype=self.dtype, name="Mixed_6b")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6c")(x)
        x = InceptionC(160, dtype=self.dtype, name="Mixed_6d")(x)
        x = InceptionC(192, dtype=self.dtype, name="Mixed_6e")(x)
        x = InceptionD(dtype=self.dtype, name="Mixed_7a")(x)
        x = InceptionE("avg", dtype=self.dtype, name="Mixed_7b")(x)
        x = InceptionE("max", dtype=self.dtype, name="Mixed_7c")(x)
        x = jnp.mean(x, axis=(1, 2))  # adaptive avg pool -> (N, 2048)
        if self.include_head:
            x = nn.Dense(1008, dtype=self.dtype, name="fc")(x)
        return x.astype(jnp.float32)


# ---------------------------------------------------------------------------
# Checkpoint conversion (pt_inception-2015-12-05-6726825d.pth)
# ---------------------------------------------------------------------------

def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def convert_inception_state_dict(sd: Mapping) -> Dict:
    """Map pytorch-fid tensor names (``Mixed_5b.branch1x1.conv.weight`` ...)
    onto FIDInceptionV3; ``AuxLogits`` is dropped, the fc head is kept for
    Inception Score (use include_head=True to consume it)."""
    params: Dict = {}

    def set_path(path, value):
        node = params
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = value

    for key, tensor in sd.items():
        if key.startswith("AuxLogits.") or key.endswith("num_batches_tracked"):
            continue
        if key == "fc.weight":
            set_path(("fc", "kernel"), _np(tensor).T)
            continue
        if key == "fc.bias":
            set_path(("fc", "bias"), _np(tensor))
            continue
        parts = key.split(".")
        *module_path, unit, leaf = parts  # ... , conv|bn, weight|bias|running_*
        v = _np(tensor)
        if unit == "conv":
            set_path((*module_path, "conv", "kernel"), v.transpose(2, 3, 1, 0))
        elif unit == "bn":
            name = {
                "weight": "bn_scale", "bias": "bn_offset",
                "running_mean": "bn_mean", "running_var": "bn_var",
            }[leaf]
            set_path((*module_path, name), v)
        else:
            raise ValueError(f"unhandled key {key}")
    return {"params": params}


def load_inception_params(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_inception_state_dict(sd)
