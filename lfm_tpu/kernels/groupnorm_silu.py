"""Pallas fused GroupNorm + SiLU.

The ADM/EDM UNets run GroupNorm -> SiLU before nearly every conv
(SURVEY.md §2.2 lists this fusion as a planned hot kernel). Unfused, the
normalize/affine/silu chain makes multiple HBM round-trips over the feature
map; this kernel computes group statistics, normalization, affine and SiLU
in one VMEM-resident pass per sample.

Measured end-to-end (ADM-256 100-NFE euler sampling, v5e, bs32): the fused
kernel is ~11% SLOWER than plain XLA (32.7 -> 29.2 samples/s) — XLA already
fuses the normalize/silu chain into the surrounding convs, and the
standalone kernel blocks that fusion. It therefore ships OFF by default
(`UNetModel(use_fused_gn=True)` opts in); kept as the measured baseline for
future epilogue-fusion work.

Layout: x (N, H, W, C) NHWC, C divisible by num_groups; statistics in fp32
regardless of input dtype (GroupNorm32 semantics,
reference models/guided_diffusion/nn.py:17-19).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gn_silu_kernel(x_ref, scale_ref, bias_ref, o_ref, *, groups: int, eps: float):
    """Group stats via matmul with a channel->group membership matrix —
    Mosaic cannot lower reshapes that split the 128-lane channel dim."""
    x = x_ref[0].astype(jnp.float32)  # (HW, C)
    hw, c = x.shape
    cg = c // groups

    chan_group = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 0) // cg
    group_ids = jax.lax.broadcasted_iota(jnp.int32, (c, groups), 1)
    gmat = (chan_group == group_ids).astype(jnp.float32)  # (C, G)

    sum_c = jnp.sum(x, axis=0, keepdims=True)          # (1, C)
    sumsq_c = jnp.sum(x * x, axis=0, keepdims=True)    # (1, C)
    n = float(hw * cg)
    # HIGHEST precision: the MXU's default f32 matmul truncates to bf16
    # passes, which is visible in the group statistics
    hp = jax.lax.Precision.HIGHEST

    def gdot(a, b, dims):
        return jax.lax.dot_general(a, b, (dims, ((), ())),
                                   preferred_element_type=jnp.float32,
                                   precision=hp)

    mean_g = gdot(sum_c, gmat, ((1,), (0,))) / n
    ex2_g = gdot(sumsq_c, gmat, ((1,), (0,))) / n
    var_g = ex2_g - mean_g * mean_g

    mean_c = gdot(mean_g, gmat, ((1,), (1,)))  # (1, C)
    var_c = gdot(var_g, gmat, ((1,), (1,)))

    # exact sqrt: Mosaic lowers lax.rsqrt to the fast approximate rsqrt
    y = (x - mean_c) / jnp.sqrt(var_c + eps)
    y = y * scale_ref[0] + bias_ref[0]
    o_ref[0] = (y * jax.nn.sigmoid(y)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("groups", "eps"))
def groupnorm_silu(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                   groups: int = 32, eps: float = 1e-5) -> jnp.ndarray:
    """x: (N, H, W, C); scale/bias: (C,). Returns silu(groupnorm(x))."""
    n, h, w, c = x.shape
    xf = x.reshape(n, h * w, c)
    out = pl.pallas_call(
        functools.partial(_gn_silu_kernel, groups=groups, eps=eps),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        cost_estimate=pl.CostEstimate(
            flops=10 * n * h * w * c,
            bytes_accessed=2 * n * h * w * c * x.dtype.itemsize,
            transcendentals=n * h * w * c,
        ),
    )(xf, scale.reshape(1, c), bias.reshape(1, c))
    return out.reshape(n, h, w, c)


def reference_groupnorm_silu(x, scale, bias, groups: int = 32, eps: float = 1e-5):
    """Plain-XLA reference for parity tests."""
    n, h, w, c = x.shape
    xg = x.astype(jnp.float32).reshape(n, h * w, groups, c // groups)
    mean = jnp.mean(xg, axis=(1, 3), keepdims=True)
    var = jnp.mean(jnp.square(xg - mean), axis=(1, 3), keepdims=True)
    y = ((xg - mean) * jax.lax.rsqrt(var + eps)).reshape(n, h, w, c)
    y = y * scale + bias
    return (y * jax.nn.sigmoid(y)).astype(x.dtype)


class FusedGNSiLU:
    """Helper for modules: apply fused GN+SiLU on TPU, XLA math elsewhere.
    Callers own the scale/bias params (path-compatible with GroupNorm32)."""

    @staticmethod
    def apply(x, scale, bias, groups: int = 32, eps: float = 1e-5,
              use_pallas: bool = True):
        if use_pallas and jax.default_backend() == "tpu":
            return groupnorm_silu(x, scale, bias, groups=groups, eps=eps)
        return reference_groupnorm_silu(x, scale, bias, groups=groups, eps=eps)
