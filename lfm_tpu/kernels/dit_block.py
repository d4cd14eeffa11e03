"""Fused DiT block: one Pallas kernel per transformer block.

The reference evaluates a DiT block (models/DiT.py:107-131) as ~10 separate
CUDA ops (LayerNorm, modulate, qkv matmul, attention, proj, residual,
LayerNorm, modulate, MLP, residual), each round-tripping the (N*T, C)
activations through device memory. On TPU the matmuls alone bound the block
at ~2.1 ms (DiT-L/2, bs64); XLA's unfused elementwise passes add ~40% on
top (measured 73.2 ms vs a 52.6 ms matmul roofline per velocity eval).

This kernel evaluates the WHOLE block — adaLN modulate, fused-qkv
attention, gated residual, second modulate, GELU MLP, second residual — in
one ``pallas_call``:

  * the six weight matrices (~24 MB bf16 for DiT-L/2) stay resident in
    VMEM across grid cells (constant index maps), streamed from HBM once
    per block per evaluation;
  * activations are tiled over the batch: each grid cell processes S full
    samples (attention never crosses samples), so qkv, attention probs and
    the 4x-wide MLP hidden activations live and die in VMEM — per block,
    HBM sees one x read and one x write (64 MB round trip instead of
    ~790 MB for the op-by-op schedule);
  * LayerNorm statistics, softmax, and matmul accumulation run in f32
    (flax computes LN stats in f32 and the model keeps f32-softmax islands;
    intra-block residuals are kept in f32 here, which only tightens bf16
    error).

Used by the sampling path (`sample/fused.py`); training keeps the autodiff
module path. Measured on v5e: see kernels/__init__ and bench.py.
"""

from __future__ import annotations

import functools
import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LN_EPS = 1e-6


def _layernorm_f32(x: jnp.ndarray) -> jnp.ndarray:
    """No-affine LayerNorm over the last axis, f32 in/out.

    Matches flax.linen.LayerNorm(use_bias=False, use_scale=False,
    epsilon=1e-6) with use_fast_variance: var = E[x^2] - E[x]^2.
    """
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    return (x - mu) * jax.lax.rsqrt(var + _LN_EPS)


def _dit_block_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wproj_ref,
                      bproj_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                      samples: int, tokens: int, heads: int, head_dim: int):
    """One grid cell: S samples' full DiT block.

    x_ref/o_ref: (S, T, C) bf16 slabs; mod_ref: (S, 6C); weights full-size.
    """
    s_cnt, t, c = samples, tokens, x_ref.shape[2]
    rows = s_cnt * t
    scale = 1.0 / math.sqrt(head_dim)

    x = x_ref[...].reshape(rows, c).astype(jnp.float32)
    mod = mod_ref[...].astype(jnp.float32)  # (S, 6, C)

    def rows_mod(i):
        # (S, C) -> (S, 1, C) broadcast over tokens
        return mod[:, i, :].reshape(s_cnt, 1, c)

    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (rows_mod(i) for i in range(6))

    # ---- attention branch -------------------------------------------------
    h = _layernorm_f32(x).reshape(s_cnt, t, c)
    h = (h * (1.0 + sc_msa) + sh_msa).reshape(rows, c).astype(jnp.bfloat16)
    qkv = jax.lax.dot_general(
        h, wqkv_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bqkv_ref[...].astype(jnp.float32)  # (rows, 3C)
    qkv = qkv.astype(jnp.bfloat16)

    # loop over heads only; each iteration is a sample-batched dot_general
    # ((S, T, hd) x (S, T, hd) -> (S, T, T)), keeping instruction count and
    # Mosaic compile time linear in H rather than S*H
    head_outs = []
    for hh in range(heads):
        qs = slice(hh * head_dim, (hh + 1) * head_dim)
        ks = slice(c + hh * head_dim, c + (hh + 1) * head_dim)
        vs = slice(2 * c + hh * head_dim, 2 * c + (hh + 1) * head_dim)
        q = qkv[:, qs].reshape(s_cnt, t, head_dim)
        k = qkv[:, ks].reshape(s_cnt, t, head_dim)
        v = qkv[:, vs].reshape(s_cnt, t, head_dim)
        # bf16 operands hit the MXU at full rate; f32 accumulate keeps the
        # softmax logits exact enough (upcasting first halves throughput)
        logits = scale * jax.lax.dot_general(
            q, k, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # (S, T, T) f32
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(jnp.bfloat16), v,
            (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.float32,
        )  # (S, T, hd)
        head_outs.append(o.astype(jnp.bfloat16).reshape(rows, head_dim))
    attn_out = jnp.concatenate(head_outs, axis=1)  # (rows, C)

    proj = jax.lax.dot_general(
        attn_out, wproj_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + bproj_ref[...].astype(jnp.float32)
    x = x + (g_msa * proj.reshape(s_cnt, t, c)).reshape(rows, c)

    # ---- MLP branch -------------------------------------------------------
    h = _layernorm_f32(x).reshape(s_cnt, t, c)
    h = (h * (1.0 + sc_mlp) + sh_mlp).reshape(rows, c).astype(jnp.bfloat16)
    h1 = jax.lax.dot_general(
        h, w1_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1_ref[...].astype(jnp.float32)
    h1 = jax.nn.gelu(h1, approximate=True).astype(jnp.bfloat16)
    h2 = jax.lax.dot_general(
        h1, w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2_ref[...].astype(jnp.float32)
    x = x + (g_mlp * h2.reshape(s_cnt, t, c)).reshape(rows, c)

    o_ref[...] = x.reshape(s_cnt, t, c).astype(o_ref.dtype)


def fused_dit_block(x: jnp.ndarray, mod: jnp.ndarray, wqkv, bqkv, wproj,
                    bproj, w1, b1, w2, b2, *, num_heads: int,
                    samples_per_cell: int = 4) -> jnp.ndarray:
    """Apply one DiT block with the fused Pallas kernel.

    x: (N, T, C); mod: (N, 6C) adaLN modulation (already includes the
    Dense+SiLU of the conditioning vector). Weights in flax Dense layout
    (in_features, out_features). N must be divisible by samples_per_cell.
    """
    n, t, c = x.shape
    s = samples_per_cell
    assert n % s == 0, (n, s)
    hd = c // num_heads
    hidden = w1.shape[1]
    mod = mod.reshape(n, 6, c)

    const = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                       memory_space=pltpu.VMEM)
    grid = (n // s,)
    kernel = functools.partial(
        _dit_block_kernel, samples=s, tokens=t, heads=num_heads, head_dim=hd)
    flops_mm = 2 * n * t * c * (3 * c + c + 2 * hidden) + 4 * n * t * t * c
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((s, t, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((s, 6, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            const((c, 3 * c)), const((3 * c,)),
            const((c, c)), const((c,)),
            const((c, hidden)), const((hidden,)),
            const((hidden, c)), const((c,)),
        ],
        out_specs=pl.BlockSpec((s, t, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, t, c), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=flops_mm,
            bytes_accessed=2 * n * t * c * 2 + (4 * c * c + 2 * c * hidden) * 2,
            transcendentals=n * num_heads * t * t + n * t * hidden,
        ),
    )(x, mod, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2)
