"""Raw-params DiT forward with the fused Pallas block kernel.

A pure function over the exact param pytree produced by ``nn.dit.DiT``
(scan_blocks=True layout), used by the sampling path: embedders and the
final layer are a handful of tiny matmuls evaluated with jnp directly; the
24 transformer blocks run as ``lax.scan`` over the depth-stacked block
params, each iteration one fused Pallas block (kernels/dit_block.py).

Two deliberate differences from the module path, both speedups with no
behavior change:
  * params are cast to bf16 ONCE up front (``cast_params_bf16``) instead of
    on every velocity evaluation inside the ODE loop — the flax Dense path
    re-reads the f32 master weights each eval (~1.8 GB/eval for DiT-L/2);
  * intra-block residuals accumulate in f32 inside the kernel (the module
    path stores bf16 between ops), which only reduces rounding error.

Mirrors DiT.__call__ eval-mode semantics (nn/dit.py:182-242; reference
models/DiT.py:231-272). Parity vs model.apply is tested in
tests/test_dit_fused.py.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from lfm_tpu.kernels.dit_block import fused_dit_block
from lfm_tpu.nn.layers import get_2d_sincos_pos_embed, timestep_embedding


def _dense(x, p, dtype=jnp.bfloat16):
    out = jnp.dot(x.astype(dtype), p["kernel"].astype(dtype))
    if "bias" in p:
        out = out + p["bias"].astype(dtype)
    return out


def cast_params_bf16(params: Dict[str, Any]) -> Dict[str, Any]:
    """One-time bf16 cast of the DiT param tree for repeated evaluation."""
    return jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16)
        if a.dtype == jnp.float32 else a, params)


def _pick_samples_per_cell(n: int) -> int:
    for s in (4, 8, 2, 1):
        if n % s == 0:
            return s
    return 1


def fused_applicable(model, x: jnp.ndarray, *,
                     assume_local: bool = False) -> bool:
    """Static (trace-time) gate for the fused sampling path: a bf16
    scan-blocks DiT on a TPU backend with Mosaic-tileable dims, evaluated
    either on a single device or inside a shard_map shard
    (``assume_local=True`` — the per-shard computation is single-device by
    construction, so the SPMD restriction does not apply). DiT-XL's 72-dim
    heads are fine — Mosaic handles the unaligned head slices (verified on
    v5e: block parity rel-err 0.47%). The whole config matrix S/B/L/XL x
    patch 2/4/8 at 32-64px latents compiles and matches the module path on
    chip."""
    from lfm_tpu.nn.dit import DiT  # local import to avoid cycle

    if not isinstance(model, DiT) or not model.scan_blocks:
        return False
    if model.dtype != jnp.bfloat16:
        # the fused path computes in bf16; an f32 model must keep f32
        # numerics through the module path
        return False
    if jax.default_backend() != "tpu":
        return False
    if not assume_local and jax.device_count() != 1:
        # a bare pallas_call under SPMD would need its own partitioning;
        # multi-device callers go through the shard_map wrapper instead
        # (sample.build_velocity with shard_mesh)
        return False
    d, heads = model.hidden_size, model.num_heads
    t = (model.img_resolution // model.patch_size) ** 2
    n = x.shape[0]
    return (d % 128 == 0 and d % heads == 0 and t % 8 == 0
            and t <= 1024 and n % _pick_samples_per_cell(n) == 0)


def dit_fused_apply(model, variables: Dict[str, Any], t: jnp.ndarray,
                    x: jnp.ndarray, y: Optional[jnp.ndarray] = None,
                    *, samples_per_cell: Optional[int] = None,
                    train_vjp: bool = False,
                    bwd_samples_per_cell: int = 2) -> jnp.ndarray:
    """Forward pass equivalent to ``model.apply(variables, t, x, y)`` in
    eval mode, for a ``DiT`` with scan_blocks=True. Pass ``variables``
    through ``cast_params_bf16`` once outside the sampling loop.

    With ``train_vjp=True`` the blocks run through the differentiable
    fused kernel (kernels/dit_block_train.py: Pallas forward AND backward,
    weight grads accumulated across grid cells) so ``jax.grad`` of a loss
    through this function works end-to-end; pass the f32 master params
    directly (each use casts to bf16, so the cast transpose yields f32
    grads — the module path's dataflow)."""
    p = variables["params"]
    n, hh, ww, cc = x.shape
    ps = model.patch_size
    d = model.hidden_size
    heads = model.num_heads
    s_cell = samples_per_cell or _pick_samples_per_cell(n)

    t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
    if y is None:
        y = jnp.full((n,), model.null_label, jnp.int32)

    # patchify (nn/layers.py:101-121): reshape + matmul, row-major patches
    xt = x.reshape(n, hh // ps, ps, ww // ps, ps, cc)
    xt = xt.transpose(0, 1, 3, 2, 4, 5).reshape(
        n, (hh // ps) * (ww // ps), ps * ps * cc)
    xt = _dense(xt, p["x_embedder"]["proj"])
    pos = get_2d_sincos_pos_embed(d, hh // ps)
    xt = xt + pos[None].astype(xt.dtype)

    # conditioning c = t_emb + y_emb (nn/dit.py:203-206)
    te = timestep_embedding(t, 256).astype(jnp.bfloat16)
    te = _dense(te, p["t_embedder"]["fc1"])
    te = _dense(jax.nn.silu(te), p["t_embedder"]["fc2"])
    ye = p["y_embedder"]["embedding"][y].astype(jnp.bfloat16)
    c = te + ye
    silu_c = jax.nn.silu(c)

    blocks = p["blocks"]["block"]

    if train_vjp:
        from lfm_tpu.kernels.dit_block_train import make_fused_block_train

        block_fn = make_fused_block_train(heads, s_cell, bwd_samples_per_cell)

        def body(carry, bp):
            b = jnp.bfloat16
            mod = _dense(silu_c, bp["adaLN_modulation"])  # (N, 6D) bf16
            out = block_fn(
                carry, mod,
                bp["attn"]["qkv"]["kernel"].astype(b),
                bp["attn"]["qkv"]["bias"].astype(b),
                bp["attn"]["proj"]["kernel"].astype(b),
                bp["attn"]["proj"]["bias"].astype(b),
                bp["mlp"]["fc1"]["kernel"].astype(b),
                bp["mlp"]["fc1"]["bias"].astype(b),
                bp["mlp"]["fc2"]["kernel"].astype(b),
                bp["mlp"]["fc2"]["bias"].astype(b),
            )
            return out, None
    else:
        def body(carry, bp):
            mod = _dense(silu_c, bp["adaLN_modulation"])  # (N, 6D)
            out = fused_dit_block(
                carry, mod,
                bp["attn"]["qkv"]["kernel"], bp["attn"]["qkv"]["bias"],
                bp["attn"]["proj"]["kernel"], bp["attn"]["proj"]["bias"],
                bp["mlp"]["fc1"]["kernel"], bp["mlp"]["fc1"]["bias"],
                bp["mlp"]["fc2"]["kernel"], bp["mlp"]["fc2"]["bias"],
                num_heads=heads, samples_per_cell=s_cell,
            )
            return out, None

    xt = xt.astype(jnp.bfloat16)
    xt, _ = jax.lax.scan(body, xt, blocks)

    # final layer (nn/dit.py:129-151)
    fl = p["final_layer"]
    mod = _dense(silu_c, fl["adaLN_modulation"])
    shift, scale = jnp.split(mod, 2, axis=-1)
    xf = xt.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True) - jnp.square(mu)
    xf = (xf - mu) * jax.lax.rsqrt(var + 1e-6)
    xt = (xf.astype(jnp.bfloat16) * (1.0 + scale[:, None, :])
          + shift[:, None, :])
    xt = _dense(xt, fl["linear"])

    # unpatchify (nn/dit.py:234-242)
    g = hh // ps
    co = model.out_channels
    xt = xt.reshape(n, g, g, ps, ps, co).transpose(0, 1, 3, 2, 4, 5)
    return xt.reshape(n, g * ps, g * ps, co).astype(jnp.float32)
