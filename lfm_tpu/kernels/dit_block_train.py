"""Differentiable fused DiT block: Pallas forward AND backward.

Training counterpart of kernels/dit_block.py (reference models/DiT.py:107-131
evaluated op-by-op by torch autograd). Three kernels:

  * forward — the inference kernel plus three saved residual streams:
    x1 (post-attention residual), h2 (MLP output before gating) and pr
    (attention projection before gating). Saving h2/pr costs two bf16
    (N,T,C) writes but removes two full matmul recomputes from backward
    (the gate cotangents need them elementwise).
  * mlp backward — recomputes LN2/modulate/fc1/GELU in VMEM from x1 and
    produces dx1, the three MLP modulation cotangents, and dW1/db1/dW2/db2.
  * attention backward — recomputes LN1/modulate/qkv/softmax in VMEM from
    the block input and produces dx, the three MSA modulation cotangents,
    and dWqkv/dbqkv/dWproj/dbproj.

Weight/bias gradients accumulate ACROSS grid cells into constant-index
output blocks (f32 accumulators resident in VMEM, initialised at cell 0,
written back once) — the canonical Pallas reduction pattern. Activation
cotangents stay bf16 (matching what XLA autodiff produces when flax Dense
casts f32 master params to bf16 compute: the weight-grad matmul itself
rounds through bf16); the f32 accumulation here is strictly tighter.

Exposed as a jax.custom_vjp (``make_fused_block_train``), used by
``nn.dit_fused.dit_fused_train_apply``. All-bf16 boundary: the caller casts
f32 master params to bf16 outside, and the cast transpose turns our bf16
weight grads into the f32 grads the optimizer consumes — exactly the module
path's dataflow.
"""

from __future__ import annotations

import functools
import math
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfm_tpu.kernels.dit_block import _layernorm_f32

_LN_EPS = 1e-6
_GELU_A = math.sqrt(2.0 / math.pi)
_GELU_K = 0.044715


def _ln_fwd_parts(x):
    """Return (normalized, rsqrt) for the no-affine LN over the last axis."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(x), axis=-1, keepdims=True) - jnp.square(mu)
    r = jax.lax.rsqrt(var + _LN_EPS)
    return (x - mu) * r, r


def _ln_bwd(dn, n, r):
    """Cotangent of x for y = LN(x) given dy=dn, y=n, rsqrt=r."""
    return r * (dn - jnp.mean(dn, axis=-1, keepdims=True)
                - n * jnp.mean(dn * n, axis=-1, keepdims=True))


def _gelu_tanh(u):
    t = jnp.tanh(_GELU_A * (u + _GELU_K * u * u * u))
    return 0.5 * u * (1.0 + t), t


def _gelu_tanh_grad(u, t):
    """d gelu(u)/du given t = tanh(a(u + k u^3))."""
    inner = _GELU_A * (1.0 + 3.0 * _GELU_K * u * u)
    return 0.5 * (1.0 + t) + 0.5 * u * (1.0 - t * t) * inner


# --------------------------------------------------------------------------
# forward (inference math + residual outputs)
# --------------------------------------------------------------------------

def _fwd_kernel(x_ref, mod_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
                w1_ref, b1_ref, w2_ref, b2_ref, *out_refs,
                samples: int, tokens: int, heads: int, head_dim: int,
                save_streams: str = "full"):
    """Forward + residual streams.

    save_streams="full": out, x1, h2, pr, qkv, ao, u — backward re-does NO
    forward matmul (the set XLA's `dots` remat policy saves) but the seven
    output streams cost VMEM double-buffering that erases the fused
    forward's speed advantage (measured 44.1 vs 36 ms equivalent).
    save_streams="slim": out, h2, pr, qkv only — backward recomputes x1
    elementwise, u with one matmul, ao with the Pallas attention forward.
    """
    if save_streams == "slim":
        o_ref, h2_ref, pr_ref, qkv_ref = out_refs
        x1_ref = ao_ref = u_ref = None
    else:
        o_ref, x1_ref, h2_ref, pr_ref, qkv_ref, ao_ref, u_ref = out_refs
    s_cnt, t, c = samples, tokens, x_ref.shape[2]
    rows = s_cnt * t
    scale = 1.0 / math.sqrt(head_dim)

    x = x_ref[...].reshape(rows, c).astype(jnp.float32)
    mod = mod_ref[...].astype(jnp.float32)
    mvec = lambda i: mod[:, i, :].reshape(s_cnt, 1, c)
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (mvec(i) for i in range(6))

    h = _layernorm_f32(x).reshape(s_cnt, t, c)
    h = (h * (1.0 + sc_msa) + sh_msa).reshape(rows, c).astype(jnp.bfloat16)
    qkv = (jax.lax.dot_general(h, wqkv_ref[...], (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
           + bqkv_ref[...].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv_ref[...] = qkv.reshape(s_cnt, t, 3 * c)

    head_outs = []
    for hh in range(heads):
        q = qkv[:, hh * head_dim:(hh + 1) * head_dim].reshape(s_cnt, t, head_dim)
        k = qkv[:, c + hh * head_dim:c + (hh + 1) * head_dim].reshape(s_cnt, t, head_dim)
        v = qkv[:, 2 * c + hh * head_dim:2 * c + (hh + 1) * head_dim].reshape(s_cnt, t, head_dim)
        logits = scale * jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        o = jax.lax.dot_general(p.astype(jnp.bfloat16), v,
                                (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        head_outs.append(o.astype(jnp.bfloat16).reshape(rows, head_dim))
    attn_out = jnp.concatenate(head_outs, axis=1)
    if ao_ref is not None:
        ao_ref[...] = attn_out.reshape(s_cnt, t, c)

    pr = (jax.lax.dot_general(attn_out, wproj_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + bproj_ref[...].astype(jnp.float32))
    pr_ref[...] = pr.reshape(s_cnt, t, c).astype(pr_ref.dtype)
    x1 = x + (g_msa * pr.reshape(s_cnt, t, c)).reshape(rows, c)
    if x1_ref is not None:
        x1_ref[...] = x1.reshape(s_cnt, t, c).astype(x1_ref.dtype)

    h = _layernorm_f32(x1).reshape(s_cnt, t, c)
    h = (h * (1.0 + sc_mlp) + sh_mlp).reshape(rows, c).astype(jnp.bfloat16)
    u = (jax.lax.dot_general(h, w1_ref[...], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
         + b1_ref[...].astype(jnp.float32))
    if u_ref is not None:
        u_ref[...] = u.reshape(s_cnt, t, -1).astype(u_ref.dtype)
    g, _ = _gelu_tanh(u)
    gb = g.astype(jnp.bfloat16)
    h2 = (jax.lax.dot_general(gb, w2_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
          + b2_ref[...].astype(jnp.float32))
    h2_ref[...] = h2.reshape(s_cnt, t, c).astype(h2_ref.dtype)
    x2 = x1 + (g_mlp * h2.reshape(s_cnt, t, c)).reshape(rows, c)
    o_ref[...] = x2.reshape(s_cnt, t, c).astype(o_ref.dtype)


# --------------------------------------------------------------------------
# backward, MLP half: (x1, mod, w1, b1, w2, dy) -> dx1, dmod_mlp, dW1.. db2
# --------------------------------------------------------------------------

def _mlp_bwd_kernel(x1_ref, mod_ref, h2_ref, u_ref, w1_ref, w2_ref, dy_ref,
                    dx1_ref, dmod_ref, dw1_ref, db1_ref, dw2_ref, db2_ref, *,
                    samples: int, tokens: int):
    s_cnt, t, c = samples, tokens, x1_ref.shape[2]
    rows = s_cnt * t
    first = pl.program_id(0) == 0

    x1 = x1_ref[...].reshape(rows, c).astype(jnp.float32)
    dy = dy_ref[...].reshape(rows, c).astype(jnp.float32)
    h2 = h2_ref[...].reshape(rows, c).astype(jnp.float32)
    u = u_ref[...].reshape(rows, -1).astype(jnp.float32)  # saved fc1 preact
    mod = mod_ref[...].astype(jnp.float32)
    sh_mlp = mod[:, 3, :].reshape(s_cnt, 1, c)
    sc_mlp = mod[:, 4, :].reshape(s_cnt, 1, c)
    g_mlp = mod[:, 5, :].reshape(s_cnt, 1, c)

    # recompute LN2 -> modulate (elementwise only; fc1 output was saved)
    n2, r2 = _ln_fwd_parts(x1)
    h2m = (n2.reshape(s_cnt, t, c) * (1.0 + sc_mlp) + sh_mlp)
    h2b = h2m.reshape(rows, c).astype(jnp.bfloat16)
    _, tanh_u = _gelu_tanh(u)
    g = 0.5 * u * (1.0 + tanh_u)
    gb = g.astype(jnp.bfloat16)

    # gate cotangents
    dy3 = dy.reshape(s_cnt, t, c)
    dg_mlp = jnp.sum(dy3 * h2.reshape(s_cnt, t, c), axis=1)  # (S, C)
    dh2 = (dy3 * g_mlp).reshape(rows, c)  # cotangent of fc2 output

    # fc2
    dgb = jax.lax.dot_general(
        dh2.astype(jnp.bfloat16), w2_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (rows, H)
    dw2_c = jax.lax.dot_general(
        gb, dh2.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)  # (H, C)
    db2_c = jnp.sum(dh2, axis=0)

    # gelu
    du = dgb * _gelu_tanh_grad(u, tanh_u)

    # fc1
    dh2b = jax.lax.dot_general(
        du.astype(jnp.bfloat16), w1_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (rows, C)
    dw1_c = jax.lax.dot_general(
        h2b, du.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    db1_c = jnp.sum(du, axis=0)

    # modulate + LN2 backward
    dh3 = dh2b.reshape(s_cnt, t, c)
    dsc_mlp = jnp.sum(dh3 * n2.reshape(s_cnt, t, c), axis=1)
    dsh_mlp = jnp.sum(dh3, axis=1)
    dn2 = (dh3 * (1.0 + sc_mlp)).reshape(rows, c)
    dx1 = dy + _ln_bwd(dn2, n2, r2)

    dx1_ref[...] = dx1.reshape(s_cnt, t, c).astype(dx1_ref.dtype)
    dmod_ref[...] = jnp.stack([dsh_mlp, dsc_mlp, dg_mlp], axis=1).astype(
        dmod_ref.dtype)

    @pl.when(first)
    def _():
        dw1_ref[...] = dw1_c
        db1_ref[...] = db1_c
        dw2_ref[...] = dw2_c
        db2_ref[...] = db2_c

    @pl.when(jnp.logical_not(first))
    def _():
        dw1_ref[...] += dw1_c
        db1_ref[...] += db1_c
        dw2_ref[...] += dw2_c
        db2_ref[...] += db2_c


# --------------------------------------------------------------------------
# backward, attention half: (x, mod, wqkv, wproj, pr, dx1) -> dx, dmod_msa,
# dWqkv.. dbproj
# --------------------------------------------------------------------------

def _attn_bwd_kernel(x_ref, mod_ref, pr_ref, qkv_ref, ao_ref, wqkv_ref,
                     wproj_ref, dx1_ref, dx_ref, dmod_ref, dwqkv_ref,
                     dbqkv_ref, dwproj_ref, dbproj_ref, *,
                     samples: int, tokens: int, heads: int, head_dim: int):
    s_cnt, t, c = samples, tokens, x_ref.shape[2]
    rows = s_cnt * t
    scale = 1.0 / math.sqrt(head_dim)
    first = pl.program_id(0) == 0

    x = x_ref[...].reshape(rows, c).astype(jnp.float32)
    dx1 = dx1_ref[...].reshape(rows, c).astype(jnp.float32)
    pr = pr_ref[...].reshape(rows, c).astype(jnp.float32)
    qkv = qkv_ref[...].reshape(rows, 3 * c)  # saved bf16 fwd activations
    ao = ao_ref[...].reshape(rows, c)
    mod = mod_ref[...].astype(jnp.float32)
    sh_msa = mod[:, 0, :].reshape(s_cnt, 1, c)
    sc_msa = mod[:, 1, :].reshape(s_cnt, 1, c)
    g_msa = mod[:, 2, :].reshape(s_cnt, 1, c)

    # recompute LN1 -> modulate (elementwise; the qkv matmul output was saved)
    n1, r1 = _ln_fwd_parts(x)
    h1m = (n1.reshape(s_cnt, t, c) * (1.0 + sc_msa) + sh_msa)
    hb = h1m.reshape(rows, c).astype(jnp.bfloat16)

    # gate cotangents
    dx13 = dx1.reshape(s_cnt, t, c)
    dg_msa = jnp.sum(dx13 * pr.reshape(s_cnt, t, c), axis=1)
    dpr = (dx13 * g_msa).reshape(rows, c)

    dao = jax.lax.dot_general(
        dpr.astype(jnp.bfloat16), wproj_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)  # (rows, C)
    dwproj_c = jax.lax.dot_general(
        ao, dpr.astype(jnp.bfloat16), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbproj_c = jnp.sum(dpr, axis=0)

    dqkv_parts_q, dqkv_parts_k, dqkv_parts_v = [], [], []
    for hh in range(heads):
        q = qkv[:, hh * head_dim:(hh + 1) * head_dim].reshape(s_cnt, t, head_dim)
        k = qkv[:, c + hh * head_dim:c + (hh + 1) * head_dim].reshape(s_cnt, t, head_dim)
        v = qkv[:, 2 * c + hh * head_dim:2 * c + (hh + 1) * head_dim].reshape(s_cnt, t, head_dim)
        logits = scale * jax.lax.dot_general(
            q.astype(jnp.float32), k.astype(jnp.float32),
            (((2,), (2,)), ((0,), (0,))), preferred_element_type=jnp.float32)
        m = jnp.max(logits, axis=-1, keepdims=True)
        e = jnp.exp(logits - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)  # (S, T, T) f32
        pb = p.astype(jnp.bfloat16)

        do = dao[:, hh * head_dim:(hh + 1) * head_dim].reshape(
            s_cnt, t, head_dim).astype(jnp.bfloat16)
        dv = jax.lax.dot_general(pb, do, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)  # (S,T,T)
        ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
        dsb = ds.astype(jnp.bfloat16)
        dq = scale * jax.lax.dot_general(
            dsb, k, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        dk = scale * jax.lax.dot_general(
            dsb, q, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)  # ds^T q
        dqkv_parts_q.append(dq.astype(jnp.bfloat16).reshape(rows, head_dim))
        dqkv_parts_k.append(dk.astype(jnp.bfloat16).reshape(rows, head_dim))
        dqkv_parts_v.append(dv.astype(jnp.bfloat16).reshape(rows, head_dim))

    dqkv = jnp.concatenate(
        dqkv_parts_q + dqkv_parts_k + dqkv_parts_v, axis=1)  # (rows, 3C)

    dhb = jax.lax.dot_general(
        dqkv, wqkv_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    dwqkv_c = jax.lax.dot_general(
        hb, dqkv, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dbqkv_c = jnp.sum(dqkv.astype(jnp.float32), axis=0)

    dh3 = dhb.reshape(s_cnt, t, c)
    dsc_msa = jnp.sum(dh3 * n1.reshape(s_cnt, t, c), axis=1)
    dsh_msa = jnp.sum(dh3, axis=1)
    dn1 = (dh3 * (1.0 + sc_msa)).reshape(rows, c)
    dx = dx1 + _ln_bwd(dn1, n1, r1)

    dx_ref[...] = dx.reshape(s_cnt, t, c).astype(dx_ref.dtype)
    dmod_ref[...] = jnp.stack([dsh_msa, dsc_msa, dg_msa], axis=1).astype(
        dmod_ref.dtype)

    @pl.when(first)
    def _():
        dwqkv_ref[...] = dwqkv_c
        dbqkv_ref[...] = dbqkv_c
        dwproj_ref[...] = dwproj_c
        dbproj_ref[...] = dbproj_c

    @pl.when(jnp.logical_not(first))
    def _():
        dwqkv_ref[...] += dwqkv_c
        dbqkv_ref[...] += dbqkv_c
        dwproj_ref[...] += dwproj_c
        dbproj_ref[...] += dbproj_c


# --------------------------------------------------------------------------
# pallas_call wrappers
# --------------------------------------------------------------------------

def _const(shape):
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _cell(shape3):
    return pl.BlockSpec(shape3, lambda i: (i,) + (0,) * (len(shape3) - 1),
                        memory_space=pltpu.VMEM)


def _block_fwd_call(x, mod3, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2, *,
                    num_heads: int, s_cell: int, save_streams: str = "full"):
    n, t, c = x.shape
    hidden = w1.shape[1]
    hd = c // num_heads
    kern = functools.partial(_fwd_kernel, samples=s_cell, tokens=t,
                             heads=num_heads, head_dim=hd,
                             save_streams=save_streams)
    sds = jax.ShapeDtypeStruct((n, t, c), jnp.bfloat16)
    if save_streams == "slim":
        out_specs = [_cell((s_cell, t, c))] * 3 + [_cell((s_cell, t, 3 * c))]
        out_shape = [sds, sds, sds,
                     jax.ShapeDtypeStruct((n, t, 3 * c), jnp.bfloat16)]
    else:
        out_specs = [_cell((s_cell, t, c))] * 4 + [
            _cell((s_cell, t, 3 * c)), _cell((s_cell, t, c)),
            _cell((s_cell, t, hidden))]
        out_shape = [sds, sds, sds, sds,
                     jax.ShapeDtypeStruct((n, t, 3 * c), jnp.bfloat16),
                     jax.ShapeDtypeStruct((n, t, c), jnp.bfloat16),
                     jax.ShapeDtypeStruct((n, t, hidden), jnp.bfloat16)]
    return pl.pallas_call(
        kern,
        grid=(n // s_cell,),
        in_specs=[_cell((s_cell, t, c)), _cell((s_cell, 6, c)),
                  _const((c, 3 * c)), _const((3 * c,)),
                  _const((c, c)), _const((c,)),
                  _const((c, hidden)), _const((hidden,)),
                  _const((hidden, c)), _const((c,))],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * (4 * c + 2 * hidden) + 4 * n * t * t * c,
            bytes_accessed=8 * n * t * c + (4 * c * c + 2 * c * hidden) * 2,
            transcendentals=n * num_heads * t * t + n * t * hidden,
        ),
    )(x, mod3, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2)


def _mlp_bwd_call(x1, mod3, h2, u, w1, w2, dy, *, s_cell: int):
    n, t, c = x1.shape
    hidden = w1.shape[1]
    kern = functools.partial(_mlp_bwd_kernel, samples=s_cell, tokens=t)
    return pl.pallas_call(
        kern,
        grid=(n // s_cell,),
        in_specs=[_cell((s_cell, t, c)), _cell((s_cell, 6, c)),
                  _cell((s_cell, t, c)), _cell((s_cell, t, hidden)),
                  _const((c, hidden)),
                  _const((hidden, c)), _cell((s_cell, t, c))],
        out_specs=[_cell((s_cell, t, c)), _cell((s_cell, 3, c)),
                   _const((c, hidden)), _const((hidden,)),
                   _const((hidden, c)), _const((c,))],
        out_shape=[jax.ShapeDtypeStruct((n, t, c), jnp.bfloat16),
                   jax.ShapeDtypeStruct((n, 3, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, hidden), jnp.float32),
                   jax.ShapeDtypeStruct((hidden,), jnp.float32),
                   jax.ShapeDtypeStruct((hidden, c), jnp.float32),
                   jax.ShapeDtypeStruct((c,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=8 * n * t * c * hidden,
            bytes_accessed=10 * n * t * c + 2 * n * t * hidden
            + 4 * c * hidden * 6,
            transcendentals=n * t * hidden,
        ),
    )(x1, mod3, h2, u, w1, w2, dy)


def _attn_bwd_call(x, mod3, pr, qkv, ao, wqkv, wproj, dx1, *, num_heads: int,
                   s_cell: int):
    n, t, c = x.shape
    hd = c // num_heads
    kern = functools.partial(_attn_bwd_kernel, samples=s_cell, tokens=t,
                             heads=num_heads, head_dim=hd)
    return pl.pallas_call(
        kern,
        grid=(n // s_cell,),
        in_specs=[_cell((s_cell, t, c)), _cell((s_cell, 6, c)),
                  _cell((s_cell, t, c)), _cell((s_cell, t, 3 * c)),
                  _cell((s_cell, t, c)),
                  _const((c, 3 * c)), _const((c, c)),
                  _cell((s_cell, t, c))],
        out_specs=[_cell((s_cell, t, c)), _cell((s_cell, 3, c)),
                   _const((c, 3 * c)), _const((3 * c,)),
                   _const((c, c)), _const((c,))],
        out_shape=[jax.ShapeDtypeStruct((n, t, c), jnp.bfloat16),
                   jax.ShapeDtypeStruct((n, 3, c), jnp.float32),
                   jax.ShapeDtypeStruct((c, 3 * c), jnp.float32),
                   jax.ShapeDtypeStruct((3 * c,), jnp.float32),
                   jax.ShapeDtypeStruct((c, c), jnp.float32),
                   jax.ShapeDtypeStruct((c,), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024),
        cost_estimate=pl.CostEstimate(
            flops=2 * n * t * c * 8 * c + 12 * n * t * t * c,
            bytes_accessed=20 * n * t * c + 4 * c * c * 8,
            transcendentals=n * num_heads * t * t,
        ),
    )(x, mod3, pr, qkv, ao, wqkv, wproj, dx1)


# --------------------------------------------------------------------------
# custom_vjp
# --------------------------------------------------------------------------

def _jnp_bwd(num_heads, res, dy):
    """Hand-written backward in plain jnp over the Pallas-saved residuals.

    Measured on v5e this BEATS the all-Pallas backward kernels (train step
    ~173 vs 180 ms at bs32): XLA's K-tiled weight-grad matmuls contract over
    the full batch, while a Pallas grid must fragment the reduction across
    cells and accumulate — the elementwise fusion a kernel buys back does
    not cover that loss. The attention core still goes through the Pallas
    ``attention_small_bwd`` (an einsum formulation would materialize N*H*T*T
    probability tensors in HBM). Only h2/pr/qkv are saved by the forward;
    x1 is recomputed elementwise, u with one matmul, ao with the Pallas
    attention forward — saving streams any wider erases the fused forward's
    advantage through VMEM double-buffer pressure (44.1 vs ~37 ms).
    """
    if len(res) == 10:  # slim streams: recompute x1/u/ao in backward
        x, mod3, h2, pr, qkv, wqkv, wproj, w1, b1, w2 = res
        x1 = ao = u = None
    else:
        x, mod3, x1, h2, pr, qkv, ao, u, wqkv, wproj, w1, w2 = res
        b1 = None
    n, t, c = x.shape
    hd = c // num_heads
    f32 = jnp.float32
    bf = jnp.bfloat16

    mod = mod3.astype(f32)
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
        mod[:, i, :][:, None, :] for i in range(6))
    dy = dy.astype(f32)

    x1f = (x.astype(f32) + g_msa * pr.astype(f32)) if x1 is None \
        else x1.astype(f32)

    # ---- MLP half ----
    n2, r2 = _ln_fwd_parts(x1f)
    h2b = (n2 * (1.0 + sc_mlp) + sh_mlp).astype(bf)
    uf = (jnp.einsum("ntc,ch->nth", h2b, w1, preferred_element_type=f32)
          + b1.astype(f32)) if u is None else u.astype(f32)
    _, tanh_u = _gelu_tanh(uf)
    g = 0.5 * uf * (1.0 + tanh_u)
    gb = g.astype(bf)

    dg_mlp = jnp.sum(dy * h2.astype(f32), axis=1)  # (N, C)
    dh2 = (dy * g_mlp).astype(bf)  # (N, T, C)
    dgb = jnp.einsum("ntc,hc->nth", dh2, w2, preferred_element_type=f32)
    dw2 = jnp.einsum("nth,ntc->hc", gb, dh2, preferred_element_type=f32)
    db2 = jnp.sum(dh2.astype(f32), axis=(0, 1))
    du = (dgb * _gelu_tanh_grad(uf, tanh_u)).astype(bf)
    dh2b = jnp.einsum("nth,ch->ntc", du, w1, preferred_element_type=f32)
    dw1 = jnp.einsum("ntc,nth->ch", h2b, du, preferred_element_type=f32)
    db1 = jnp.sum(du.astype(f32), axis=(0, 1))
    dsc_mlp = jnp.sum(dh2b * n2, axis=1)
    dsh_mlp = jnp.sum(dh2b, axis=1)
    dx1 = dy + _ln_bwd(dh2b * (1.0 + sc_mlp), n2, r2)

    # ---- attention half ----
    xf = x.astype(f32)
    n1, r1 = _ln_fwd_parts(xf)
    hb = (n1 * (1.0 + sc_msa) + sh_msa).astype(bf)

    dg_msa = jnp.sum(dx1 * pr.astype(f32), axis=1)
    dpr = (dx1 * g_msa).astype(bf)
    dao = jnp.einsum("ntc,dc->ntd", dpr, wproj, preferred_element_type=f32)
    dbproj = jnp.sum(dpr.astype(f32), axis=(0, 1))

    # attention core through the Pallas whole-sequence kernels: the (T,T)
    # probs are recomputed in VMEM, never materialized in HBM (an einsum
    # formulation here would write N*H*T*T f32 tensors — gigabytes)
    from lfm_tpu.kernels.flash_attention import (attention_small,
                                                 attention_small_bwd,
                                                 reference_attention)

    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, num_heads, hd)
    k = k.reshape(n, t, num_heads, hd)
    v = v.reshape(n, t, num_heads, hd)
    do = dao.reshape(n, t, num_heads, hd).astype(bf)
    if jax.default_backend() == "tpu":
        if ao is None:
            ao = attention_small(q, k, v).reshape(n, t, c)
        dq, dk, dv = attention_small_bwd(q, k, v, do)
    else:  # CPU tests / interpret parity
        if ao is None:
            ao = reference_attention(q, k, v).reshape(n, t, c)
        _, attn_vjp = jax.vjp(reference_attention, q, k, v)
        dq, dk, dv = attn_vjp(do.astype(q.dtype))
    dwproj = jnp.einsum("ntc,ntd->cd", ao.astype(bf), dpr,
                        preferred_element_type=f32)
    dqkv = jnp.concatenate([
        dq.reshape(n, t, c), dk.reshape(n, t, c), dv.reshape(n, t, c)
    ], axis=-1).astype(bf)

    dhb = jnp.einsum("ntd,cd->ntc", dqkv, wqkv, preferred_element_type=f32)
    dwqkv = jnp.einsum("ntc,ntd->cd", hb, dqkv, preferred_element_type=f32)
    dbqkv = jnp.sum(dqkv.astype(f32), axis=(0, 1))
    dsc_msa = jnp.sum(dhb * n1, axis=1)
    dsh_msa = jnp.sum(dhb, axis=1)
    dx = dx1 + _ln_bwd(dhb * (1.0 + sc_msa), n1, r1)

    dmod = jnp.stack([dsh_msa, dsc_msa, dg_msa, dsh_mlp, dsc_mlp, dg_mlp],
                     axis=1)  # (N, 6, C)
    return (dx.astype(bf), dmod.reshape(n, 6 * c).astype(bf),
            dwqkv.astype(bf), dbqkv.astype(bf), dwproj.astype(bf),
            dbproj.astype(bf), dw1.astype(bf), db1.astype(bf),
            dw2.astype(bf), db2.astype(bf))


@functools.lru_cache(maxsize=None)
def make_fused_block_train(num_heads: int, fwd_cell: int, bwd_cell: int = 0,
                           pallas_bwd: bool = False,
                           save_streams: str = "full"):
    """Build the differentiable fused block for a given head count and grid
    granularity. All tensor args bf16; mod is (N, 6C); weight grads come
    back bf16 (the caller's f32->bf16 cast transpose makes them f32).

    Measured DiT-L/2 bs32 train-step times on v5e for the configurations
    (module path with dots-remat: 164.5 ms — the default for training):
      full streams + jnp/Pallas-attention hybrid backward   172.7 ms
      full streams + all-Pallas backward kernels            179.9 ms
      slim streams + hybrid backward                        183.1 ms
      all-jnp backward (probs materialized in HBM)          192.0 ms
    The fused forward wins standalone, but once it must emit residual
    streams for backward, VMEM double-buffering erases the gain; and a
    Pallas grid fragments weight-grad reductions XLA contracts over the
    full batch. Kept as a tested option for other shapes/batches."""

    mode = "slim" if save_streams == "slim" and not pallas_bwd else "full"

    @jax.custom_vjp
    def block(x, mod, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
        out = _block_fwd_call(
            x, mod.reshape(x.shape[0], 6, x.shape[2]), wqkv, bqkv, wproj,
            bproj, w1, b1, w2, b2, num_heads=num_heads, s_cell=fwd_cell,
            save_streams=mode)[0]
        return out

    def fwd(x, mod, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2):
        n, t, c = x.shape
        mod3 = mod.reshape(n, 6, c)
        if mode == "slim":
            out, h2, pr, qkv = _block_fwd_call(
                x, mod3, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2,
                num_heads=num_heads, s_cell=fwd_cell, save_streams=mode)
            return out, (x, mod3, h2, pr, qkv, wqkv, wproj, w1, b1, w2)
        out, x1, h2, pr, qkv, ao, u = _block_fwd_call(
            x, mod3, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2,
            num_heads=num_heads, s_cell=fwd_cell, save_streams=mode)
        return out, (x, mod3, x1, h2, pr, qkv, ao, u, wqkv, wproj, w1, w2)

    def bwd(res, dy):
        if not pallas_bwd:
            return _jnp_bwd(num_heads, res, dy)
        x, mod3, x1, h2, pr, qkv, ao, u, wqkv, wproj, w1, w2 = res
        dx1, dmod_mlp, dw1, db1, dw2, db2 = _mlp_bwd_call(
            x1, mod3, h2, u, w1, w2, dy.astype(jnp.bfloat16),
            s_cell=bwd_cell)
        dx, dmod_msa, dwqkv, dbqkv, dwproj, dbproj = _attn_bwd_call(
            x, mod3, pr, qkv, ao, wqkv, wproj, dx1,
            num_heads=num_heads, s_cell=bwd_cell)
        n, t, c = x.shape
        dmod = jnp.concatenate([dmod_msa, dmod_mlp], axis=1)  # (N, 6, C)
        b = jnp.bfloat16
        return (dx, dmod.reshape(n, 6 * c).astype(b),
                dwqkv.astype(b), dbqkv.astype(b), dwproj.astype(b),
                dbproj.astype(b), dw1.astype(b), db1.astype(b),
                dw2.astype(b), db2.astype(b))

    block.defvjp(fwd, bwd)
    return block


def reference_block(x, mod, wqkv, bqkv, wproj, bproj, w1, b1, w2, b2, *,
                    num_heads: int):
    """Pure-jnp mirror of the kernel math (for grad parity tests)."""
    n, t, c = x.shape
    hd = c // num_heads
    scale = 1.0 / math.sqrt(hd)
    mod3 = mod.reshape(n, 6, c).astype(jnp.float32)
    sh_msa, sc_msa, g_msa, sh_mlp, sc_mlp, g_mlp = (
        mod3[:, i, :][:, None, :] for i in range(6))

    xf = x.astype(jnp.float32)
    n1, _ = _ln_fwd_parts(xf)
    h = (n1 * (1.0 + sc_msa) + sh_msa).astype(jnp.bfloat16)
    qkv = (jnp.einsum("ntc,cd->ntd", h, wqkv,
                      preferred_element_type=jnp.float32)
           + bqkv.astype(jnp.float32)).astype(jnp.bfloat16)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(n, t, num_heads, hd)
    k = k.reshape(n, t, num_heads, hd)
    v = v.reshape(n, t, num_heads, hd)
    logits = scale * jnp.einsum("nqhd,nkhd->nhqk", q.astype(jnp.float32),
                                k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1)
    o = jnp.einsum("nhqk,nkhd->nqhd", p.astype(jnp.bfloat16), v,
                   preferred_element_type=jnp.float32)
    ao = o.astype(jnp.bfloat16).reshape(n, t, c)
    pr = (jnp.einsum("ntc,cd->ntd", ao, wproj,
                     preferred_element_type=jnp.float32)
          + bproj.astype(jnp.float32))
    x1 = xf + g_msa * pr

    n2, _ = _ln_fwd_parts(x1)
    h = (n2 * (1.0 + sc_mlp) + sh_mlp).astype(jnp.bfloat16)
    u = (jnp.einsum("ntc,ch->nth", h, w1,
                    preferred_element_type=jnp.float32)
         + b1.astype(jnp.float32))
    g, _ = _gelu_tanh(u)
    h2 = (jnp.einsum("nth,hc->ntc", g.astype(jnp.bfloat16), w2,
                     preferred_element_type=jnp.float32)
          + b2.astype(jnp.float32))
    x2 = x1 + g_mlp * h2
    return x2.astype(jnp.bfloat16)
