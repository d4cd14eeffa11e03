"""Pallas TPU flash attention (non-causal, full self-attention).

The per-NFE inner kernel of every velocity network (SURVEY.md §3.5): DiT
blocks attend over 256-4096 latent tokens (models/DiT.py:120 via timm), ADM
attention over <=1024 positions. This kernel fuses QK^T, the online softmax,
and PV into one VMEM-resident pass — no (T, T) attention matrix ever hits
HBM — with fp32 accumulation matching the reference's fp32-softmax islands
(models/EDM.py:160-179).

Layout: q, k, v are (N, T, H, D); the kernel runs on (N*H, T, D) with a grid
over (batch*heads, q-blocks) and an online-softmax loop over k-blocks.
"""

from __future__ import annotations

import contextlib
import functools
import math
import threading

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, *, bk: int, scale: float):
    """One (q-block, all k) pass with online softmax.

    q_ref: (1, BQ, D); k_ref/v_ref: (1, T, D); o_ref: (1, BQ, D).
    """
    q = q_ref[0]  # (BQ, D) — native dtype into the MXU (bf16 full rate)
    t = k_ref.shape[1]
    bq, d = q.shape
    num_kb = t // bk

    def body(i, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(i * bk, bk), :]  # (BK, D)
        v = v_ref[0, pl.ds(i * bk, bk), :]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (BQ, BK) f32
        m_cur = jnp.max(s, axis=-1, keepdims=True)
        m_new = jnp.maximum(m_prev, m_cur)
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m_prev - m_new)
        l_new = alpha * l_prev + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return acc, m_new, l_new

    acc0 = jnp.zeros((bq, d), jnp.float32)
    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc, _, l = jax.lax.fori_loop(0, num_kb, body, (acc0, m0, l0))
    o_ref[0] = (acc / l).astype(o_ref.dtype)


def _pick_block(t: int, target: int) -> int:
    """Largest divisor of t that is <= target (t is a power-of-two token
    count for all square latent grids)."""
    b = min(t, target)
    while t % b:
        b -= 1
    return b


@functools.partial(jax.jit, static_argnames=("block_q", "block_k"))
def flash_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    block_q: int = 256,
    block_k: int = 512,
) -> jnp.ndarray:
    """q, k, v: (N, T, H, D) -> (N, T, H, D). Softmax scale 1/sqrt(D)."""
    n, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    bq = _pick_block(t, block_q)
    bk = _pick_block(t, block_k)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(n * h, t, d)

    qb, kb, vb = to_bh(q), to_bh(k), to_bh(v)

    grid = (n * h, t // bq)
    out = pl.pallas_call(
        functools.partial(_flash_kernel, bk=bk, scale=scale),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n * h, t, d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * t * t * d,
            bytes_accessed=(3 * n * h * t * d + n * h * t * d) * q.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(qb, kb, vb)

    return out.reshape(n, h, t, d).transpose(0, 2, 1, 3)


def reference_attention(q, k, v):
    """Plain-XLA einsum attention (for parity tests and fallback)."""
    d = q.shape[-1]
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
    p = jax.nn.softmax(s / math.sqrt(d), axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", p, v)


# ---------------------------------------------------------------------------
# Small-T fused attention (the north-star shape: DiT at 256 tokens)
# ---------------------------------------------------------------------------
#
# At T<=1024 the (T, T) probs fit VMEM whole, so flash's online softmax is
# unnecessary — but XLA's materialized attention writes the f32 probs tensor
# to HBM (268 MB per DiT-L/2 block at batch 64) and the flash path above
# spends more on its (N,T,H,D)->(N*H,T,D) physical transposes (~1 GB of HBM
# traffic per block) than the fusion saves; both measured ~25-39 ms per
# velocity eval against an ~8 ms FLOP cost. This kernel keeps the native
# (N, T, H, D) layout — each grid cell DMAs one batch element's contiguous
# (T, H*D) slab and loops the heads with static slices, so no transpose or
# probs tensor ever touches HBM.


def _attn_small_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float,
                       heads: int, head_dim: int):
    """refs: (1, T, H*D) slabs. Full per-head softmax attention in VMEM;
    heads are static lane slices of the slab (Mosaic rejects squeezing a
    middle dim of a 4D block, so the (H, D) split stays implicit)."""
    qs, ks, vs = q_ref[0], k_ref[0], v_ref[0]
    # bf16 operands feed the MXU natively (bf16 x bf16 -> f32 accumulate at
    # full rate); upcasting to f32 first would force the slow multi-pass f32
    # MXU path. Softmax statistics stay f32 either way.
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q, k, v = qs[:, sl], ks[:, sl], vs[:, sl]  # (T, D) each
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        o = jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[0, :, sl] = (o / l).astype(o_ref.dtype)


@jax.jit
def attention_small(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """q, k, v: (N, T, H, D) -> (N, T, H, D), T <= 1024. Scale 1/sqrt(D)."""
    n, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    qs, ks, vs = (a.reshape(n, t, h * d) for a in (q, k, v))  # free bitcast
    spec = pl.BlockSpec((1, t, h * d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_attn_small_kernel, scale=scale, heads=h, head_dim=d),
        grid=(n,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((n, t, h * d), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=4 * n * h * t * t * d,
            bytes_accessed=4 * n * t * h * d * q.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(qs, ks, vs)
    return out.reshape(n, t, h, d)


def _attn_small_bwd_kernel(q_ref, k_ref, v_ref, do_ref,
                           dq_ref, dk_ref, dv_ref, *, scale: float,
                           heads: int, head_dim: int):
    """Backward of whole-sequence attention, one batch element per grid cell.

    refs: (1, T, H*D) slabs. Per head (static lane slices, as in the forward):
      s = scale * q k^T ; p = softmax(s) ; o = p v
      dv = p^T do
      dp = do v^T ;  ds = p * (dp - rowsum(dp * p))
      dq = scale * ds k ;  dk = scale * ds^T q
    The (T, T) probs are recomputed in VMEM — they never existed in HBM in
    the forward either, so the backward stays HBM-minimal (reads q/k/v/do
    slabs, writes dq/dk/dv slabs; ~2.5x forward FLOPs)."""
    qs, ks, vs, dos = q_ref[0], k_ref[0], v_ref[0], do_ref[0]
    # Matmul operands stay in the input dtype (bf16 x bf16 -> f32 MXU
    # accumulate at full rate — upcasting first forces the slow f32 path);
    # softmax and the ds correction are f32. p/ds are rounded to the input
    # dtype before their dots, the same rounding XLA's own autodiff of
    # reference_attention applies to its bf16 probs.
    for h in range(heads):
        sl = slice(h * head_dim, (h + 1) * head_dim)
        q, k, v, do = qs[:, sl], ks[:, sl], vs[:, sl], dos[:, sl]
        s = scale * jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # (T, T) f32
        m = jnp.max(s, axis=-1, keepdims=True)
        e = jnp.exp(s - m)
        p = e / jnp.sum(e, axis=-1, keepdims=True)
        pc = p.astype(q.dtype)
        dv = jax.lax.dot_general(
            pc, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # p^T do: (T, D)
        dp = jax.lax.dot_general(
            do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )  # do v^T: (T, T)
        ds = (p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))).astype(q.dtype)
        dq = scale * jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = scale * jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # ds^T q
        dq_ref[0, :, sl] = dq.astype(dq_ref.dtype)
        dk_ref[0, :, sl] = dk.astype(dk_ref.dtype)
        dv_ref[0, :, sl] = dv.astype(dv_ref.dtype)


@jax.jit
def attention_small_bwd(q, k, v, do):
    """dq, dk, dv for attention_small; all operands (N, T, H, D).

    Measured parity on v5e at (8,256,16,64): bf16 grads within 0.5% of XLA
    autodiff; in f32 the kernel's grads are CLOSER to the true-f32
    (precision=HIGHEST) reference than XLA's own default MXU path is
    (0.29-0.53% vs 0.57-1.0% rel-max-err)."""
    n, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)
    slabs = tuple(a.reshape(n, t, h * d) for a in (q, k, v, do))
    spec = pl.BlockSpec((1, t, h * d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((n, t, h * d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_attn_small_bwd_kernel, scale=scale, heads=h,
                          head_dim=d),
        grid=(n,),
        in_specs=[spec, spec, spec, spec],
        out_specs=[spec, spec, spec],
        out_shape=[shape, shape, shape],
        cost_estimate=pl.CostEstimate(
            flops=10 * n * h * t * t * d,
            bytes_accessed=7 * n * t * h * d * q.dtype.itemsize,
            transcendentals=n * h * t * t,
        ),
    )(*slabs)
    return tuple(a.reshape(n, t, h, d) for a in (dq, dk, dv))


def _small_shape_ok(q) -> bool:
    n, t, h, d = q.shape
    # VMEM budget: q/k/v f32 working set ~ 3*t*h*d*4 bytes + (t, t) probs
    return t <= 1024 and (3 * t * h * d * 4 + t * t * 4) < 96 * 1024 * 1024


_ASSUME_LOCAL = threading.local()


@contextlib.contextmanager
def assume_local_devices():
    """Trace-time gate override for shard_map bodies: inside a shard_map the
    per-shard computation has single-device semantics, but the global
    ``jax.device_count()`` is still the mesh size, which would wrongly send
    dispatch to the XLA path. Callers that trace the model INSIDE a
    shard_map (train.shard_mapped_model_apply, sample/sharded.py) wrap the
    apply in this context so the Pallas kernels engage per-shard. Mirrors
    ``dit_fused.fused_applicable(assume_local=True)`` on the sampling side."""
    prev = getattr(_ASSUME_LOCAL, "on", False)
    _ASSUME_LOCAL.on = True
    try:
        yield
    finally:
        _ASSUME_LOCAL.on = prev


def _pallas_ok() -> bool:
    """Pallas dispatch gate: TPU backend AND single-device semantics —
    either one global device, or tracing inside a shard_map body (see
    ``assume_local_devices``), where a pallas_call is already partitioned
    per-shard by construction."""
    if jax.default_backend() != "tpu":
        return False
    return jax.device_count() == 1 or getattr(_ASSUME_LOCAL, "on", False)


def _dispatch_attention(q, k, v):
    """Whole-sequence VMEM kernel for small T, flash for long T; plain XLA
    on non-TPU backends (CPU tests run the reference path directly) and on
    multi-device meshes (see _pallas_ok)."""
    if not _pallas_ok():
        return reference_attention(q, k, v)
    if _small_shape_ok(q):
        return attention_small(q, k, v)
    return flash_attention(q, k, v)


@jax.custom_vjp
def fused_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Differentiable fused attention: Pallas forward (no (T,T) probs or
    layout transposes in HBM). Backward: a matching Pallas kernel at small T
    (probs recomputed in VMEM, never written to HBM); XLA-recompute fallback
    for long-T / off-TPU. Measured on v5e: 13.6% faster DiT-L/2 velocity
    eval at the north-star 256-token shape (84.8 -> 73.2 ms per 100-NFE
    batch-64 eval, MFU 0.62 -> 0.72)."""
    return _dispatch_attention(q, k, v)


def _fused_attention_fwd(q, k, v):
    return _dispatch_attention(q, k, v), (q, k, v)


def _fused_attention_bwd(res, g):
    q, k, v = res
    if _pallas_ok() and _small_shape_ok(q):
        return attention_small_bwd(q, k, v, g)
    _, vjp = jax.vjp(reference_attention, q, k, v)
    return vjp(g)


fused_attention.defvjp(_fused_attention_fwd, _fused_attention_bwd)
