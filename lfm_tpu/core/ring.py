"""Ring attention: exact self-attention over a sequence-sharded mesh axis.

TPU-native sequence parallelism (no reference counterpart — the reference
tops out at single-GPU T=4096, models/unet.py attention at ds=1): the token
axis is sharded over a mesh axis; each device keeps its q shard resident and
the k/v shards circulate around the ring via ``lax.ppermute`` (one ICI hop
per step), combined with the online-softmax recurrence — the distributed
form of the flash-attention update (kernels/flash_attention.py:31-66). The
result is bitwise-independent of the ring size up to f32 reduction order,
and memory per device is O(T_local * T_local) per step instead of O(T^2).

Call INSIDE ``shard_map`` with the sequence axis mapped to ``axis_name``.
Differentiable (lax.scan + ppermute transpose = reverse-ring ppermute).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["ring_attention"]


def ring_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    axis_name: str,
    scale: Optional[float] = None,
) -> jnp.ndarray:
    """Exact attention for sequence shards. q/k/v: (N, T_local, H, D).

    Scores and the softmax running statistics are f32; the two block matmuls
    take the input dtype (bf16 operands hit the MXU at full rate with f32
    accumulate). Output has q's dtype.
    """
    n, t_loc, h, d = q.shape
    if scale is None:
        scale = 1.0 / math.sqrt(d)
    size = lax.psum(1, axis_name)
    # forward ring: shard i receives the block that started on shard i-1,
    # so after `size` steps every q shard has seen every k/v shard
    perm = [(i, (i + 1) % size) for i in range(size)]

    acc0 = jnp.zeros((n, h, t_loc, d), jnp.float32)
    m0 = jnp.full((n, h, t_loc, 1), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((n, h, t_loc, 1), jnp.float32)

    def step(carry, _):
        k_blk, v_blk, acc, m, l = carry
        s = scale * jnp.einsum(
            "nqhd,nkhd->nhqk", q, k_blk, preferred_element_type=jnp.float32
        )  # (N, H, Tq, Tk) f32
        m_new = jnp.maximum(m, jnp.max(s, axis=-1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l = alpha * l + jnp.sum(p, axis=-1, keepdims=True)
        acc = acc * alpha + jnp.einsum(
            "nhqk,nkhd->nhqd", p.astype(v_blk.dtype), v_blk,
            preferred_element_type=jnp.float32,
        )
        k_blk = lax.ppermute(k_blk, axis_name, perm)
        v_blk = lax.ppermute(v_blk, axis_name, perm)
        return (k_blk, v_blk, acc, m_new, l), None

    (_, _, acc, _, l), _ = lax.scan(step, (k, v, acc0, m0, l0), None, length=size)
    out = acc / l  # (N, H, Tq, D)
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # (N, Tq, H, D)
