"""LDM-style cross-attention stack (reference models/guided_diffusion/attention.py).

SpatialTransformer (attention.py:243-280) conditions UNet feature maps on a
context sequence: 1x1 proj-in -> depth x BasicTransformerBlock (self-attn,
cross-attn, gated-GEGLU feed-forward) -> zero-init 1x1 proj-out, residual.
Used by the layout-conditioned UNetModelAttn (reference models/__init__.py:21-46,
transformer_depth=3, context_dim=512). LinearAttention / SpatialSelfAttention
(attention.py:121-174) are included for capability parity.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any
_zeros = nn.initializers.zeros


class GEGLU(nn.Module):
    """(attention.py:85-92)"""

    dim_out: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        xg = nn.Dense(2 * self.dim_out, dtype=self.dtype, name="proj")(x)
        x, gate = jnp.split(xg, 2, axis=-1)
        return x * nn.gelu(gate, approximate=False)


class FeedForward(nn.Module):
    """(attention.py:95-105)"""

    dim: int
    mult: int = 4
    glu: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        if self.glu:
            x = GEGLU(inner, dtype=self.dtype, name="geglu")(x)
        else:
            x = nn.Dense(inner, dtype=self.dtype, name="fc_in")(x)
            x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, name="fc_out")(x)


class CrossAttention(nn.Module):
    """(attention.py:177-215): q from x, k/v from context (or x when None)."""

    heads: int = 8
    dim_head: int = 64
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, mask=None):
        inner = self.heads * self.dim_head
        query_dim = x.shape[-1]
        context = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(context)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(context)

        n, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(n, tq, self.heads, self.dim_head)
        k = k.reshape(n, tk, self.heads, self.dim_head)
        v = v.reshape(n, tk, self.heads, self.dim_head)

        sim = jnp.einsum("nqhd,nkhd->nhqk", q, k,
                         preferred_element_type=jnp.float32) * (self.dim_head ** -0.5)
        if mask is not None:
            big_neg = jnp.finfo(jnp.float32).min
            sim = jnp.where(mask[:, None, None, :], sim, big_neg)
        attn = jax.nn.softmax(sim, axis=-1).astype(self.dtype)
        out = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, tq, inner)
        return nn.Dense(query_dim, dtype=self.dtype, name="to_out")(out)


class BasicTransformerBlock(nn.Module):
    """(attention.py:218-240): self-attn -> cross-attn -> gated FF."""

    dim: int
    n_heads: int
    d_head: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        h = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        x = CrossAttention(self.n_heads, self.d_head, dtype=self.dtype,
                           name="attn1")(h) + x
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        x = CrossAttention(self.n_heads, self.d_head, dtype=self.dtype,
                           name="attn2")(h, context=context) + x
        h = nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        x = FeedForward(self.dim, dtype=self.dtype, name="ff")(h) + x
        return x


class SpatialTransformer(nn.Module):
    """(attention.py:243-280). Input NHWC; context (N, L, context_dim)."""

    n_heads: int
    d_head: int
    depth: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None):
        n, h, w, c = x.shape
        inner = self.n_heads * self.d_head
        x_in = x
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32)).astype(self.dtype)
        y = nn.Dense(inner, dtype=self.dtype, name="proj_in")(y).reshape(n, h * w, inner)
        for d in range(self.depth):
            y = BasicTransformerBlock(inner, self.n_heads, self.d_head,
                                      dtype=self.dtype, name=f"block_{d}")(y, context)
        y = y.reshape(n, h, w, inner)
        y = nn.Dense(c, dtype=self.dtype, kernel_init=_zeros, bias_init=_zeros,
                     name="proj_out")(y)
        return y + x_in


class LinearAttention(nn.Module):
    """(attention.py:121-137): softmax-over-keys linear attention."""

    heads: int = 4
    dim_head: int = 32
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        inner = self.heads * self.dim_head
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype, name="to_qkv")(x)
        qkv = qkv.reshape(n, h * w, 3, self.heads, self.dim_head)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        k = jax.nn.softmax(k, axis=1)
        ctx = jnp.einsum("nthd,nthe->nhde", k, v)
        out = jnp.einsum("nhde,nthd->nthe", ctx, q).reshape(n, h, w, inner)
        return nn.Dense(c, dtype=self.dtype, name="to_out")(out)


class SpatialSelfAttention(nn.Module):
    """(attention.py:140-174): single-head VAE-style spatial attention."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        y = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32)).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="q")(y).reshape(n, h * w, c)
        k = nn.Dense(c, dtype=self.dtype, name="k")(y).reshape(n, h * w, c)
        v = nn.Dense(c, dtype=self.dtype, name="v")(y).reshape(n, h * w, c)
        wgt = jax.nn.softmax(
            jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
            * (c ** -0.5), axis=-1,
        ).astype(self.dtype)
        o = jnp.einsum("nqk,nkc->nqc", wgt, v).reshape(n, h, w, c)
        o = nn.Dense(c, dtype=self.dtype, name="proj_out")(o)
        return x + o
