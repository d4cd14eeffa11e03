"""Shared neural-net building blocks (flax.linen, NHWC, bf16-aware).

TPU-native equivalents of the reference's timm/ADM helper layers:
  * sinusoidal timestep embedding + MLP (reference models/DiT.py:29-69,
    models/guided_diffusion/nn.py:103-121)
  * patch embedding (timm PatchEmbed; models/DiT.py:179)
  * multi-head self-attention with fp32 softmax (timm Attention;
    the reference keeps softmax in fp32 islands: models/EDM.py:160-179)
  * gated-GELU MLP (timm Mlp)
  * label embedding with CFG dropout (models/DiT.py:72-104)
  * GroupNorm32 (models/guided_diffusion/nn.py:17-19)

All spatial tensors are NHWC (XLA:TPU's preferred conv layout); the
checkpoint converter transposes torch NCHW/OIHW weights accordingly.
"""

from __future__ import annotations

import math
from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name

Dtype = Any


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10_000.0) -> jnp.ndarray:
    """Sinusoidal embedding, cos-first ordering as in the reference DiT
    (models/DiT.py:53-62: ``cat([cos, sin])``). t: (N,) float."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


def adm_timestep_embedding(t: jnp.ndarray, dim: int, max_period: float = 10_000.0) -> jnp.ndarray:
    """ADM ordering, sin-first (models/guided_diffusion/nn.py:103-121)."""
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepEmbedder(nn.Module):
    """freq embedding -> Linear -> SiLU -> Linear (models/DiT.py:29-69)."""

    hidden_size: int
    freq_size: int = 256
    dtype: Dtype = jnp.float32
    sin_first: bool = False  # ADM ordering

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        embed = adm_timestep_embedding if self.sin_first else timestep_embedding
        x = embed(t, self.freq_size).astype(self.dtype)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc1",
                     kernel_init=nn.initializers.normal(0.02))(x)
        x = nn.silu(x)
        x = nn.Dense(self.hidden_size, dtype=self.dtype, name="fc2",
                     kernel_init=nn.initializers.normal(0.02))(x)
        return x


class LabelEmbedder(nn.Module):
    """Class-label embedding with CFG dropout to a null class
    (models/DiT.py:72-104). Table has num_classes+1 rows when dropout>0."""

    num_classes: int
    hidden_size: int
    dropout_prob: float = 0.0
    dtype: Dtype = jnp.float32

    @property
    def table_size(self) -> int:
        return self.num_classes + int(self.dropout_prob > 0)

    @nn.compact
    def __call__(self, labels: jnp.ndarray, train: bool = False,
                 force_drop_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        table = self.param(
            "embedding", nn.initializers.normal(0.02), (self.table_size, self.hidden_size)
        )
        if (train and self.dropout_prob > 0) or force_drop_ids is not None:
            if force_drop_ids is None:
                rng = self.make_rng("label_dropout")
                drop = jax.random.uniform(rng, labels.shape) < self.dropout_prob
            else:
                drop = force_drop_ids == 1
            labels = jnp.where(drop, self.num_classes, labels)
        return table[labels].astype(self.dtype)


class PatchEmbed(nn.Module):
    """Non-overlapping patchify conv (timm PatchEmbed; models/DiT.py:179).
    Input NHWC (N, H, W, C) -> tokens (N, H/p * W/p, D), row-major order."""

    patch_size: int
    hidden_size: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.patch_size
        n, h, w, c = x.shape
        # a stride-p conv == reshape + matmul for non-overlapping patches;
        # the matmul form maps straight onto the MXU with no conv lowering.
        x = x.reshape(n, h // p, p, w // p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(n, (h // p) * (w // p), p * p * c)
        x = nn.Dense(
            self.hidden_size, dtype=self.dtype, name="proj",
            kernel_init=nn.initializers.xavier_uniform(),
        )(x.astype(self.dtype))
        return x


def get_2d_sincos_pos_embed(embed_dim: int, grid_size: int) -> jnp.ndarray:
    """Fixed 2D sin-cos position table (models/DiT.py:299-346): grid is
    meshgrid(w, h) with h varying slowest; per-axis embedding is
    [sin | cos] over omega = 1/10000^(2i/d)."""
    import numpy as np

    def embed_1d(pos: "np.ndarray") -> "np.ndarray":
        omega = np.arange(embed_dim // 4, dtype=np.float64) / (embed_dim / 4.0)
        omega = 1.0 / 10_000 ** omega
        out = np.einsum("m,d->md", pos.reshape(-1), omega)
        return np.concatenate([np.sin(out), np.cos(out)], axis=1)

    grid_h = np.arange(grid_size, dtype=np.float32)
    grid_w = np.arange(grid_size, dtype=np.float32)
    # meshgrid(w, h): X varies along w, Y along h; the reference embeds
    # grid[0]=X in the first D/2 channels (its emb_h label notwithstanding).
    gx, gy = np.meshgrid(grid_w, grid_h)
    emb = np.concatenate([embed_1d(gx), embed_1d(gy)], axis=1)
    return jnp.asarray(emb, jnp.float32)


class Attention(nn.Module):
    """Fused-qkv multi-head self-attention (timm layout for checkpoint
    compatibility). Softmax in fp32. Optionally dispatches to the Pallas
    flash-attention kernel (kernels/flash_attention.py) on TPU."""

    hidden_size: int
    num_heads: int
    qkv_bias: bool = True
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    # mesh axis name for sequence parallelism: x is a token shard inside
    # shard_map and attention runs as a ppermute ring (core/ring.py).
    # Takes precedence over use_flash (the local Pallas kernels cannot emit
    # the partial-softmax statistics the ring combine needs).
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, t, d = x.shape
        h = self.num_heads
        hd = d // h
        qkv = nn.Dense(3 * d, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv",
                       kernel_init=nn.initializers.xavier_uniform())(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(n, t, h, hd)
        k = k.reshape(n, t, h, hd)
        v = v.reshape(n, t, h, hd)

        if self.sp_axis is not None:
            from lfm_tpu.core.ring import ring_attention

            out = ring_attention(q, k, v, self.sp_axis)
        elif self.use_flash:
            from lfm_tpu.kernels.flash_attention import fused_attention

            out = fused_attention(q, k, v)
        else:
            scale = 1.0 / math.sqrt(hd)
            attn = jnp.einsum("nqhd,nkhd->nhqk", q, k, preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn * scale, axis=-1).astype(self.dtype)
            out = jnp.einsum("nhqk,nkhd->nqhd", attn, v)
        # The attention output is not a no-batch-dims dot, so the "dots"
        # remat policy would re-run the whole kernel in backward; naming it
        # lets the "dots_attn" policy (nn/dit.py) save it instead.
        out = checkpoint_name(out, "attn_out")

        out = out.reshape(n, t, d)
        out = nn.Dense(d, dtype=self.dtype, name="proj",
                       kernel_init=nn.initializers.xavier_uniform())(out)
        return out


class Mlp(nn.Module):
    """Linear -> GELU(tanh) -> Linear (timm Mlp; models/DiT.py:122-124)."""

    hidden_features: int
    out_features: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Dense(self.hidden_features, dtype=self.dtype, name="fc1",
                     kernel_init=nn.initializers.xavier_uniform())(x)
        x = nn.gelu(x, approximate=True)
        x = nn.Dense(self.out_features, dtype=self.dtype, name="fc2",
                     kernel_init=nn.initializers.xavier_uniform())(x)
        return x


class GroupNorm32(nn.Module):
    """GroupNorm computed in fp32 regardless of activation dtype
    (models/guided_diffusion/nn.py:17-19)."""

    num_groups: int = 32
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        orig = x.dtype
        y = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         dtype=jnp.float32, name="norm")(x.astype(jnp.float32))
        return y.astype(orig)


def modulate(x: jnp.ndarray, shift: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """adaLN modulation (models/DiT.py:20-21): x*(1+scale)+shift, per-batch."""
    return x * (1.0 + scale[:, None, :]) + shift[:, None, :]
