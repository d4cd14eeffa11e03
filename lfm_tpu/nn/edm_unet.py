"""EDM model family (SongUNet DDPM++/NCSN++, DhariwalUNet ADM), TPU-native.

Re-design of the reference's NVIDIA-EDM reimplementation
(reference models/EDM.py:532-939) in flax/NHWC:
  * ``Conv2d``-style fused/unfused up-down resampling becomes depthwise
    ``lax.conv_general_dilated`` with the [1,1] or [1,3,3,1] smoothing filter
    (EDM.py:63-132);
  * the unified UNetBlock (EDM.py:188-292) keeps the reference's exact
    semantics: adaptive scale-shift vs additive embedding, skip_scale,
    fp32 attention (AttentionOp, EDM.py:160-179) with the (head, ch, 3)
    interleaved qkv layout, zero-init conv1/proj;
  * encoder/decoder blocks are name-keyed exactly like the reference's
    ModuleDicts (``enc_{res}x{res}_block{i}`` ...) so checkpoint conversion
    is name-based;
  * SongUNet's sin/cos swap of the positional embedding (EDM.py:666) and
    the NCSN++ residual-aux encoder path (EDM.py:611-621,685-686) are
    reproduced.

``forward_with_cfg`` mirrors DhariwalUNet's drop-half-label CFG
(EDM.py:847-861).
"""

from __future__ import annotations

import math
from typing import Any, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from lfm_tpu.core.config import ModelConfig

Dtype = Any
_zeros = nn.initializers.zeros


# ---------------------------------------------------------------------------
# Resampling (EDM Conv2d up/down semantics)
# ---------------------------------------------------------------------------

def _resample_kernel(filt: Sequence[float]) -> np.ndarray:
    f = np.asarray(filt, np.float32)
    k = np.outer(f, f) / (f.sum() ** 2)
    return k  # (kh, kw)


def depthwise_down(x: jnp.ndarray, filt: Sequence[float], pad: Optional[int] = None) -> jnp.ndarray:
    """conv2d with the depthwise smoothing filter, stride 2 (EDM.py:124-127)."""
    c = x.shape[-1]
    k = _resample_kernel(filt)
    if pad is None:
        pad = (k.shape[0] - 1) // 2
    kern = jnp.asarray(k, x.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(2, 2), padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


def depthwise_up(x: jnp.ndarray, filt: Sequence[float], pad: Optional[int] = None) -> jnp.ndarray:
    """conv_transpose2d with 4x the filter, stride 2 (EDM.py:120-123)."""
    c = x.shape[-1]
    k = _resample_kernel(filt) * 4.0
    if pad is None:
        pad = (k.shape[0] - 1) // 2
    kern = jnp.asarray(k, x.dtype)[:, :, None, None] * jnp.ones((1, 1, 1, c), x.dtype)
    # conv_transpose(stride 2, padding=pad) == lhs-dilated conv with flipped
    # kernel; the filter is symmetric so no flip is needed
    kh = k.shape[0]
    return jax.lax.conv_general_dilated(
        x, kern, window_strides=(1, 1),
        padding=[(kh - 1 - pad, kh - 1 - pad)] * 2,
        lhs_dilation=(2, 2),
        dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
    )


class EDMConv(nn.Module):
    """EDM Conv2d: optional up/down resample around a kxk conv (EDM.py:63-132).
    kernel=0 means resample-only (no weights)."""

    out_ch: int
    kernel: int = 3
    up: bool = False
    down: bool = False
    resample_filter: Tuple[float, ...] = (1.0, 1.0)
    fused_resample: bool = False
    use_bias: bool = True
    init_weight_scale: float = 1.0  # 0.0 => zero init
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x.astype(self.dtype)
        if self.kernel == 0:
            if self.up:
                return depthwise_up(x, self.resample_filter)
            if self.down:
                return depthwise_down(x, self.resample_filter)
            return x

        w_pad = self.kernel // 2
        f_pad = (len(self.resample_filter) - 1) // 2
        init = (
            _zeros if self.init_weight_scale == 0.0 else nn.initializers.variance_scaling(
                self.init_weight_scale, "fan_in", "normal"
            )
        )
        conv = nn.Conv(
            self.out_ch, (self.kernel, self.kernel), padding="VALID",
            use_bias=self.use_bias, dtype=self.dtype, kernel_init=init,
            bias_init=_zeros, name="conv",
        )

        def padded(z, p):
            return jnp.pad(z, ((0, 0), (p, p), (p, p), (0, 0))) if p else z

        if self.fused_resample and self.up:
            # (EDM.py:107-115) transpose-up with reduced pad, then VALID-ish conv
            x = depthwise_up(x, self.resample_filter, pad=max(f_pad - w_pad, 0))
            return conv(padded(x, max(w_pad - f_pad, 0)))
        if self.fused_resample and self.down:
            # (EDM.py:116-118) conv with extra pad, then stride-2 filter, pad 0
            h = conv(padded(x, w_pad + f_pad))
            return depthwise_down(h, self.resample_filter, pad=0)
        if self.up:
            x = depthwise_up(x, self.resample_filter)
        if self.down:
            x = depthwise_down(x, self.resample_filter)
        return conv(padded(x, w_pad))


class EDMGroupNorm(nn.Module):
    """GroupNorm with min-channels-per-group rule (EDM.py:139-151), fp32."""

    num_channels: int
    eps: float = 1e-5
    num_groups: int = 32
    min_per_group: int = 4

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        g = min(self.num_groups, self.num_channels // self.min_per_group)
        orig = x.dtype
        y = nn.GroupNorm(num_groups=g, epsilon=self.eps, dtype=jnp.float32,
                         name="norm")(x.astype(jnp.float32))
        return y.astype(orig)


# ---------------------------------------------------------------------------
# Unified UNetBlock (EDM.py:188-292)
# ---------------------------------------------------------------------------

class EDMUNetBlock(nn.Module):
    out_ch: int
    emb_ch: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1.0, 1.0)
    resample_proj: bool = False
    adaptive_scale: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, emb: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        in_ch = x.shape[-1]
        heads = (
            0 if not self.attention
            else (self.num_heads if self.num_heads is not None
                  else self.out_ch // self.channels_per_head)
        )

        orig = x
        h = EDMGroupNorm(in_ch, self.eps, name="norm0")(x)
        h = EDMConv(self.out_ch, 3, up=self.up, down=self.down,
                    resample_filter=self.resample_filter, dtype=self.dtype,
                    name="conv0")(nn.silu(h))

        e = nn.Dense(self.out_ch * (2 if self.adaptive_scale else 1),
                     dtype=self.dtype, name="affine")(emb)
        if self.adaptive_scale:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = EDMGroupNorm(self.out_ch, self.eps, name="norm1")(h)
            h = nn.silu(shift[:, None, None, :] + h * (scale[:, None, None, :] + 1.0))
        else:
            h = h + e[:, None, None, :].astype(h.dtype)
            h = nn.silu(EDMGroupNorm(self.out_ch, self.eps, name="norm1")(h))

        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = EDMConv(self.out_ch, 3, init_weight_scale=0.0, dtype=self.dtype,
                    name="conv1")(h)

        if self.out_ch != in_ch or self.up or self.down:
            kernel = 1 if (self.resample_proj or self.out_ch != in_ch) else 0
            orig = EDMConv(self.out_ch, kernel, up=self.up, down=self.down,
                           resample_filter=self.resample_filter, dtype=self.dtype,
                           name="skip")(orig)
        x = (h + orig) * self.skip_scale

        if heads:
            n, hh, ww, c = x.shape
            t = hh * ww
            hd = c // heads
            y = EDMGroupNorm(c, self.eps, name="norm2")(x).reshape(n, t, c)
            qkv = nn.Dense(3 * c, dtype=jnp.float32, name="qkv")(y.astype(jnp.float32))
            # reference layout: channel index decomposes as (head, ch, 3)
            # (EDM.py:277-281: reshape(b*heads, C/heads, 3, T))
            qkv = qkv.reshape(n, t, heads, hd, 3)
            q, k, v = qkv[..., 0], qkv[..., 1], qkv[..., 2]
            w = jnp.einsum("nqhd,nkhd->nhqk", q, k / math.sqrt(hd),
                           preferred_element_type=jnp.float32)
            w = jax.nn.softmax(w, axis=-1)
            a = jnp.einsum("nhqk,nkhd->nqhd", w, v).reshape(n, t, c)
            a = nn.Dense(c, dtype=jnp.float32, kernel_init=_zeros,
                         bias_init=_zeros, name="proj")(a)
            x = (x + a.reshape(n, hh, ww, c).astype(x.dtype)) * self.skip_scale
        return x


# ---------------------------------------------------------------------------
# Context conditioning (EDM.py:295-483): UNetBlockWithContext replaces
# self-attention with a GroupNorm'd transformer block (self-attn, cross-attn
# over a context sequence, silu feed-forward), used by model_type
# "adm_context" (EDM.py:923-938).
# ---------------------------------------------------------------------------

class EDMCrossAttention(nn.Module):
    """(EDM.py:369-424). q from x tokens; k/v from context tokens; head-major
    channel grouping, fp32 softmax with 1/sqrt(hd) on k."""

    query_channels: int
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    zero_proj: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x_tokens: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        c = self.query_channels
        heads = self.num_heads if self.num_heads is not None else c // self.channels_per_head
        hd = c // heads
        ctx = x_tokens if context is None else context
        q = nn.Dense(c, dtype=jnp.float32, name="q")(x_tokens.astype(jnp.float32))
        k = nn.Dense(c, dtype=jnp.float32, name="k")(ctx.astype(jnp.float32))
        v = nn.Dense(c, dtype=jnp.float32, name="v")(ctx.astype(jnp.float32))
        n, tq, _ = q.shape
        tk = k.shape[1]
        q = q.reshape(n, tq, heads, hd)
        k = k.reshape(n, tk, heads, hd)
        v = v.reshape(n, tk, heads, hd)
        w = jnp.einsum("nqhd,nkhd->nhqk", q, k / math.sqrt(hd),
                       preferred_element_type=jnp.float32)
        w = jax.nn.softmax(w, axis=-1)
        a = jnp.einsum("nhqk,nkhd->nqhd", w, v).reshape(n, tq, c)
        init = _zeros if self.zero_proj else nn.initializers.lecun_normal()
        return nn.Dense(c, dtype=jnp.float32, kernel_init=init, bias_init=_zeros,
                        name="proj")(a).astype(x_tokens.dtype)


class EDMTransformerBlock(nn.Module):
    """(EDM.py:444-483): GroupNorm -> self-attn -> cross-attn -> silu-MLP,
    all residual, on an NHWC feature map with context (N, L, Cc)."""

    channels: int
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    eps: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, context: Optional[jnp.ndarray] = None):
        n, h, w, c = x.shape
        if context is not None and context.ndim == 2:
            context = context[:, None, :]  # (N, 1, Cc)

        def tok(z):
            return z.reshape(n, h * w, c)

        y = EDMGroupNorm(c, self.eps, name="norm1")(x)
        x = x + EDMCrossAttention(c, self.num_heads, self.channels_per_head,
                                  dtype=self.dtype, name="attn1")(tok(y)).reshape(n, h, w, c)
        y = EDMGroupNorm(c, self.eps, name="norm2")(x)
        x = x + EDMCrossAttention(c, self.num_heads, self.channels_per_head,
                                  dtype=self.dtype, name="attn2")(tok(y), context).reshape(n, h, w, c)
        y = EDMGroupNorm(c, self.eps, name="norm3")(x)
        y = tok(y)
        y = nn.silu(nn.Dense(4 * c, dtype=self.dtype, name="ff_layer0")(y))
        y = nn.Dense(c, dtype=self.dtype, name="ff_layer1")(y)
        return x + y.reshape(n, h, w, c)


class EDMUNetBlockWithContext(nn.Module):
    """UNetBlock with attention replaced by a context TransformerBlock
    (EDM.py:295-367)."""

    out_ch: int
    emb_ch: int
    up: bool = False
    down: bool = False
    attention: bool = False
    num_heads: Optional[int] = None
    channels_per_head: int = 64
    dropout: float = 0.0
    skip_scale: float = 1.0
    eps: float = 1e-5
    resample_filter: Tuple[float, ...] = (1.0, 1.0)
    resample_proj: bool = False
    adaptive_scale: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, context=None, train: bool = False):
        base = EDMUNetBlock(
            self.out_ch, self.emb_ch, up=self.up, down=self.down,
            attention=False, dropout=self.dropout, skip_scale=self.skip_scale,
            eps=self.eps, resample_filter=self.resample_filter,
            resample_proj=self.resample_proj, adaptive_scale=self.adaptive_scale,
            dtype=self.dtype, name="base",
        )
        x = base(x, emb, train)
        if self.attention:
            x = EDMTransformerBlock(
                self.out_ch, self.num_heads, self.channels_per_head,
                eps=self.eps, dtype=self.dtype, name="transformer",
            )(x, context)
            x = x * self.skip_scale
        return x


# ---------------------------------------------------------------------------
# Timestep embeddings (EDM.py:490-522)
# ---------------------------------------------------------------------------

def positional_embedding(t: jnp.ndarray, num_channels: int, endpoint: bool = False) -> jnp.ndarray:
    """[cos | sin] ordering (EDM PositionalEmbedding)."""
    half = num_channels // 2
    freqs = jnp.arange(half, dtype=jnp.float32) / (half - (1 if endpoint else 0))
    freqs = (1.0 / 10_000.0) ** freqs
    args = t.astype(jnp.float32)[:, None] * freqs[None]
    return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


class FourierEmbedding(nn.Module):
    """Random-frequency embedding (NCSN++); freqs are a stored buffer in the
    reference checkpoint, here a frozen parameter (EDM.py:512-522)."""

    num_channels: int
    scale: float = 16.0

    @nn.compact
    def __call__(self, t: jnp.ndarray) -> jnp.ndarray:
        freqs = self.param(
            "freqs", nn.initializers.normal(self.scale), (self.num_channels // 2,)
        )
        args = t.astype(jnp.float32)[:, None] * (2.0 * jnp.pi * freqs)[None]
        return jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=1)


# ---------------------------------------------------------------------------
# SongUNet (DDPM++ / NCSN++, EDM.py:532-706)
# ---------------------------------------------------------------------------

class SongUNet(nn.Module):
    img_resolution: int
    in_channels: int = 4
    out_channels: int = 4
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    channel_mult_emb: int = 4
    num_blocks: int = 4
    attn_resolutions: Tuple[int, ...] = (16,)
    dropout: float = 0.10
    label_dropout: float = 0.0
    embedding_type: str = "positional"  # 'fourier' for NCSN++
    channel_mult_noise: int = 1
    encoder_type: str = "standard"  # 'residual' for NCSN++
    decoder_type: str = "standard"
    resample_filter: Tuple[float, ...] = (1.0, 1.0)
    dtype: Dtype = jnp.float32

    def _block_kwargs(self) -> Dict:
        return dict(
            emb_ch=self.model_channels * self.channel_mult_emb,
            num_heads=1, dropout=self.dropout, skip_scale=float(np.sqrt(0.5)),
            eps=1e-6, resample_filter=self.resample_filter, resample_proj=True,
            adaptive_scale=False, dtype=self.dtype,
        )

    @property
    def null_label(self) -> int:
        # one_hot(-1) is the zero vector == the reference's drop_half_label
        # zeroed one-hot (EDM.py:825-826)
        return -1

    @nn.compact
    def __call__(self, t, x, y=None, augment_labels=None, train: bool = False):
        n = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
        emb_ch = self.model_channels * self.channel_mult_emb
        noise_ch = self.model_channels * self.channel_mult_noise
        bk = self._block_kwargs()

        if self.embedding_type == "positional":
            emb = positional_embedding(t, noise_ch, endpoint=True)
        else:
            emb = FourierEmbedding(noise_ch, name="map_noise")(t)
        # swap sin/cos halves (EDM.py:666)
        emb = emb.reshape(n, 2, -1)[:, ::-1, :].reshape(n, -1)

        if self.label_dim:
            assert y is not None
            onehot = jax.nn.one_hot(y, self.label_dim, dtype=jnp.float32)
            if train and self.label_dropout > 0:
                rng = self.make_rng("label_dropout")
                keep = jax.random.uniform(rng, (n, 1)) >= self.label_dropout
                onehot = onehot * keep
            emb = emb + nn.Dense(noise_ch, dtype=self.dtype, name="map_label")(
                onehot * math.sqrt(self.label_dim)
            )
        if self.augment_dim and augment_labels is not None:
            emb = emb + nn.Dense(noise_ch, use_bias=False, dtype=self.dtype,
                                 name="map_augment")(augment_labels)
        emb = nn.silu(nn.Dense(emb_ch, dtype=self.dtype, name="map_layer0")(emb))
        emb = nn.silu(nn.Dense(emb_ch, dtype=self.dtype, name="map_layer1")(emb))

        # Encoder
        skips: List[jnp.ndarray] = []
        h = x.astype(self.dtype)
        aux = h
        cout = self.in_channels
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                cout = self.model_channels
                h = EDMConv(cout, 3, dtype=self.dtype, name=f"enc_{res}x{res}_conv")(h)
                skips.append(h)
            else:
                h = EDMUNetBlock(cout, down=True, **bk, name=f"enc_{res}x{res}_down")(h, emb, train)
                skips.append(h)
                if self.encoder_type == "skip":
                    aux = EDMConv(aux.shape[-1], 0, down=True,
                                  resample_filter=self.resample_filter, dtype=self.dtype,
                                  name=f"enc_{res}x{res}_aux_down")(aux)
                    h = h + EDMConv(cout, 1, dtype=self.dtype,
                                    name=f"enc_{res}x{res}_aux_skip")(aux)
                    skips[-1] = h
                elif self.encoder_type == "residual":
                    aux = EDMConv(cout, 3, down=True, fused_resample=True,
                                  resample_filter=self.resample_filter, dtype=self.dtype,
                                  name=f"enc_{res}x{res}_aux_residual")(aux)
                    h = (h + aux) / math.sqrt(2.0)
                    aux = h
                    skips[-1] = h
            for idx in range(self.num_blocks):
                cout = self.model_channels * mult
                attn = res in self.attn_resolutions
                h = EDMUNetBlock(cout, attention=attn, **bk,
                                 name=f"enc_{res}x{res}_block{idx}")(h, emb, train)
                skips.append(h)

        # Decoder
        aux_out = None
        tmp = None
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                h = EDMUNetBlock(h.shape[-1], attention=True, **bk,
                                 name=f"dec_{res}x{res}_in0")(h, emb, train)
                h = EDMUNetBlock(h.shape[-1], **bk, name=f"dec_{res}x{res}_in1")(h, emb, train)
            else:
                h = EDMUNetBlock(h.shape[-1], up=True, **bk,
                                 name=f"dec_{res}x{res}_up")(h, emb, train)
            for idx in range(self.num_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                cout = self.model_channels * mult
                attn = idx == self.num_blocks and res in self.attn_resolutions
                h = EDMUNetBlock(cout, attention=attn, **bk,
                                 name=f"dec_{res}x{res}_block{idx}")(h, emb, train)
            if self.decoder_type == "skip" or level == 0:
                if self.decoder_type == "skip" and level < len(self.channel_mult) - 1:
                    aux_out = EDMConv(self.out_channels, 0, up=True,
                                      resample_filter=self.resample_filter, dtype=self.dtype,
                                      name=f"dec_{res}x{res}_aux_up")(aux_out)
                tmp = EDMGroupNorm(h.shape[-1], 1e-6, name=f"dec_{res}x{res}_aux_norm")(h)
                tmp = EDMConv(self.out_channels, 3, init_weight_scale=0.0, dtype=self.dtype,
                              name=f"dec_{res}x{res}_aux_conv")(nn.silu(tmp))
                aux_out = tmp if aux_out is None else tmp + aux_out
        return aux_out.astype(jnp.float32)


# ---------------------------------------------------------------------------
# DhariwalUNet (ADM, EDM.py:716-861)
# ---------------------------------------------------------------------------

class DhariwalUNet(nn.Module):
    img_resolution: int
    in_channels: int = 4
    out_channels: int = 4
    label_dim: int = 0
    augment_dim: int = 0
    model_channels: int = 192
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4)
    channel_mult_emb: int = 4
    num_blocks: int = 3
    attn_resolutions: Tuple[int, ...] = (32, 16, 8)
    dropout: float = 0.10
    label_dropout: float = 0.0
    use_context: bool = False  # adm_context: label -> cross-attn context
    dtype: Dtype = jnp.float32

    def _block_kwargs(self) -> Dict:
        return dict(
            emb_ch=self.model_channels * self.channel_mult_emb,
            channels_per_head=64, dropout=self.dropout, dtype=self.dtype,
        )

    @property
    def null_label(self) -> int:
        # one_hot(-1) == zero vector == reference drop_half_label zeroing
        # (EDM.py:825-826)
        return -1

    @property
    def _block_cls(self):
        return EDMUNetBlockWithContext if self.use_context else EDMUNetBlock

    @nn.compact
    def __call__(self, t, x, y=None, augment_labels=None, train: bool = False,
                 drop_half_label: bool = False):
        n = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
        emb_ch = self.model_channels * self.channel_mult_emb
        bk = self._block_kwargs()

        emb = positional_embedding(t, self.model_channels, endpoint=False)
        if self.augment_dim and augment_labels is not None:
            emb = emb + nn.Dense(self.model_channels, use_bias=False,
                                 kernel_init=_zeros, dtype=self.dtype,
                                 name="map_augment")(augment_labels)
        emb = nn.silu(nn.Dense(emb_ch, dtype=self.dtype, name="map_layer0")(emb))
        emb = nn.Dense(emb_ch, dtype=self.dtype, name="map_layer1")(emb)

        context = None
        if self.label_dim and y is not None and not self.use_context:
            onehot = jax.nn.one_hot(y, self.label_dim, dtype=jnp.float32)
            if train and self.label_dropout > 0:
                rng = self.make_rng("label_dropout")
                keep = jax.random.uniform(rng, (n, 1)) >= self.label_dropout
                onehot = onehot * keep
            elif drop_half_label:
                half_mask = (jnp.arange(n) < n // 2).astype(jnp.float32)[:, None]
                onehot = onehot * half_mask
            emb = emb + nn.Dense(emb_ch, use_bias=False, dtype=self.dtype,
                                 name="map_label")(onehot)
        elif self.use_context and self.label_dim:
            # context path: LabelEmbedder like the reference's DiT import
            # (EDM.py:754-756,828-829)
            from lfm_tpu.nn.layers import LabelEmbedder

            context = LabelEmbedder(self.label_dim, emb_ch, self.label_dropout,
                                    dtype=self.dtype, name="map_label")(y, train)
        emb = nn.silu(emb)

        # Encoder
        skips: List[jnp.ndarray] = []
        h = x.astype(self.dtype)
        for level, mult in enumerate(self.channel_mult):
            res = self.img_resolution >> level
            if level == 0:
                h = EDMConv(self.model_channels * mult, 3, dtype=self.dtype,
                            name=f"enc_{res}x{res}_conv")(h)
                skips.append(h)
            else:
                h = self._call_block(f"enc_{res}x{res}_down", h.shape[-1], bk,
                                     h, emb, context, train, down=True)
                skips.append(h)
            for idx in range(self.num_blocks):
                h = self._call_block(f"enc_{res}x{res}_block{idx}",
                                     self.model_channels * mult, bk, h, emb,
                                     context, train,
                                     attention=res in self.attn_resolutions)
                skips.append(h)

        # Decoder
        for level, mult in reversed(list(enumerate(self.channel_mult))):
            res = self.img_resolution >> level
            if level == len(self.channel_mult) - 1:
                h = self._call_block(f"dec_{res}x{res}_in0", h.shape[-1], bk,
                                     h, emb, context, train, attention=True)
                h = self._call_block(f"dec_{res}x{res}_in1", h.shape[-1], bk,
                                     h, emb, context, train)
            else:
                h = self._call_block(f"dec_{res}x{res}_up", h.shape[-1], bk,
                                     h, emb, context, train, up=True)
            for idx in range(self.num_blocks + 1):
                h = jnp.concatenate([h, skips.pop()], axis=-1)
                h = self._call_block(f"dec_{res}x{res}_block{idx}",
                                     self.model_channels * mult, bk, h, emb,
                                     context, train,
                                     attention=res in self.attn_resolutions)

        h = EDMGroupNorm(h.shape[-1], name="out_norm")(h)
        h = EDMConv(self.out_channels, 3, init_weight_scale=0.0, dtype=self.dtype,
                    name="out_conv")(nn.silu(h))
        return h.astype(jnp.float32)

    def _call_block(self, name, out_ch, bk, h, emb, context, train,
                    attention=False, up=False, down=False):
        if self.use_context:
            blk = EDMUNetBlockWithContext(out_ch, attention=attention, up=up,
                                          down=down, **bk, name=name)
            return blk(h, emb, context, train)
        blk = EDMUNetBlock(out_ch, attention=attention, up=up, down=down,
                           **bk, name=name)
        return blk(h, emb, train)

    def forward_with_cfg(self, params, t, x, y, cfg_scale: float = 1.0) -> jnp.ndarray:
        """Drop-half-label CFG on a pre-doubled batch (EDM.py:847-861)."""
        n = x.shape[0] // 2
        half = x[:n]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply(params, t, combined, y, drop_half_label=True)
        cond, uncond = out[:n], out[n:]
        guided = uncond + cfg_scale * (cond - uncond)
        return jnp.concatenate([guided, guided], axis=0)


def create_edm_network(cfg: ModelConfig, *, dtype=jnp.float32, use_flash: bool = False,
                       remat: bool = False):
    """Dispatch ncsn++/ddpm++/adm (reference models/EDM.py:864-939)."""
    common = dict(
        img_resolution=cfg.latent_size,
        in_channels=cfg.num_in_channels,
        out_channels=cfg.num_out_channels,
        label_dim=cfg.label_dim,
        model_channels=cfg.nf,
        channel_mult=tuple(cfg.ch_mult),
        channel_mult_emb=4,
        num_blocks=cfg.num_res_blocks,
        attn_resolutions=tuple(cfg.attn_resolutions),
        dropout=cfg.dropout,
        label_dropout=cfg.label_dropout,
        dtype=dtype,
    )
    if cfg.model_type == "ncsn++":
        return SongUNet(
            embedding_type="fourier", channel_mult_noise=2,
            encoder_type="residual", decoder_type="standard",
            resample_filter=(1.0, 3.0, 3.0, 1.0), **common,
        )
    if cfg.model_type == "ddpm++":
        return SongUNet(
            embedding_type="positional", channel_mult_noise=1,
            encoder_type="standard", decoder_type="standard",
            resample_filter=(1.0, 1.0), **common,
        )
    if cfg.model_type == "adm":
        return DhariwalUNet(**common)
    if cfg.model_type == "adm_context":
        return DhariwalUNet(use_context=True, **common)
    raise ValueError(f"unknown EDM model_type {cfg.model_type!r}")
