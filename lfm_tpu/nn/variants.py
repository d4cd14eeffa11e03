"""Model-zoo variants: SuperResModel, EncoderUNetModel (classifier half-UNet),
UNet upsampler, ResNet classifier.

Completes the reference model inventory (SURVEY.md §2.1):
  * SuperResModel (reference models/guided_diffusion/unet.py:658-672) —
    UNet conditioned on a bilinear-upsampled low-res image (channel concat);
  * EncoderUNetModel (unet.py:675-879) — encoder half of the UNet for
    classifier(-guidance) training, with adaptive/attention/spatial pooling;
  * UNetUpsamplerModel (unet_upsampler.py, vendored-dead in the reference) —
    covered by SuperResModel here;
  * ResNet-18/34/50/101 (models/resnet.py:69-137, CIFAR-style, softmax out).
"""

from __future__ import annotations

import math
from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lfm_tpu.nn.adm_unet import (
    ADMAttentionBlock,
    ADMDownsample,
    ADMResBlock,
    UNetModel,
    build_unet_plan,
)
from lfm_tpu.nn.layers import GroupNorm32, timestep_embedding

Dtype = Any
_zeros = nn.initializers.zeros


class SuperResModel(UNetModel):
    """UNet over cat([x, upsample(low_res)]); construct with in_channels
    already doubled (the reference doubles it in __init__, unet.py:665-666)."""

    @nn.compact
    def __call__(self, t, x, y=None, low_res=None, context=None, train: bool = False):
        assert low_res is not None, "SuperResModel needs low_res conditioning"
        n, h, w, _ = x.shape
        up = jax.image.resize(low_res, (n, h, w, low_res.shape[-1]), method="bilinear")
        x = jnp.concatenate([x, up], axis=-1)
        return UNetModel.__call__(self, t, x, y, context=context, train=train)


class AttentionPool2d(nn.Module):
    """CLIP-style attention pooling (unet.py:14-41)."""

    num_head_channels: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        t = h * w
        tok = x.reshape(n, t, c)
        tok = jnp.concatenate([tok.mean(axis=1, keepdims=True), tok], axis=1)
        pos = self.param("positional_embedding",
                         nn.initializers.normal(1.0 / math.sqrt(c)), (t + 1, c))
        tok = tok + pos[None]
        heads = c // self.num_head_channels
        hd = self.num_head_channels
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv_proj")(tok)
        qkv = qkv.reshape(n, t + 1, 3, heads, hd)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        scale = 1.0 / math.sqrt(math.sqrt(hd))
        w_ = jax.nn.softmax(
            jnp.einsum("nqhd,nkhd->nhqk", q * scale, k * scale,
                       preferred_element_type=jnp.float32), axis=-1)
        o = jnp.einsum("nhqk,nkhd->nqhd", w_, v).reshape(n, t + 1, c)
        o = nn.Dense(self.out_channels, dtype=self.dtype, name="c_proj")(o)
        return o[:, 0]


class EncoderUNetModel(nn.Module):
    """Half-UNet classifier (unet.py:675-879). Output: (N, out_channels)."""

    image_size: int = 32
    in_channels: int = 4
    model_channels: int = 128
    out_channels: int = 1000
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    num_heads: int = 1
    num_head_channels: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    pool: str = "adaptive"  # adaptive | attention | spatial | spatial_v2
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t, x, train: bool = False) -> jnp.ndarray:
        n = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
        ted = self.model_channels * 4
        emb = timestep_embedding(t, self.model_channels).astype(self.dtype)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_1")(emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        plan = build_unet_plan(self.model_channels, self.channel_mult,
                               self.num_res_blocks, self.attention_resolutions,
                               self.in_channels, self.resblock_updown)
        h = x.astype(self.dtype)
        spatial_feats = []
        for i, block in enumerate(plan.input_blocks):
            for j, spec in enumerate(block):
                name = f"input_{i}_{j}"
                if spec.kind == "conv_in":
                    h = nn.Conv(spec.out_ch, (3, 3), padding=1, dtype=self.dtype,
                                name=name)(h)
                elif spec.kind == "res":
                    h = ADMResBlock(spec.out_ch, self.dropout,
                                    self.use_scale_shift_norm, dtype=self.dtype,
                                    name=name)(h, emb, train)
                elif spec.kind == "attn":
                    h = ADMAttentionBlock(self.num_heads, self.num_head_channels,
                                          legacy_order=not self.use_new_attention_order,
                                          dtype=self.dtype, name=name)(h)
                elif spec.kind in ("down", "res_down"):
                    if spec.kind == "res_down":
                        h = ADMResBlock(spec.out_ch, self.dropout,
                                        self.use_scale_shift_norm, down=True,
                                        dtype=self.dtype, name=name)(h, emb, train)
                    else:
                        h = ADMDownsample(spec.out_ch, dtype=self.dtype,
                                          name=name)(h)
            if self.pool.startswith("spatial"):
                spatial_feats.append(h.mean(axis=(1, 2)))

        for j, spec in enumerate(plan.middle_block):
            name = f"middle_{j}"
            if spec.kind == "res":
                h = ADMResBlock(spec.out_ch, self.dropout, self.use_scale_shift_norm,
                                dtype=self.dtype, name=name)(h, emb, train)
            else:
                h = ADMAttentionBlock(self.num_heads, self.num_head_channels,
                                      legacy_order=not self.use_new_attention_order,
                                      dtype=self.dtype, name=name)(h)

        if self.pool == "adaptive":
            h = GroupNorm32(name="out_norm")(h)
            h = nn.silu(h).mean(axis=(1, 2))
            return nn.Dense(self.out_channels, dtype=self.dtype, kernel_init=_zeros,
                            bias_init=_zeros, name="out_proj")(h).astype(jnp.float32)
        if self.pool == "attention":
            assert self.num_head_channels != -1
            h = GroupNorm32(name="out_norm")(h)
            h = nn.silu(h)
            return AttentionPool2d(self.num_head_channels, self.out_channels,
                                   dtype=self.dtype, name="out_pool")(h).astype(jnp.float32)
        if self.pool.startswith("spatial"):
            spatial_feats.append(h.mean(axis=(1, 2)))
            feat = jnp.concatenate(spatial_feats, axis=-1)
            if self.pool == "spatial":
                feat = nn.relu(nn.Dense(2048, dtype=self.dtype, name="fc1")(feat))
            else:  # spatial_v2
                feat = nn.Dense(2048, dtype=self.dtype, name="fc1")(feat)
                feat = nn.silu(GroupNorm32(name="fc_norm")(feat[:, None, None, :])[:, 0, 0])
            return nn.Dense(self.out_channels, dtype=self.dtype,
                            name="fc2")(feat).astype(jnp.float32)
        raise NotImplementedError(self.pool)


# ---------------------------------------------------------------------------
# CIFAR-style ResNet (models/resnet.py:69-137)
# ---------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="bn1")(h)
        h = nn.relu(h)
        h = nn.Conv(self.planes, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                         name="bn2")(h)
        if self.stride != 1 or in_ch != self.planes:
            x = nn.Conv(self.planes, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="shortcut")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                             name="bn_sc")(x)
        return nn.relu(x + h)


class _Bottleneck(nn.Module):
    planes: int
    stride: int = 1
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        in_ch = x.shape[-1]
        out_ch = 4 * self.planes
        h = nn.Conv(self.planes, (1, 1), use_bias=False, dtype=self.dtype, name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn1")(h))
        h = nn.Conv(self.planes, (3, 3), strides=self.stride, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(h)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn2")(h))
        h = nn.Conv(out_ch, (1, 1), use_bias=False, dtype=self.dtype, name="conv3")(h)
        h = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn3")(h)
        if self.stride != 1 or in_ch != out_ch:
            x = nn.Conv(out_ch, (1, 1), strides=self.stride, use_bias=False,
                        dtype=self.dtype, name="shortcut")(x)
            x = nn.BatchNorm(use_running_average=not train, dtype=jnp.float32, name="bn_sc")(x)
        return nn.relu(x + h)


class ResNet(nn.Module):
    block: Any = _BasicBlock
    num_blocks: Tuple[int, ...] = (2, 2, 2, 2)
    num_classes: int = 10
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.Conv(64, (3, 3), padding=1, use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        h = nn.relu(nn.BatchNorm(use_running_average=not train, dtype=jnp.float32,
                                 name="bn1")(h))
        planes = 64
        for li, nb in enumerate(self.num_blocks):
            for bi in range(nb):
                stride = (2 if li > 0 else 1) if bi == 0 else 1
                h = self.block(planes, stride, dtype=self.dtype,
                               name=f"layer{li + 1}_{bi}")(h, train)
            planes *= 2
        h = h.mean(axis=(1, 2))
        logits = nn.Dense(self.num_classes, dtype=self.dtype, name="linear")(h)
        # the reference returns softmax probabilities (models/resnet.py:65)
        return jax.nn.softmax(logits, axis=-1)


def resnet18(num_classes=10, **kw):
    return ResNet(_BasicBlock, (2, 2, 2, 2), num_classes, **kw)


def resnet34(num_classes=10, **kw):
    return ResNet(_BasicBlock, (3, 4, 6, 3), num_classes, **kw)


def resnet50(num_classes=10, **kw):
    return ResNet(_Bottleneck, (3, 4, 6, 3), num_classes, **kw)


def resnet101(num_classes=10, **kw):
    return ResNet(_Bottleneck, (3, 4, 23, 3), num_classes, **kw)


class GaussianFourierProjection(nn.Module):
    """Fixed random Fourier features (reference unet_upsampler.py:62-64 via
    score_sde's GaussianFourierProjection): W ~ N(0, scale^2), frozen;
    out = [sin(2*pi*x*W), cos(2*pi*x*W)]."""

    embedding_size: int = 128
    scale: float = 16.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        w = self.param(
            "W", lambda k, s: jax.random.normal(k, s) * self.scale,
            (self.embedding_size,),
        )
        # frozen random features: score_sde registers W with
        # requires_grad=False; keep it in the param tree for checkpoint
        # layout but block gradients so the optimizer never moves it
        w = jax.lax.stop_gradient(w)
        xp = x[:, None] * w[None, :] * 2.0 * jnp.pi
        return jnp.concatenate([jnp.sin(xp), jnp.cos(xp)], axis=-1)


class UNetUpsamplerModel(nn.Module):
    """Super-resolution UNet (reference unet_upsampler.py:1-241). Dead code
    in the reference — its imports (utils.util, score_sde_pytorch) do not
    even exist in the repo — ported for component completeness. Differences
    from UNetModel: Gaussian-Fourier time/augmentation embeddings over
    log(t)/log(aug_level), a low-res conditioning signal bilinearly resized
    to the model resolution and channel-concatenated with x (the
    undefined `get_resize_fn` is implemented as bilinear resize), and a
    (velocity, trunk features, embedding) triple return
    (unet_upsampler.py:210-241)."""

    image_size: int = 64
    in_channels: int = 6  # x channels + resized conditioning channels
    model_channels: int = 128
    out_channels: int = 3
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 4, 8)
    conv_resample: bool = True
    num_classes: Any = None
    num_heads: int = 1
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = False
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    fourier_scale: float = 16.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, t, x, y=None, context=None, train: bool = False):
        from lfm_tpu.nn.adm_unet import ADMUpsample

        assert context is not None, "context = (cond_signal, aug_level)"
        cond_signal, aug_level = context
        n = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
        aug_level = jnp.broadcast_to(
            jnp.asarray(aug_level, jnp.float32).reshape(-1), (n,))

        mc = self.model_channels
        ted = mc * 4
        # aug_gfp / time_embed pipeline (unet_upsampler.py:62-69,216-226):
        # GFP(log t) -> cat GFP(log aug) -> Linear -> SiLU -> Linear
        aug_emb = GaussianFourierProjection(mc, self.fourier_scale,
                                            name="aug_gfp")(jnp.log(aug_level))
        emb = GaussianFourierProjection(mc, self.fourier_scale,
                                        name="time_gfp")(jnp.log(t))
        emb = jnp.concatenate([emb, aug_emb], axis=-1).astype(self.dtype)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_1")(emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if self.num_classes is not None:
            assert y is not None
            table = self.param("label_emb", nn.initializers.normal(1.0),
                               (self.num_classes, ted))
            emb = emb + table[y].astype(self.dtype)

        # concat the bilinearly-upsampled conditioning (unet_upsampler.py:228)
        cond = jax.image.resize(
            cond_signal,
            (n, self.image_size, self.image_size, cond_signal.shape[-1]),
            method="bilinear",
        )
        h = jnp.concatenate([x, cond], axis=-1).astype(self.dtype)
        assert h.shape[-1] == self.in_channels, (
            f"x + resized cond channels = {h.shape[-1]}, expected "
            f"in_channels={self.in_channels}")

        plan = build_unet_plan(mc, self.channel_mult, self.num_res_blocks,
                               self.attention_resolutions, self.in_channels,
                               self.resblock_updown)

        def res(spec, name):
            return ADMResBlock(spec.out_ch, self.dropout,
                               self.use_scale_shift_norm, dtype=self.dtype,
                               name=name)

        def attn(name, upsample=False):
            heads = self.num_heads_upsample if (
                upsample and self.num_heads_upsample != -1) else self.num_heads
            return ADMAttentionBlock(
                heads, self.num_head_channels,
                legacy_order=not self.use_new_attention_order,
                dtype=self.dtype, name=name)

        def apply_spec(h, spec, name, upsample=False):
            if spec.kind == "conv_in":
                return nn.Conv(spec.out_ch, (3, 3), padding=1, dtype=self.dtype,
                               name=name)(h)
            if spec.kind == "res":
                return res(spec, name)(h, emb, train)
            if spec.kind == "attn":
                return attn(name, upsample)(h)
            if spec.kind == "res_down":
                return ADMResBlock(spec.out_ch, self.dropout,
                                   self.use_scale_shift_norm, down=True,
                                   dtype=self.dtype, name=name)(h, emb, train)
            if spec.kind == "res_up":
                return ADMResBlock(spec.out_ch, self.dropout,
                                   self.use_scale_shift_norm, up=True,
                                   dtype=self.dtype, name=name)(h, emb, train)
            if spec.kind == "down":
                return ADMDownsample(spec.out_ch, self.conv_resample,
                                     dtype=self.dtype, name=name)(h)
            if spec.kind == "up":
                return ADMUpsample(spec.out_ch, self.conv_resample,
                                   dtype=self.dtype, name=name)(h)
            raise ValueError(spec.kind)

        hs = []
        for i, block in enumerate(plan.input_blocks):
            for j, spec in enumerate(block):
                h = apply_spec(h, spec, f"input_{i}_{j}")
            hs.append(h)
        for j, spec in enumerate(plan.middle_block):
            h = apply_spec(h, spec, f"middle_{j}")
        for i, block in enumerate(plan.output_blocks):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, spec in enumerate(block):
                h = apply_spec(h, spec, f"output_{i}_{j}", upsample=True)

        out = GroupNorm32(name="out_norm")(h)
        out = nn.silu(out)
        out = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                      kernel_init=_zeros, bias_init=_zeros, name="out_conv")(out)
        # triple return mirrors unet_upsampler.py:241
        return out.astype(jnp.float32), h, emb
