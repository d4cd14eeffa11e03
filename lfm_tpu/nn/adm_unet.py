"""ADM ("guided diffusion") UNet velocity network, TPU-native (flax/NHWC).

Re-design of the reference's vendored OpenAI UNet
(reference models/guided_diffusion/unet.py:376-655) covering every flag the
released checkpoints use: scale-shift GroupNorm conditioning, resblock
up/down-sampling, legacy vs new qkv attention order, per-level attention at
``attention_resolutions``, class conditioning, conv/avg-pool resampling.

The encoder/decoder topology (which layer sits at which
``input_blocks.{i}.{j}`` index) is computed once by :func:`build_unet_plan`
— shared by the forward graph and the checkpoint converter, so the torch
state-dict mapping is mechanical.

Attention is computed in fp32 (reference unet.py:284,332) with the
1/sqrt(sqrt(d)) two-sided scaling; GroupNorm runs fp32
(models/guided_diffusion/nn.py:17-19). Everything else follows the dtype
policy (bf16 on TPU).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from lfm_tpu.core.config import ModelConfig
from lfm_tpu.nn.layers import GroupNorm32, timestep_embedding

Dtype = Any
_zeros = nn.initializers.zeros


# ---------------------------------------------------------------------------
# Topology plan (mirrors unet.py:463-595 block construction)
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class LayerSpec:
    kind: str  # conv_in | res | attn | down | up | res_down | res_up
    in_ch: int = 0
    out_ch: int = 0


@dataclasses.dataclass(frozen=True)
class UNetPlan:
    input_blocks: Tuple[Tuple[LayerSpec, ...], ...]
    middle_block: Tuple[LayerSpec, ...]
    output_blocks: Tuple[Tuple[LayerSpec, ...], ...]
    out_ch_final: int


def build_unet_plan(
    model_channels: int,
    channel_mult: Sequence[int],
    num_res_blocks: int,
    attention_resolutions: Sequence[int],
    in_channels: int,
    resblock_updown: bool,
) -> UNetPlan:
    ch = int(channel_mult[0] * model_channels)
    inputs: List[Tuple[LayerSpec, ...]] = [(LayerSpec("conv_in", in_channels, ch),)]
    chans = [ch]
    ds = 1
    for level, mult in enumerate(channel_mult):
        for _ in range(num_res_blocks):
            layers = [LayerSpec("res", ch, int(mult * model_channels))]
            ch = int(mult * model_channels)
            if ds in attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch))
            inputs.append(tuple(layers))
            chans.append(ch)
        if level != len(channel_mult) - 1:
            kind = "res_down" if resblock_updown else "down"
            inputs.append((LayerSpec(kind, ch, ch),))
            chans.append(ch)
            ds *= 2

    middle = (
        LayerSpec("res", ch, ch),
        LayerSpec("attn", ch, ch),
        LayerSpec("res", ch, ch),
    )

    outputs: List[Tuple[LayerSpec, ...]] = []
    for level, mult in list(enumerate(channel_mult))[::-1]:
        for i in range(num_res_blocks + 1):
            ich = chans.pop()
            layers = [LayerSpec("res", ch + ich, int(model_channels * mult))]
            ch = int(model_channels * mult)
            if ds in attention_resolutions:
                layers.append(LayerSpec("attn", ch, ch))
            if level and i == num_res_blocks:
                kind = "res_up" if resblock_updown else "up"
                layers.append(LayerSpec(kind, ch, ch))
                ds //= 2
            outputs.append(tuple(layers))

    return UNetPlan(tuple(inputs), middle, tuple(outputs), ch)


# ---------------------------------------------------------------------------
# Layers
# ---------------------------------------------------------------------------

class ADMUpsample(nn.Module):
    out_ch: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
        if self.use_conv:
            x = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)
        return x


class ADMDownsample(nn.Module):
    out_ch: int
    use_conv: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        if self.use_conv:
            return nn.Conv(self.out_ch, (3, 3), strides=2, padding=1,
                           dtype=self.dtype, name="op")(x)
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class _GNSiLU(nn.Module):
    """GroupNorm32 + SiLU, optionally fused via the Pallas kernel. Param path
    matches GroupNorm32 (<name>/norm/{scale,bias}) for checkpoint compat."""

    fused: bool = False

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        if not self.fused:
            orig = x.dtype
            y = nn.GroupNorm(num_groups=32, epsilon=1e-5, dtype=jnp.float32,
                             name="norm")(x.astype(jnp.float32))
            return nn.silu(y).astype(orig)

        class _P(nn.Module):
            @nn.compact
            def __call__(self, features):
                return (self.param("scale", nn.initializers.ones, (features,)),
                        self.param("bias", nn.initializers.zeros, (features,)))

        scale, bias = _P(name="norm")(c)
        from lfm_tpu.kernels.groupnorm_silu import FusedGNSiLU

        orig = x.dtype
        return FusedGNSiLU.apply(x.astype(jnp.float32), scale, bias).astype(orig)


class ADMResBlock(nn.Module):
    """ResBlock with optional scale-shift norm and fused up/down resampling
    (reference unet.py:131-238)."""

    out_ch: int
    dropout: float = 0.0
    use_scale_shift_norm: bool = True
    up: bool = False
    down: bool = False
    fused_gn: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, train: bool = False):
        in_ch = x.shape[-1]
        h = _GNSiLU(fused=self.fused_gn, name="in_norm")(x)
        if self.up or self.down:
            resample = self._resample
            h = resample(h)
            x = resample(x)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="in_conv")(h)

        e = nn.Dense(
            2 * self.out_ch if self.use_scale_shift_norm else self.out_ch,
            dtype=self.dtype, name="emb_proj",
        )(nn.silu(emb))

        if self.use_scale_shift_norm:
            scale, shift = jnp.split(e, 2, axis=-1)
            h = GroupNorm32(name="out_norm")(h)
            h = h * (1.0 + scale[:, None, None, :]) + shift[:, None, None, :]
            h = nn.silu(h)
        else:
            h = h + e[:, None, None, :]
            h = _GNSiLU(fused=self.fused_gn, name="out_norm")(h)
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_zeros, bias_init=_zeros, name="out_conv")(h)

        if self.out_ch != in_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="skip")(x)
        return x + h

    def _resample(self, x):
        n, h, w, c = x.shape
        if self.up:
            return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
        return nn.avg_pool(x, (2, 2), strides=(2, 2))


class ADMAttentionBlock(nn.Module):
    """Spatial self-attention over H*W tokens (reference unet.py:241-287).

    ``legacy_order`` selects the qkv channel layout: legacy interleaves
    (q,k,v) within each head (QKVAttentionLegacy, unet.py:310-334); new
    order splits q/k/v first (QKVAttention, unet.py:341-369). Both compute
    softmax in fp32 with two-sided 1/sqrt(sqrt(d)) scaling.
    """

    num_heads: int = 1
    num_head_channels: int = -1
    legacy_order: bool = True
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    @nn.compact
    def __call__(self, x):
        n, h, w, c = x.shape
        heads = (
            c // self.num_head_channels if self.num_head_channels != -1 else self.num_heads
        )
        hd = c // heads
        t = h * w

        y = GroupNorm32(name="norm")(x.astype(jnp.float32)).reshape(n, t, c)
        qkv = nn.Dense(3 * c, dtype=jnp.float32, name="qkv")(y)  # fp32 island

        if self.legacy_order:
            # channel layout: (heads, 3, hd)
            qkv = qkv.reshape(n, t, heads, 3, hd)
            q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        else:
            # channel layout: (3, heads, hd)
            qkv = qkv.reshape(n, t, 3, heads, hd)
            q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]

        if self.use_flash:
            # Pallas whole-sequence attention (f32 accumulation, softmax in
            # VMEM). Math-identical: the reference's two-sided
            # 1/sqrt(sqrt(d)) scaling of q and k equals the kernel's single
            # 1/sqrt(d) logit scale (unet.py:325-330). Measured neutral on
            # the celeb256_adm preset (32.4 vs 32.7 samples/s — attention
            # is ~3% of this conv-dominated model at T<=256); it matters
            # for configs with attention at T>=1024 where the flash path
            # wins 1.6x over materialized probs.
            from lfm_tpu.kernels.flash_attention import fused_attention

            o = fused_attention(q, k, v).reshape(n, t, c)
        else:
            scale = 1.0 / math.sqrt(math.sqrt(hd))
            attn = jnp.einsum("nqhd,nkhd->nhqk", q * scale, k * scale,
                              preferred_element_type=jnp.float32)
            attn = jax.nn.softmax(attn, axis=-1)
            o = jnp.einsum("nhqk,nkhd->nqhd", attn, v).reshape(n, t, c)
        o = nn.Dense(c, dtype=jnp.float32, kernel_init=_zeros, bias_init=_zeros,
                     name="proj_out")(o)
        return x + o.reshape(n, h, w, c).astype(x.dtype)


# ---------------------------------------------------------------------------
# Full model
# ---------------------------------------------------------------------------

class UNetModel(nn.Module):
    """Velocity network v(t, x, y); x: (N, H, W, C) NHWC latents."""

    image_size: int = 32
    in_channels: int = 4
    model_channels: int = 256
    out_channels: int = 4
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (16, 8)
    dropout: float = 0.0
    channel_mult: Tuple[int, ...] = (1, 2, 2, 2)
    conv_resample: bool = True
    num_classes: Optional[int] = None
    num_heads: int = 4
    num_head_channels: int = -1
    num_heads_upsample: int = -1
    use_scale_shift_norm: bool = True
    resblock_updown: bool = False
    use_new_attention_order: bool = False
    use_fused_gn: bool = False  # Pallas fused GroupNorm+SiLU in res blocks
    # SpatialTransformer cross-attention variant (reference UNetModelAttn,
    # unet.py:882-1205; wired with transformer_depth=3, context_dim=512 for
    # --layout, models/__init__.py:21-46)
    use_spatial_transformer: bool = False
    transformer_depth: int = 1
    context_dim: Optional[int] = None
    legacy: bool = True
    dtype: Dtype = jnp.float32
    use_flash: bool = False

    @property
    def null_label(self) -> int:
        """CFG null class. Origin-ADM embeds labels by integer GATHER
        (reference unet.py:630 ``label_emb(y)``), so -1 would wrap to the
        LAST class row; the reference harness uses class 0
        (``torch.zeros_like(y)``, test_flow_latent.py:180) for non-DiT
        models — mirror that."""
        return 0

    @property
    def plan(self) -> UNetPlan:
        return build_unet_plan(
            self.model_channels, self.channel_mult, self.num_res_blocks,
            self.attention_resolutions, self.in_channels, self.resblock_updown,
        )

    def _layer(self, spec: LayerSpec, name: str, upsample_heads: bool = False):
        heads = self.num_heads_upsample if (
            upsample_heads and self.num_heads_upsample != -1
        ) else self.num_heads
        if spec.kind == "conv_in":
            return nn.Conv(spec.out_ch, (3, 3), padding=1, dtype=self.dtype, name=name)
        if spec.kind == "res":
            return ADMResBlock(spec.out_ch, self.dropout, self.use_scale_shift_norm,
                               fused_gn=self.use_fused_gn, dtype=self.dtype, name=name)
        if spec.kind == "attn":
            if self.use_spatial_transformer:
                ch = spec.out_ch
                # dim_head resolution (reference unet.py:1008-1017)
                if self.num_head_channels == -1:
                    n_heads, dim_head = heads, ch // heads
                else:
                    n_heads, dim_head = ch // self.num_head_channels, self.num_head_channels
                if self.legacy:
                    dim_head = ch // n_heads
                from lfm_tpu.nn.attention import SpatialTransformer

                return SpatialTransformer(
                    n_heads, dim_head, depth=self.transformer_depth,
                    dtype=self.dtype, name=name,
                )
            return ADMAttentionBlock(
                heads, self.num_head_channels,
                legacy_order=not self.use_new_attention_order,
                dtype=self.dtype, use_flash=self.use_flash, name=name,
            )
        if spec.kind == "down":
            return ADMDownsample(spec.out_ch, self.conv_resample, dtype=self.dtype, name=name)
        if spec.kind == "up":
            return ADMUpsample(spec.out_ch, self.conv_resample, dtype=self.dtype, name=name)
        if spec.kind == "res_down":
            return ADMResBlock(spec.out_ch, self.dropout, self.use_scale_shift_norm,
                               down=True, fused_gn=self.use_fused_gn,
                               dtype=self.dtype, name=name)
        if spec.kind == "res_up":
            return ADMResBlock(spec.out_ch, self.dropout, self.use_scale_shift_norm,
                               up=True, fused_gn=self.use_fused_gn,
                               dtype=self.dtype, name=name)
        raise ValueError(spec.kind)

    @nn.compact
    def __call__(self, t, x, y=None, context=None, train: bool = False):
        n = x.shape[0]
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
        plan = self.plan

        ted = self.model_channels * 4
        emb = timestep_embedding(t, self.model_channels).astype(self.dtype)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_1")(emb)
        emb = nn.Dense(ted, dtype=self.dtype, name="time_embed_2")(nn.silu(emb))

        if self.num_classes is not None:
            assert y is not None, "class-conditional model needs y"
            table = self.param("label_emb",
                               nn.initializers.normal(1.0), (self.num_classes, ted))
            emb = emb + table[y].astype(self.dtype)

        h = x.astype(self.dtype)
        hs = []
        for i, block in enumerate(plan.input_blocks):
            for j, spec in enumerate(block):
                layer = self._layer(spec, f"input_{i}_{j}")
                h = self._apply_layer(layer, spec, h, emb, train, context)
            hs.append(h)

        for j, spec in enumerate(plan.middle_block):
            layer = self._layer(spec, f"middle_{j}")
            h = self._apply_layer(layer, spec, h, emb, train, context)

        for i, block in enumerate(plan.output_blocks):
            h = jnp.concatenate([h, hs.pop()], axis=-1)
            for j, spec in enumerate(block):
                layer = self._layer(spec, f"output_{i}_{j}", upsample_heads=True)
                h = self._apply_layer(layer, spec, h, emb, train, context)

        h = GroupNorm32(name="out_norm")(h)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    kernel_init=_zeros, bias_init=_zeros, name="out_conv")(h)
        return h.astype(jnp.float32)

    def _apply_layer(self, layer, spec: LayerSpec, h, emb, train, context=None):
        if spec.kind in ("res", "res_down", "res_up"):
            return layer(h, emb, train)
        if spec.kind == "attn" and self.use_spatial_transformer:
            return layer(h, context)
        return layer(h)


def create_adm_unet(cfg: ModelConfig, *, dtype=jnp.float32, use_flash: bool = False,
                    remat: bool = False) -> UNetModel:
    """Factory for --use_origin_adm (reference models/__init__.py:47-68);
    with cfg.layout this is the UNetModelAttn wiring (models/__init__.py:21-46:
    transformer_depth=3, context_dim=512)."""
    if cfg.layout:
        return UNetModel(
            image_size=cfg.latent_size,
            in_channels=cfg.num_in_channels,
            model_channels=cfg.nf,
            out_channels=cfg.num_out_channels,
            num_res_blocks=cfg.num_res_blocks,
            attention_resolutions=tuple(cfg.attn_resolutions),
            dropout=cfg.dropout,
            channel_mult=tuple(cfg.ch_mult),
            conv_resample=cfg.resamp_with_conv,
            num_classes=cfg.num_classes if (cfg.num_classes or 0) > 1 else None,
            num_heads=cfg.num_heads,
            num_head_channels=cfg.num_head_channels,
            num_heads_upsample=cfg.num_head_upsample,
            use_scale_shift_norm=cfg.use_scale_shift_norm,
            resblock_updown=cfg.resblock_updown,
            use_new_attention_order=cfg.use_new_attention_order,
            use_spatial_transformer=True,
            transformer_depth=cfg.transformer_depth or 3,
            context_dim=cfg.context_dim or 512,
            dtype=dtype,
            use_flash=use_flash,
        )
    return UNetModel(
        image_size=cfg.latent_size,
        in_channels=cfg.num_in_channels,
        model_channels=cfg.nf,
        out_channels=cfg.num_out_channels,
        num_res_blocks=cfg.num_res_blocks,
        attention_resolutions=tuple(cfg.attn_resolutions),
        dropout=cfg.dropout,
        channel_mult=tuple(cfg.ch_mult),
        conv_resample=cfg.resamp_with_conv,
        num_classes=cfg.num_classes if (cfg.num_classes or 0) > 1 else None,
        num_heads=cfg.num_heads,
        num_head_channels=cfg.num_head_channels,
        num_heads_upsample=cfg.num_head_upsample,
        use_scale_shift_norm=cfg.use_scale_shift_norm,
        resblock_updown=cfg.resblock_updown,
        use_new_attention_order=cfg.use_new_attention_order,
        dtype=dtype,
        use_flash=use_flash,
    )
