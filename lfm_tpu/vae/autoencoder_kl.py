"""First-stage AutoencoderKL (Stable-Diffusion VAE, f=8) in flax/NHWC.

TPU-native replacement for the frozen ``diffusers`` AutoencoderKL the
reference loads from ``stabilityai/sd-vae-ft-mse``
(reference train_flow_latent.py:49,75; test_flow_latent.py:131). The
architecture follows the SD VAE exactly — block_out_channels
(128, 256, 512, 512), 2 encoder / 3 decoder resnets per level, mid-block
attention, DiagonalGaussian latent with 4 channels — so converted HF
checkpoints are bit-for-bit the same function. All convs run NHWC (XLA:TPU's
native layout); ``convert.py`` transposes torch OIHW->HWIO.

Usage: ``latents = vae.apply(params, img, key, method=vae.encode_sample) * 0.18215``
and ``img = vae.apply(params, z / 0.18215, method=vae.decode)``.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

Dtype = Any


def _gn(name: str, eps: float = 1e-6):
    return nn.GroupNorm(num_groups=32, epsilon=eps, dtype=jnp.float32, name=name)


class ResnetBlock(nn.Module):
    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_ch = x.shape[-1]
        h = _gn("norm1")(x.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv1")(h)
        h = _gn("norm2")(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv2")(h)
        if in_ch != self.out_ch:
            x = nn.Conv(self.out_ch, (1, 1), dtype=self.dtype, name="conv_shortcut")(x)
        return x + h


class AttnBlock(nn.Module):
    """Single-head spatial self-attention over H*W positions (VAE mid-block)."""

    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        y = _gn("group_norm")(x.astype(jnp.float32)).astype(self.dtype)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y).reshape(n, h * w, c)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y).reshape(n, h * w, c)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y).reshape(n, h * w, c)
        attn = jnp.einsum("nqc,nkc->nqk", q, k, preferred_element_type=jnp.float32)
        attn = jax.nn.softmax(attn * (c ** -0.5), axis=-1).astype(self.dtype)
        o = jnp.einsum("nqk,nkc->nqc", attn, v).reshape(n, h, w, c)
        o = nn.Dense(c, dtype=self.dtype, name="to_out")(o)
        return x + o


class Downsample(nn.Module):
    """Stride-2 conv with the SD VAE's asymmetric (0,1,0,1) padding."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = jnp.pad(x, ((0, 0), (0, 1), (0, 1), (0, 0)))
        return nn.Conv(self.out_ch, (3, 3), strides=2, padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample(nn.Module):
    """Nearest 2x + conv."""

    out_ch: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        x = jax.image.resize(x, (n, 2 * h, 2 * w, c), method="nearest")
        return nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv")(x)


class Encoder(nn.Module):
    block_out: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    latent_ch: int = 4
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.block_out[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(x.astype(self.dtype))
        for i, ch in enumerate(self.block_out):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype, name=f"down_{i}_res_{j}")(h)
            if i < len(self.block_out) - 1:
                h = Downsample(ch, dtype=self.dtype, name=f"down_{i}_downsample")(h)
        ch = self.block_out[-1]
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(ch, dtype=self.dtype, name="mid_res_1")(h)
        h = _gn("conv_norm_out")(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(2 * self.latent_ch, (3, 3), padding=1, dtype=self.dtype,
                    name="conv_out")(h)
        return h  # moments (mean ++ logvar)


class Decoder(nn.Module):
    block_out: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 3
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        rev = tuple(reversed(self.block_out))  # (512, 512, 256, 128)
        h = nn.Conv(rev[0], (3, 3), padding=1, dtype=self.dtype,
                    name="conv_in")(z.astype(self.dtype))
        h = ResnetBlock(rev[0], dtype=self.dtype, name="mid_res_0")(h)
        h = AttnBlock(dtype=self.dtype, name="mid_attn")(h)
        h = ResnetBlock(rev[0], dtype=self.dtype, name="mid_res_1")(h)
        for i, ch in enumerate(rev):
            for j in range(self.layers_per_block):
                h = ResnetBlock(ch, dtype=self.dtype, name=f"up_{i}_res_{j}")(h)
            if i < len(rev) - 1:
                h = Upsample(ch, dtype=self.dtype, name=f"up_{i}_upsample")(h)
        h = _gn("conv_norm_out")(h.astype(jnp.float32)).astype(self.dtype)
        h = nn.silu(h)
        h = nn.Conv(self.out_ch, (3, 3), padding=1, dtype=self.dtype, name="conv_out")(h)
        return h


class AutoencoderKL(nn.Module):
    """Frozen first-stage model; f = 2^(len(block_out)-1) = 8."""

    block_out: Tuple[int, ...] = (128, 256, 512, 512)
    latent_ch: int = 4
    out_ch: int = 3
    dtype: Dtype = jnp.float32

    def setup(self):
        self.encoder = Encoder(self.block_out, 2, self.latent_ch, self.dtype)
        self.decoder = Decoder(self.block_out, 3, self.out_ch, self.dtype)
        self.quant_conv = nn.Dense(2 * self.latent_ch, name="quant_conv", dtype=self.dtype)
        self.post_quant_conv = nn.Dense(self.latent_ch, name="post_quant_conv", dtype=self.dtype)

    def encode_moments(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """x: (N,H,W,3) in [-1,1] -> (mean, logvar), each (N,H/8,W/8,4)."""
        m = self.quant_conv(self.encoder(x))
        mean, logvar = jnp.split(m, 2, axis=-1)
        logvar = jnp.clip(logvar, -30.0, 20.0)
        return mean.astype(jnp.float32), logvar.astype(jnp.float32)

    def encode_sample(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        """DiagonalGaussian sample (reference train_flow_latent.py:143)."""
        mean, logvar = self.encode_moments(x)
        std = jnp.exp(0.5 * logvar)
        return mean + std * jax.random.normal(key, mean.shape, mean.dtype)

    def encode_mode(self, x: jnp.ndarray) -> jnp.ndarray:
        return self.encode_moments(x)[0]

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        """z: (N,h,w,4) UNSCALED latents -> (N,8h,8w,3) in [-1,1]-ish."""
        return self.decoder(self.post_quant_conv(z)).astype(jnp.float32)

    def __call__(self, x: jnp.ndarray, key: jax.Array) -> jnp.ndarray:
        return self.decode(self.encode_sample(x, key))
