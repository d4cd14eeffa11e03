"""DiT velocity network (adaLN-Zero diffusion transformer), TPU-native.

Re-design of the reference DiT (reference models/DiT.py:112-415) for XLA:
  * NHWC latents; patchify is a reshape+matmul (MXU), not a conv lowering;
  * the N identical blocks run under ``nn.scan`` — one traced block instead
    of N, cutting compile time and enabling per-block ``nn.remat``
    (replaces torch.utils.checkpoint, models/DiT.py:265-269);
  * softmax in fp32, everything else under a bf16 policy;
  * ``forward_with_cfg`` keeps the reference's half-batch duplication
    semantics (models/DiT.py:274-290) for API parity — the sampler normally
    uses the leaner ode/cfg.py wrapper instead.

Configs DiT-{S,B,L,XL}/{2,4,8} mirror models/DiT.py:354-415.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from lfm_tpu.nn.layers import (
    Attention,
    LabelEmbedder,
    Mlp,
    PatchEmbed,
    TimestepEmbedder,
    get_2d_sincos_pos_embed,
    modulate,
)

Dtype = Any

# remat_policy values -> jax.checkpoint_policies. None (default) recomputes
# the whole block in backward (min memory, max recompute — matches
# torch.utils.checkpoint, models/DiT.py:265-269); "dots" saves every Dense
# output and recomputes only elementwise ops + the Pallas attention kernel
# (whose own residuals are the saved qkv) — ~1 fewer forward worth of
# recompute per step for ~150 MB/block of bf16 activations at bs32.
REMAT_POLICIES = {
    None: None,
    "dots": jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
    "all_dots": jax.checkpoint_policies.dots_saveable,
    # "dots" + the named attention output (layers.py Attention): without it
    # the Pallas attention fwd re-runs inside backward (it is a pallas_call,
    # not a saveable dot). Costs 16.8 MB/block bf16 at the bs32 north-star
    # shape; measured the fastest training policy on v5e (round 3).
    "dots_attn": jax.checkpoint_policies.save_from_both_policies(
        jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
        jax.checkpoint_policies.save_only_these_names("attn_out"),
    ),
}


def _remat(cls, policy_name):
    return nn.remat(cls, prevent_cse=False, policy=REMAT_POLICIES[policy_name])


# depth, hidden_size, patch_size, num_heads (models/DiT.py:354-415)
DIT_CONFIGS = {
    "DiT-XL/2": (28, 1152, 2, 16),
    "DiT-XL/4": (28, 1152, 4, 16),
    "DiT-XL/8": (28, 1152, 8, 16),
    "DiT-L/2": (24, 1024, 2, 16),
    "DiT-L/4": (24, 1024, 4, 16),
    "DiT-L/8": (24, 1024, 8, 16),
    "DiT-B/2": (12, 768, 2, 12),
    "DiT-B/4": (12, 768, 4, 12),
    "DiT-B/8": (12, 768, 8, 12),
    "DiT-S/2": (12, 384, 2, 6),
    "DiT-S/4": (12, 384, 4, 6),
    "DiT-S/8": (12, 384, 8, 6),
    # lfm-tpu extension (not in the reference table): test-scale config so
    # end-to-end loop/sharding tests stay cheap on a virtual CPU mesh.
    "DiT-T/2": (2, 64, 2, 4),
    # depth-4 variant: the smallest depth that exercises pipeline stages x
    # interleaved virtual chunks (pp=2 x pp_chunks=2) in loop-level tests
    "DiT-T4/2": (4, 64, 2, 4),
}

_zeros = nn.initializers.zeros


class DiTBlock(nn.Module):
    """adaLN-Zero block (models/DiT.py:112-131): 6-way modulation
    (shift/scale/gate for attention and MLP), zero-init so each block starts
    as identity."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            6 * self.hidden_size, dtype=self.dtype, name="adaLN_modulation",
            kernel_init=_zeros, bias_init=_zeros,
        )(nn.silu(c))
        s_msa, sc_msa, g_msa, s_mlp, sc_mlp, g_mlp = jnp.split(mod, 6, axis=-1)

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype, name="norm1")(x)
        h = modulate(h, s_msa, sc_msa)
        h = Attention(self.hidden_size, self.num_heads, dtype=self.dtype,
                      use_flash=self.use_flash, sp_axis=self.sp_axis,
                      name="attn")(h)
        x = x + g_msa[:, None, :] * h

        h = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype, name="norm2")(x)
        h = modulate(h, s_mlp, sc_mlp)
        h = Mlp(int(self.hidden_size * self.mlp_ratio), self.hidden_size,
                dtype=self.dtype, name="mlp")(h)
        x = x + g_mlp[:, None, :] * h
        return x


class _ScanBlock(nn.Module):
    """nn.scan adapter: carry = tokens, broadcast = conditioning."""

    hidden_size: int
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    remat: bool = False
    remat_policy: Optional[str] = None
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray):
        cls = _remat(DiTBlock, self.remat_policy) if self.remat else DiTBlock
        x = cls(self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, use_flash=self.use_flash,
                sp_axis=self.sp_axis, name="block")(x, c)
        return x, None


class FinalLayer(nn.Module):
    """2-way modulation + zero-init linear head (models/DiT.py:134-149)."""

    hidden_size: int
    patch_size: int
    out_channels: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, c: jnp.ndarray) -> jnp.ndarray:
        mod = nn.Dense(
            2 * self.hidden_size, dtype=self.dtype, name="adaLN_modulation",
            kernel_init=_zeros, bias_init=_zeros,
        )(nn.silu(c))
        shift, scale = jnp.split(mod, 2, axis=-1)
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-6,
                         dtype=self.dtype, name="norm_final")(x)
        x = modulate(x, shift, scale)
        x = nn.Dense(
            self.patch_size * self.patch_size * self.out_channels,
            dtype=self.dtype, name="linear", kernel_init=_zeros, bias_init=_zeros,
        )(x)
        return x


class DiT(nn.Module):
    """Velocity network v(t, x, y). Input x: (N, H, W, C) latents (NHWC)."""

    img_resolution: int = 32
    patch_size: int = 2
    in_channels: int = 4
    hidden_size: int = 1152
    depth: int = 28
    num_heads: int = 16
    mlp_ratio: float = 4.0
    label_dropout: float = 0.0
    num_classes: int = 1
    learn_sigma: bool = False
    dtype: Dtype = jnp.float32
    use_flash: bool = False
    scan_blocks: bool = True
    # lax.scan unroll factor for the block scan: >1 lets XLA overlap one
    # block's weight DMA with the previous block's compute at the cost of a
    # proportionally larger program (param layout is unchanged).
    scan_unroll: int = 1
    remat: bool = False
    remat_policy: Optional[str] = None
    # Sequence parallelism: set to a mesh axis name and apply the module
    # INSIDE shard_map with x = a contiguous row-shard of the latent
    # (P(..., sp_axis, None, None) on H). Attention runs as a ppermute ring
    # (core/ring.py); everything else is token-local. The parameter tree is
    # IDENTICAL to the unsharded module — converted reference checkpoints
    # load unchanged.
    sp_axis: Optional[str] = None

    @property
    def out_channels(self) -> int:
        return self.in_channels * 2 if self.learn_sigma else self.in_channels

    @property
    def null_label(self) -> int:
        # y=None falls back to the last table row (models/DiT.py:259-260)
        return self.num_classes + int(self.label_dropout > 0) - 1

    @nn.compact
    def __call__(
        self,
        t: jnp.ndarray,
        x: jnp.ndarray,
        y: Optional[jnp.ndarray] = None,
        train: bool = False,
    ) -> jnp.ndarray:
        n, hh, ww, cc = x.shape
        if self.sp_axis is None:
            assert hh == self.img_resolution and cc == self.in_channels, (
                f"expected NHWC ({self.img_resolution}, {self.in_channels}), got {x.shape}"
            )
        else:
            sp = jax.lax.psum(1, self.sp_axis)  # static: the axis size
            assert hh * sp == self.img_resolution and ww == self.img_resolution, (
                f"sp={sp}: expected row-shard H={self.img_resolution}//{sp}, "
                f"got {x.shape}"
            )
            assert hh % self.patch_size == 0, (
                f"row-shard height {hh} must align to patch_size {self.patch_size}"
            )
        t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
        if y is None:
            y = jnp.full((n,), self.null_label, jnp.int32)

        g = self.img_resolution // self.patch_size
        pos = get_2d_sincos_pos_embed(self.hidden_size, g)
        if self.sp_axis is not None:
            # this shard's contiguous rows of the patch grid
            g_loc = hh // self.patch_size
            idx = jax.lax.axis_index(self.sp_axis)
            pos = jax.lax.dynamic_slice_in_dim(
                pos.reshape(g, g, self.hidden_size), idx * g_loc, g_loc, axis=0
            ).reshape(g_loc * g, self.hidden_size)
        x = PatchEmbed(self.patch_size, self.hidden_size, dtype=self.dtype,
                       name="x_embedder")(x.astype(self.dtype))
        x = x + pos[None].astype(self.dtype)

        t_emb = TimestepEmbedder(self.hidden_size, dtype=self.dtype, name="t_embedder")(t)
        y_emb = LabelEmbedder(self.num_classes, self.hidden_size, self.label_dropout,
                              dtype=self.dtype, name="y_embedder")(y, train)
        c = t_emb + y_emb

        if self.scan_blocks:
            ScannedBlocks = nn.scan(
                _ScanBlock,
                variable_axes={"params": 0},
                split_rngs={"params": True},
                in_axes=nn.broadcast,
                length=self.depth,
                unroll=self.scan_unroll,
                metadata_params={nn.meta.PARTITION_NAME: None},
            )
            x, _ = ScannedBlocks(
                self.hidden_size, self.num_heads, self.mlp_ratio,
                dtype=self.dtype, use_flash=self.use_flash, remat=self.remat,
                remat_policy=self.remat_policy, sp_axis=self.sp_axis,
                name="blocks",
            )(x, c)
        else:
            block_cls = (_remat(DiTBlock, self.remat_policy) if self.remat
                         else DiTBlock)
            for i in range(self.depth):
                x = block_cls(self.hidden_size, self.num_heads, self.mlp_ratio,
                              dtype=self.dtype, use_flash=self.use_flash,
                              sp_axis=self.sp_axis, name=f"blocks_{i}")(x, c)

        x = FinalLayer(self.hidden_size, self.patch_size, self.out_channels,
                       dtype=self.dtype, name="final_layer")(x, c)
        return self._unpatchify(x).astype(jnp.float32)

    def _unpatchify(self, x: jnp.ndarray) -> jnp.ndarray:
        """(N, T, p*p*C) -> (N, H, W, C); inverse of PatchEmbed's layout.
        Under sp_axis, T is a row-shard of the patch grid and the output is
        the matching row-shard of the image."""
        n, tt, _ = x.shape
        p = self.patch_size
        g = self.img_resolution // p  # full grid width
        g_rows = tt // g  # local grid height (== g when unsharded)
        c = self.out_channels
        x = x.reshape(n, g_rows, g, p, p, c)
        x = x.transpose(0, 1, 3, 2, 4, 5)
        return x.reshape(n, g_rows * p, g * p, c)

    def forward_with_cfg(self, params, t, x, y, cfg_scale: float,
                         guide_channels: Optional[int] = None) -> jnp.ndarray:
        """Reference-parity CFG on a pre-doubled batch (models/DiT.py:274-290):
        x has 2N rows (both halves identical), y = [y_cond, y_null]."""
        n = x.shape[0] // 2
        half = x[:n]
        combined = jnp.concatenate([half, half], axis=0)
        out = self.apply(params, t, combined, y)
        gc = self.in_channels if guide_channels is None else guide_channels
        eps, rest = out[..., :gc], out[..., gc:]
        cond, uncond = eps[:n], eps[n:]
        guided = uncond + cfg_scale * (cond - uncond)
        eps = jnp.concatenate([guided, guided], axis=0)
        return jnp.concatenate([eps, rest], axis=-1)


def create_dit(model_type: str, *, img_resolution: int, in_channels: int = 4,
               label_dropout: float = 0.0, num_classes: Optional[int] = None,
               dtype: Dtype = jnp.float32, use_flash: bool = False,
               remat: bool = False, remat_policy: Optional[str] = None,
               scan_blocks: bool = True, scan_unroll: int = 1,
               sp_axis: Optional[str] = None) -> DiT:
    """Factory matching the reference dispatch (models/__init__.py:12-17)."""
    depth, hidden, patch, heads = DIT_CONFIGS[model_type]
    return DiT(
        sp_axis=sp_axis,
        img_resolution=img_resolution,
        patch_size=patch,
        in_channels=in_channels,
        hidden_size=hidden,
        depth=depth,
        num_heads=heads,
        label_dropout=label_dropout,
        num_classes=num_classes if num_classes is not None else 1,
        dtype=dtype,
        use_flash=use_flash,
        remat=remat,
        remat_policy=remat_policy,
        scan_blocks=scan_blocks,
        scan_unroll=scan_unroll,
    )
