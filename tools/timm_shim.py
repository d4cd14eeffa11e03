"""Functional torch shim for the three timm modules the reference DiT uses
(reference models/DiT.py:17: ``from timm.models.vision_transformer import
Attention, Mlp, PatchEmbed``).

timm is not installable in zero-egress environments, but its three modules
have small, stable semantics; this shim reproduces them with the SAME
parameter names/shapes as timm state dicts (qkv/proj, fc1/fc2, proj conv),
so the actual reference DiT code can be imported, loaded with released
checkpoints, and run forward for activation-parity checks
(tools/verify_released_checkpoint.py). Install with :func:`install` BEFORE
importing the reference model code.
"""

from __future__ import annotations

import sys
import types


def _build_modules():
    import torch
    import torch.nn as nn

    class Attention(nn.Module):
        """timm.models.vision_transformer.Attention (fused qkv, per-head
        scaled dot-product, output proj)."""

        def __init__(self, dim, num_heads=8, qkv_bias=False, attn_drop=0.0,
                     proj_drop=0.0, **kw):
            super().__init__()
            assert dim % num_heads == 0
            self.num_heads = num_heads
            self.head_dim = dim // num_heads
            self.scale = self.head_dim ** -0.5
            self.qkv = nn.Linear(dim, dim * 3, bias=qkv_bias)
            self.attn_drop = nn.Dropout(attn_drop)
            self.proj = nn.Linear(dim, dim)
            self.proj_drop = nn.Dropout(proj_drop)

        def forward(self, x):
            b, n, c = x.shape
            qkv = (self.qkv(x)
                   .reshape(b, n, 3, self.num_heads, self.head_dim)
                   .permute(2, 0, 3, 1, 4))
            q, k, v = qkv.unbind(0)
            attn = (q @ k.transpose(-2, -1)) * self.scale
            attn = attn.softmax(dim=-1)
            attn = self.attn_drop(attn)
            x = (attn @ v).transpose(1, 2).reshape(b, n, c)
            return self.proj_drop(self.proj(x))

    class Mlp(nn.Module):
        """timm.layers.Mlp: fc1 -> act -> drop -> fc2 -> drop."""

        def __init__(self, in_features, hidden_features=None, out_features=None,
                     act_layer=nn.GELU, bias=True, drop=0.0, **kw):
            super().__init__()
            out_features = out_features or in_features
            hidden_features = hidden_features or in_features
            self.fc1 = nn.Linear(in_features, hidden_features, bias=bias)
            self.act = act_layer()
            self.drop1 = nn.Dropout(drop)
            self.fc2 = nn.Linear(hidden_features, out_features, bias=bias)
            self.drop2 = nn.Dropout(drop)

        def forward(self, x):
            return self.drop2(self.fc2(self.drop1(self.act(self.fc1(x)))))

    class PatchEmbed(nn.Module):
        """timm.layers.PatchEmbed: conv k=s=patch, flatten to (B, N, C)."""

        def __init__(self, img_size=224, patch_size=16, in_chans=3,
                     embed_dim=768, bias=True, **kw):
            super().__init__()
            # timm stores these as 2-tuples (to_2tuple)
            self.img_size = (img_size, img_size)
            self.patch_size = (patch_size, patch_size)
            self.grid_size = (img_size // patch_size, img_size // patch_size)
            self.num_patches = self.grid_size[0] * self.grid_size[1]
            self.proj = nn.Conv2d(in_chans, embed_dim, kernel_size=patch_size,
                                  stride=patch_size, bias=bias)

        def forward(self, x):
            return self.proj(x).flatten(2).transpose(1, 2)

    return Attention, Mlp, PatchEmbed


def install() -> None:
    """Register fake ``timm`` modules in sys.modules (no-op if a real timm
    is importable)."""
    try:
        import timm  # noqa: F401

        return
    except ImportError:
        pass
    if "timm.models.vision_transformer" in sys.modules and hasattr(
            sys.modules["timm.models.vision_transformer"], "Attention"):
        att = sys.modules["timm.models.vision_transformer"].Attention
        if att is not object:  # a functional shim is already installed
            return

    Attention, Mlp, PatchEmbed = _build_modules()
    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    vt = types.ModuleType("timm.models.vision_transformer")
    vt.Attention, vt.Mlp, vt.PatchEmbed = Attention, Mlp, PatchEmbed
    timm.models = models
    models.vision_transformer = vt
    sys.modules.update({
        "timm": timm,
        "timm.models": models,
        "timm.models.vision_transformer": vt,
    })
