"""Convert HF diffusers AutoencoderKL checkpoints -> lfm_tpu flax params.

The reference loads ``stabilityai/sd-vae-ft-mse`` via diffusers
(reference train_flow_latent.py:75). This converter maps that state dict
(either the modern ``to_q/to_k/to_v/to_out.0`` attention naming or the 2022
``query/key/value/proj_attn`` naming) onto vae/autoencoder_kl.py's layout.

Layout rules: conv OIHW -> HWIO; 1x1 convs and attention projections become
Dense (I, O); GroupNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    if hasattr(t, "detach"):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def _conv(sd: Mapping, name: str) -> Dict:
    w = _np(sd[f"{name}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _np(sd[f"{name}.bias"])}


def _dense_from_1x1(sd: Mapping, name: str) -> Dict:
    w = _np(sd[f"{name}.weight"])
    if w.ndim == 4:
        w = w[:, :, 0, 0]
    return {"kernel": w.T, "bias": _np(sd[f"{name}.bias"])}


def _gn(sd: Mapping, name: str) -> Dict:
    return {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}


def _resnet(sd: Mapping, pfx: str) -> Dict:
    out = {
        "norm1": _gn(sd, f"{pfx}.norm1"),
        "conv1": _conv(sd, f"{pfx}.conv1"),
        "norm2": _gn(sd, f"{pfx}.norm2"),
        "conv2": _conv(sd, f"{pfx}.conv2"),
    }
    if f"{pfx}.conv_shortcut.weight" in sd:
        out["conv_shortcut"] = _conv(sd, f"{pfx}.conv_shortcut")
    return out


def _attn(sd: Mapping, pfx: str) -> Dict:
    if f"{pfx}.to_q.weight" in sd:
        names = {"to_q": "to_q", "to_k": "to_k", "to_v": "to_v", "to_out": "to_out.0"}
        gn = "group_norm"
    else:  # legacy AttentionBlock naming
        names = {"to_q": "query", "to_k": "key", "to_v": "value", "to_out": "proj_attn"}
        gn = "group_norm"
    return {
        "group_norm": _gn(sd, f"{pfx}.{gn}"),
        **{dst: _dense_from_1x1(sd, f"{pfx}.{src}") for dst, src in names.items()},
    }


def convert_vae_state_dict(sd: Mapping, num_blocks: int = 4) -> Dict:
    """Full state dict (flat torch names) -> nested flax params dict."""
    enc: Dict = {"conv_in": _conv(sd, "encoder.conv_in")}
    for i in range(num_blocks):
        for j in range(2):
            enc[f"down_{i}_res_{j}"] = _resnet(sd, f"encoder.down_blocks.{i}.resnets.{j}")
        if i < num_blocks - 1:
            enc[f"down_{i}_downsample"] = {
                "conv": _conv(sd, f"encoder.down_blocks.{i}.downsamplers.0.conv")
            }
    enc["mid_res_0"] = _resnet(sd, "encoder.mid_block.resnets.0")
    enc["mid_res_1"] = _resnet(sd, "encoder.mid_block.resnets.1")
    enc["mid_attn"] = _attn(sd, "encoder.mid_block.attentions.0")
    enc["conv_norm_out"] = _gn(sd, "encoder.conv_norm_out")
    enc["conv_out"] = _conv(sd, "encoder.conv_out")

    dec: Dict = {"conv_in": _conv(sd, "decoder.conv_in")}
    for i in range(num_blocks):
        for j in range(3):
            dec[f"up_{i}_res_{j}"] = _resnet(sd, f"decoder.up_blocks.{i}.resnets.{j}")
        if i < num_blocks - 1:
            dec[f"up_{i}_upsample"] = {
                "conv": _conv(sd, f"decoder.up_blocks.{i}.upsamplers.0.conv")
            }
    dec["mid_res_0"] = _resnet(sd, "decoder.mid_block.resnets.0")
    dec["mid_res_1"] = _resnet(sd, "decoder.mid_block.resnets.1")
    dec["mid_attn"] = _attn(sd, "decoder.mid_block.attentions.0")
    dec["conv_norm_out"] = _gn(sd, "decoder.conv_norm_out")
    dec["conv_out"] = _conv(sd, "decoder.conv_out")

    return {
        "params": {
            "encoder": enc,
            "decoder": dec,
            "quant_conv": _dense_from_1x1(sd, "quant_conv"),
            "post_quant_conv": _dense_from_1x1(sd, "post_quant_conv"),
        }
    }


def load_vae_params(path: str) -> Dict:
    """Load a diffusers VAE checkpoint (.safetensors or torch .bin/.pth)."""
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        sd = load_file(path)
    else:
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_vae_state_dict(sd)
