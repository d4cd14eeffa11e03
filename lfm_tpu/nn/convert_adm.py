"""Convert reference ADM UNet checkpoints -> lfm_tpu flax params.

The reference's origin-ADM checkpoints store the vendored guided-diffusion
``UNetModel.state_dict()`` (reference models/guided_diffusion/unet.py:376-655)
with sequential indices ``input_blocks.{i}.{j}`` / ``middle_block.{j}`` /
``output_blocks.{i}.{j}``. :func:`build_unet_plan` reproduces exactly that
topology, so the mapping here is positional.

Layout: conv OIHW -> HWIO; 1-d convs (attention qkv/proj, (O,I,1)) -> Dense
(I,O); GroupNorm weight/bias -> scale/bias.
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from lfm_tpu.nn.adm_unet import LayerSpec, UNetModel
from lfm_tpu.nn.convert_dit import strip_ddp_prefix


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _conv(sd: Mapping, name: str) -> Dict:
    w = _np(sd[f"{name}.weight"])
    return {"kernel": w.transpose(2, 3, 1, 0), "bias": _np(sd[f"{name}.bias"])}


def _dense_from_conv1d(sd: Mapping, name: str) -> Dict:
    w = _np(sd[f"{name}.weight"])  # (O, I, 1)
    return {"kernel": w[:, :, 0].T, "bias": _np(sd[f"{name}.bias"])}


def _dense(sd: Mapping, name: str) -> Dict:
    return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}


def _gn(sd: Mapping, name: str) -> Dict:
    return {"norm": {"scale": _np(sd[f"{name}.weight"]), "bias": _np(sd[f"{name}.bias"])}}


def _res(sd: Mapping, pfx: str) -> Dict:
    out = {
        "in_norm": _gn(sd, f"{pfx}.in_layers.0"),
        "in_conv": _conv(sd, f"{pfx}.in_layers.2"),
        "emb_proj": _dense(sd, f"{pfx}.emb_layers.1"),
        "out_norm": _gn(sd, f"{pfx}.out_layers.0"),
        "out_conv": _conv(sd, f"{pfx}.out_layers.3"),
    }
    if f"{pfx}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{pfx}.skip_connection")
    return out


def _attn(sd: Mapping, pfx: str) -> Dict:
    return {
        "norm": _gn(sd, f"{pfx}.norm"),
        "qkv": _dense_from_conv1d(sd, f"{pfx}.qkv"),
        "proj_out": _dense_from_conv1d(sd, f"{pfx}.proj_out"),
    }


def _layer(sd: Mapping, pfx: str, spec: LayerSpec) -> Dict:
    if spec.kind == "conv_in":
        return _conv(sd, pfx)
    if spec.kind in ("res", "res_down", "res_up"):
        return _res(sd, pfx)
    if spec.kind == "attn":
        return _attn(sd, pfx)
    if spec.kind == "down":
        return {"op": _conv(sd, f"{pfx}.op")}
    if spec.kind == "up":
        return {"conv": _conv(sd, f"{pfx}.conv")}
    raise ValueError(spec.kind)


def convert_adm_state_dict(sd: Mapping, model: UNetModel) -> Dict:
    sd = strip_ddp_prefix(sd)
    plan = model.plan
    params: Dict = {}

    for i, block in enumerate(plan.input_blocks):
        for j, spec in enumerate(block):
            params[f"input_{i}_{j}"] = _layer(sd, f"input_blocks.{i}.{j}", spec)
    for j, spec in enumerate(plan.middle_block):
        params[f"middle_{j}"] = _layer(sd, f"middle_block.{j}", spec)
    for i, block in enumerate(plan.output_blocks):
        for j, spec in enumerate(block):
            params[f"output_{i}_{j}"] = _layer(sd, f"output_blocks.{i}.{j}", spec)

    params["time_embed_1"] = _dense(sd, "time_embed.0")
    params["time_embed_2"] = _dense(sd, "time_embed.2")
    if "label_emb.weight" in sd:
        params["label_emb"] = _np(sd["label_emb.weight"])
    params["out_norm"] = _gn(sd, "out.0")
    params["out_conv"] = _conv(sd, "out.2")
    return {"params": params}


def load_adm_params(path: str, model: UNetModel) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_adm_state_dict(sd, model)
