"""Convert reference EDM checkpoints (SongUNet/DhariwalUNet) -> flax params.

The reference's EDM ModuleDict keys (``enc.{res}x{res}_block{i}``,
``dec.{res}x{res}_up`` ..., models/EDM.py:593-661,772-810) map 1:1 onto
edm_unet.py's module names (the first dot becomes an underscore). Tensor
layout rules, driven by weight rank:
  * rank-1 weight  -> GroupNorm: {scale, bias} under ``<path>/norm``
  * rank-2 weight  -> Linear -> Dense {kernel: W^T, bias}
  * rank-4 weight  -> attention qkv/proj 1x1 convs become Dense (I,O);
                      all other convs go under ``<path>/conv`` HWIO
  * ``map_noise.freqs`` (NCSN++ Fourier buffer) -> frozen parameter
  * ``resample_filter`` buffers are fixed and recomputed, skipped
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np

from lfm_tpu.nn.convert_dit import strip_ddp_prefix

_DENSE_1X1 = {"qkv", "proj", "q", "kv", "to_q", "to_k", "to_v"}


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _set(tree: Dict, path, value):
    node = tree
    for p in path[:-1]:
        node = node.setdefault(p, {})
    node[path[-1]] = value


def _module_path(key_prefix: str):
    """'enc.8x8_block0.norm0' -> ('enc_8x8_block0', 'norm0');
    'map_layer0' -> ('map_layer0',); 'out_norm' -> ('out_norm',)."""
    parts = key_prefix.split(".")
    if parts[0] in ("enc", "dec"):
        return (f"{parts[0]}_{parts[1]}", *parts[2:])
    return tuple(parts)


def convert_edm_state_dict(sd: Mapping) -> Dict:
    sd = strip_ddp_prefix(sd)
    params: Dict = {}

    for key, tensor in sd.items():
        if not key.endswith(".weight"):
            continue
        prefix = key[: -len(".weight")]
        w = _np(tensor)
        bias_key = prefix + ".bias"
        b = _np(sd[bias_key]) if bias_key in sd else None
        path = _module_path(prefix)

        if w.ndim == 1:  # GroupNorm
            _set(params, (*path, "norm", "scale"), w)
            if b is not None:
                _set(params, (*path, "norm", "bias"), b)
        elif w.ndim == 2:  # Linear
            _set(params, (*path, "kernel"), w.T)
            if b is not None:
                _set(params, (*path, "bias"), b)
        elif w.ndim == 4:
            if path[-1] in _DENSE_1X1:
                _set(params, (*path, "kernel"), w[:, :, 0, 0].T)
                if b is not None:
                    _set(params, (*path, "bias"), b)
            else:
                _set(params, (*path, "conv", "kernel"), w.transpose(2, 3, 1, 0))
                if b is not None:
                    _set(params, (*path, "conv", "bias"), b)
        else:
            raise ValueError(f"unhandled tensor {key} with shape {w.shape}")

    if "map_noise.freqs" in sd:  # NCSN++ Fourier buffer
        _set(params, ("map_noise", "freqs"), _np(sd["map_noise.freqs"]))

    return {"params": params}


def load_edm_params(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_edm_state_dict(sd)
