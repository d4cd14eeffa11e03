"""Convert reference DiT checkpoints (model_{E}.pth) -> lfm_tpu flax params.

The reference saves EMA-swapped ``state_dict()`` with DDP ``module.``
prefixes (reference train_flow_latent.py:207-216, stripped at load:
test_flow_latent.py:140-142). This maps those tensors onto nn/dit.py:
  * patch-embed conv (D, C, p, p) -> matmul kernel (p*p*C, D) matching
    PatchEmbed's (ph, pw, c) flattening;
  * per-block tensors are stacked along axis 0 for the nn.scan layout;
  * pos_embed is dropped (recomputed, it is a fixed buffer).
"""

from __future__ import annotations

from typing import Dict, Mapping

import numpy as np


def _np(t) -> np.ndarray:
    return t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)


def _dense(sd: Mapping, name: str) -> Dict:
    return {"kernel": _np(sd[f"{name}.weight"]).T, "bias": _np(sd[f"{name}.bias"])}


def strip_ddp_prefix(sd: Mapping) -> Dict:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def convert_dit_state_dict(sd: Mapping, depth: int, scan_blocks: bool = True) -> Dict:
    sd = strip_ddp_prefix(sd)

    w = _np(sd["x_embedder.proj.weight"])  # (D, C, p, p)
    d, c, p, _ = w.shape
    x_embedder = {
        "proj": {
            "kernel": w.transpose(2, 3, 1, 0).reshape(p * p * c, d),
            "bias": _np(sd["x_embedder.proj.bias"]),
        }
    }

    t_embedder = {
        "fc1": _dense(sd, "t_embedder.mlp.0"),
        "fc2": _dense(sd, "t_embedder.mlp.2"),
    }
    y_embedder = {"embedding": _np(sd["y_embedder.embedding_table.weight"])}

    def block(i: int) -> Dict:
        pfx = f"blocks.{i}"
        return {
            "adaLN_modulation": _dense(sd, f"{pfx}.adaLN_modulation.1"),
            "attn": {
                "qkv": _dense(sd, f"{pfx}.attn.qkv"),
                "proj": _dense(sd, f"{pfx}.attn.proj"),
            },
            "mlp": {
                "fc1": _dense(sd, f"{pfx}.mlp.fc1"),
                "fc2": _dense(sd, f"{pfx}.mlp.fc2"),
            },
        }

    params: Dict = {
        "x_embedder": x_embedder,
        "t_embedder": t_embedder,
        "y_embedder": y_embedder,
        "final_layer": {
            "adaLN_modulation": _dense(sd, "final_layer.adaLN_modulation.1"),
            "linear": _dense(sd, "final_layer.linear"),
        },
    }
    if scan_blocks:
        stacked = [block(i) for i in range(depth)]
        params["blocks"] = {
            "block": _stack_trees(stacked)
        }
    else:
        for i in range(depth):
            params[f"blocks_{i}"] = block(i)
    return {"params": params}


def _stack_trees(trees):
    import jax

    return jax.tree_util.tree_map(lambda *xs: np.stack(xs, axis=0), *trees)


def load_dit_params(path: str, depth: int, scan_blocks: bool = True) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return convert_dit_state_dict(sd, depth, scan_blocks)
