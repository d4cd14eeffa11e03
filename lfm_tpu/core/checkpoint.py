"""Two-tier checkpointing with Orbax.

Mirrors the reference's scheme (reference train_flow_latent.py:193-216):
  * ``content`` — full resume state every ``save_content_every`` epochs:
    epoch, global_step, config json, params, opt_state, EMA
    (== the reference's content.pth);
  * ``model_{epoch}`` — bare EMA weights every ``save_ckpt_every`` epochs
    (== the reference's swap-save-swap model_{E}.pth, EMA.py:71-91 — no swap
    needed here, EMA is its own pytree).

Also hosts the torch-interop loaders so reference checkpoints drop in.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

from lfm_tpu.core.config import Config
from lfm_tpu.train.state import TrainState


def _ocp():
    import orbax.checkpoint as ocp

    return ocp


def save_content(exp_path: str, state: TrainState, epoch: int, config: Config) -> None:
    ocp = _ocp()
    path = os.path.abspath(os.path.join(exp_path, "content"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(
            path,
            {
                "epoch": epoch,
                "step": np.asarray(state.step),
                "params": jax.tree_util.tree_map(np.asarray, state.params),
                "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
                "ema_params": jax.tree_util.tree_map(np.asarray, state.ema_params),
            },
            force=True,
        )
    if jax.process_index() == 0:  # orbax wrote the tree; this file is ours
        with open(os.path.join(exp_path, "config.json"), "w") as f:
            f.write(config.to_json())  # config provenance (train_flow_latent.py:100-101)


def restore_content(exp_path: str, state: TrainState) -> Tuple[TrainState, int]:
    """Resume from content/ if present (train_flow_latent.py:104-116)."""
    ocp = _ocp()
    path = os.path.abspath(os.path.join(exp_path, "content"))
    template = {
        "epoch": 0,
        "step": np.asarray(state.step),
        "params": jax.tree_util.tree_map(np.asarray, state.params),
        "opt_state": jax.tree_util.tree_map(np.asarray, state.opt_state),
        "ema_params": jax.tree_util.tree_map(np.asarray, state.ema_params),
    }
    with ocp.PyTreeCheckpointer() as ckptr:
        restored = ckptr.restore(path, item=template)
    new_state = TrainState(
        step=jax.numpy.asarray(restored["step"]),
        params=restored["params"],
        opt_state=restored["opt_state"],
        ema_params=restored["ema_params"],
    )
    return new_state, int(restored["epoch"])


def has_content(exp_path: str) -> bool:
    return os.path.isdir(os.path.join(exp_path, "content"))


def save_model(exp_path: str, ema_params: Any, epoch: int) -> None:
    ocp = _ocp()
    path = os.path.abspath(os.path.join(exp_path, f"model_{epoch}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.tree_util.tree_map(np.asarray, ema_params), force=True)


def load_model(exp_path: str, epoch: int, template: Any) -> Any:
    ocp = _ocp()
    path = os.path.abspath(os.path.join(exp_path, f"model_{epoch}"))
    with ocp.PyTreeCheckpointer() as ckptr:
        return ckptr.restore(path, item=jax.tree_util.tree_map(np.asarray, template))


# ---------------------------------------------------------------------------
# Torch-interop: load reference .pth checkpoints by model family
# ---------------------------------------------------------------------------

def load_reference_checkpoint(path: str, config: Config, model) -> Dict:
    """Dispatch the right converter for a reference model_{E}.pth
    (the DDP 'module.' prefix is handled by each converter)."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    mc = config.model
    if mc.is_dit:
        from lfm_tpu.nn.convert_dit import convert_dit_state_dict
        from lfm_tpu.nn.dit import DIT_CONFIGS

        depth = DIT_CONFIGS[mc.model_type][0]
        return convert_dit_state_dict(sd, depth=depth, scan_blocks=model.scan_blocks)
    if mc.use_origin_adm:
        from lfm_tpu.nn.convert_adm import convert_adm_state_dict

        return convert_adm_state_dict(sd, model)
    from lfm_tpu.nn.convert_edm import convert_edm_state_dict

    return convert_edm_state_dict(sd)
