"""Full resume from a reference ``content.pth``: optimizer + EMA conversion.

The reference's resume checkpoint (reference train_flow_latent.py:193-205)
stores epoch/global_step, the model state dict, the (EMA-wrapped) AdamW
``optimizer.state_dict()`` and the scheduler. This module converts all of it
into a lfm-tpu TrainState so a training run started with the reference can
continue on TPU.

Key fact exploited: Adam's ``exp_avg``/``exp_avg_sq`` and the EMA weights
(reference EMA.py:38-41 stores ``state['ema']`` per param inside the
optimizer state) have exactly the parameters' shapes, so the per-family
WEIGHT converters convert them too — we reassemble name->tensor state dicts
for each moment and run the ordinary converter on each.

torch optimizer state is keyed by param INDEX in ``parameters()`` order;
that order equals the model ``state_dict()`` key order with registered
buffers removed (EDM ``resample_filter``/``map_noise.freqs``; everything in
DiT/ADM state dicts is a Parameter, including DiT's frozen pos_embed).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

# Registered buffers appear in state_dict but not in parameters() order.
# (DiT's frozen pos_embed IS a Parameter: it keeps its optimizer index; the
# weight converters simply drop it on the flax side.)
_BUFFER_MARKERS = ("resample_filter", "map_noise.freqs")


def ordered_param_names(model_sd: Mapping) -> List[str]:
    """torch ``model.parameters()`` order: state-dict order minus buffers."""
    return [k for k in model_sd
            if not any(k.endswith(m) or m in k for m in _BUFFER_MARKERS)]


def _index_to_name(model_sd: Mapping) -> Dict[int, str]:
    return dict(enumerate(ordered_param_names(model_sd)))


def _state_dicts_from_optimizer(
    opt_sd: Mapping, model_sd: Mapping
) -> Tuple[Dict, Dict, Optional[Dict], int]:
    """Reassemble name-keyed exp_avg / exp_avg_sq / ema dicts (zeros where a
    param has no optimizer state yet) and the Adam step count."""
    idx2name = _index_to_name(model_sd)
    state = opt_sd.get("state", {})
    exp_avg: Dict[str, Any] = {}
    exp_avg_sq: Dict[str, Any] = {}
    ema: Dict[str, Any] = {}
    has_ema = any("ema" in s for s in state.values())
    step = 0

    def _np(t):
        # COPY: torch state_dict() returns references to the live tensors;
        # without a copy later optimizer steps would mutate converted moments
        a = t.detach().cpu().numpy() if hasattr(t, "detach") else np.asarray(t)
        return np.array(a, copy=True)

    for idx, name in idx2name.items():
        ref = _np(model_sd[name])
        s = state.get(idx, {})
        exp_avg[name] = _np(s["exp_avg"]) if "exp_avg" in s else np.zeros_like(ref)
        exp_avg_sq[name] = _np(s["exp_avg_sq"]) if "exp_avg_sq" in s else np.zeros_like(ref)
        if has_ema:
            ema[name] = _np(s["ema"]) if "ema" in s else ref.copy()
        if "step" in s:
            step = max(step, int(_np(s["step"]).item() if hasattr(s["step"], "item")
                                 or isinstance(s["step"], np.ndarray) else s["step"]))
    return exp_avg, exp_avg_sq, (ema if has_ema else None), step


def _strip_module(sd: Mapping) -> Dict:
    return {(k[7:] if k.startswith("module.") else k): v for k, v in sd.items()}


def _convert_family(sd: Mapping, config, model):
    """Dispatch the weight converter (same mapping used for moments)."""
    mc = config.model
    if mc.is_dit:
        from lfm_tpu.nn.convert_dit import convert_dit_state_dict
        from lfm_tpu.nn.dit import DIT_CONFIGS

        depth = DIT_CONFIGS[mc.model_type][0]
        return convert_dit_state_dict(sd, depth=depth,
                                      scan_blocks=getattr(model, "scan_blocks", True))
    if mc.use_origin_adm:
        from lfm_tpu.nn.convert_adm import convert_adm_state_dict

        return convert_adm_state_dict(sd, model)
    from lfm_tpu.nn.convert_edm import convert_edm_state_dict

    return convert_edm_state_dict(sd)


def _inject_adam_state(opt_state, mu, nu, count, schedule_count=None):
    """Replace the ScaleByAdamState inside an optax.adamw state tuple, and
    restore every counted schedule state (ScaleByScheduleState and any other
    count-only NamedTuple) to ``schedule_count`` so a resumed cosine LR decay
    continues from the checkpointed global step instead of restarting at the
    epoch-0 LR (the reference restores ``scheduler.state_dict()``,
    train_flow_latent.py:121-124)."""
    if schedule_count is None:
        schedule_count = count

    def walk(node):
        if isinstance(node, optax.ScaleByAdamState):
            return optax.ScaleByAdamState(
                count=jnp.asarray(count, jnp.int32), mu=mu, nu=nu
            )
        if isinstance(node, optax.ScaleByScheduleState):
            return optax.ScaleByScheduleState(
                count=jnp.asarray(schedule_count, jnp.int32)
            )
        if hasattr(node, "_fields"):
            # generic counted states (e.g. scale_by_learning_rate variants):
            # anything whose only field is `count`
            if set(node._fields) == {"count"}:
                return type(node)(count=jnp.asarray(schedule_count, jnp.int32))
            return node
        if isinstance(node, tuple):
            return tuple(walk(n) for n in node)
        return node

    return walk(opt_state)


def convert_reference_content(content: Mapping, config, model, tx) -> Tuple[Any, int, int]:
    """content.pth dict -> (TrainState, epoch, global_step).

    ``content`` needs keys model_dict / optimizer / epoch / global_step
    (train_flow_latent.py:196-203). The optimizer may be the EMA wrapper's
    state dict (EMA weights restored into state.ema_params; otherwise EMA is
    a copy of the live params).
    """
    from lfm_tpu.train.state import TrainState

    model_sd = _strip_module(content["model_dict"])
    params = _convert_family(model_sd, config, model)

    opt_sd = content["optimizer"]
    exp_avg_sd, exp_avg_sq_sd, ema_sd, step = _state_dicts_from_optimizer(
        opt_sd, model_sd
    )
    mu = _convert_family(exp_avg_sd, config, model)
    nu = _convert_family(exp_avg_sq_sd, config, model)

    # moments share the params' tree structure (converters return
    # {'params': ...} exactly like the weight conversion)
    global_step = int(content.get("global_step", step))
    opt_state = tx.init(params)
    opt_state = _inject_adam_state(opt_state, mu, nu, step,
                                   schedule_count=global_step)

    ema_params = _convert_family(ema_sd, config, model) if ema_sd else jax.tree_util.tree_map(
        lambda x: np.array(x, copy=True), params
    )
    epoch = int(content.get("epoch", 0))
    state = TrainState(
        step=jnp.asarray(global_step, jnp.int32),
        params=params,
        opt_state=opt_state,
        ema_params=ema_params,
    )
    return state, epoch, global_step


def load_reference_content(path: str, config, model, tx):
    import torch

    content = torch.load(path, map_location="cpu", weights_only=False)
    return convert_reference_content(content, config, model, tx)
