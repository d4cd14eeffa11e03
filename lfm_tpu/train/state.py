"""Train state: params + optimizer + EMA as explicit pytrees.

Replaces the reference's optimizer stack (reference train_flow_latent.py:84-89)
and the EMA-inside-optimizer trick (reference EMA.py:25-91): here EMA weights
are a plain pytree updated functionally after each step — no parameter
swapping needed; checkpoint saving just picks ``state.ema_params``
(equivalent to the reference's swap-save-swap at train_flow_latent.py:207-216).
"""

from __future__ import annotations

import math
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from lfm_tpu.core.config import TrainConfig


class TrainState(NamedTuple):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    ema_params: Any  # == params when EMA disabled


def cosine_epoch_schedule(cfg: TrainConfig, steps_per_epoch: int):
    """CosineAnnealingLR stepped per *epoch* (reference train_flow_latent.py:89,
    172-173): lr(e) = eta_min + (lr - eta_min) * (1 + cos(pi e / E)) / 2."""

    def schedule(step):
        if cfg.no_lr_decay:
            return cfg.lr
        epoch = jnp.minimum(step // max(steps_per_epoch, 1), cfg.num_epoch)
        frac = epoch.astype(jnp.float32) / cfg.num_epoch
        return cfg.lr_min + 0.5 * (cfg.lr - cfg.lr_min) * (1.0 + jnp.cos(jnp.pi * frac))

    return schedule


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW with the reference's betas/wd (train_flow_latent.py:84,320-321:
    lr per config, betas=(0.9, 0.999) — argparse beta1/beta2 defaults of
    0.5/0.9 are never forwarded to AdamW in the reference; weight_decay=0)."""
    return optax.adamw(
        learning_rate=cosine_epoch_schedule(cfg, steps_per_epoch),
        b1=0.9,
        b2=0.999,
        weight_decay=cfg.weight_decay,
    )


def create_train_state(params, cfg: TrainConfig, steps_per_epoch: int) -> TrainState:
    tx = make_optimizer(cfg, steps_per_epoch)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        opt_state=tx.init(params),
        # distinct buffers so buffer donation never sees the same array twice
        ema_params=jax.tree_util.tree_map(lambda x: jnp.array(x, copy=True), params),
    )


def ema_update(ema, params, decay: float):
    """ema <- decay*ema + (1-decay)*params (reference EMA.py:55-60)."""
    return jax.tree_util.tree_map(
        lambda e, p: decay * e + (1.0 - decay) * p, ema, params
    )
