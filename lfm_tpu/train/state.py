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


def _decays(path) -> bool:
    """Weight-decay mask predicate over a param key path. The frozen random
    Fourier features (``GaussianFourierProjection.W``, nn/variants.py) are
    stop_gradient'd — torch registers them requires_grad=False so its
    optimizer never touches them — but decoupled weight decay applies to
    params regardless of their gradient, so without a mask any wd>0 would
    decay the "frozen" features toward zero. ``W`` is the only param name
    that module (and no other) uses."""
    return not (path and getattr(path[-1], "key", None) == "W")


def decay_mask(params):
    """Pytree of bools: False where decoupled weight decay must be skipped."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: _decays(path), params)


def make_optimizer(cfg: TrainConfig, steps_per_epoch: int) -> optax.GradientTransformation:
    """AdamW with the reference's betas/wd (train_flow_latent.py:84,320-321:
    lr per config, betas=(0.9, 0.999) — argparse beta1/beta2 defaults of
    0.5/0.9 are never forwarded to AdamW in the reference; weight_decay=0).
    Frozen Fourier features are masked out of the decay term (``decay_mask``)."""
    return optax.adamw(
        learning_rate=cosine_epoch_schedule(cfg, steps_per_epoch),
        b1=0.9,
        b2=0.999,
        weight_decay=cfg.weight_decay,
        mask=decay_mask if cfg.weight_decay else None,
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


def _is_count_only(node) -> bool:
    return hasattr(node, "_fields") and set(node._fields) == {"count"}


def fused_supported(opt_state) -> bool:
    """True iff ``opt_state`` has the EXACT chain structure ``make_optimizer``
    produces: ``(ScaleByAdamState, EmptyState | MaskedState(EmptyState),
    ScaleByScheduleState)`` — scale_by_adam -> add_decayed_weights (possibly
    decay-masked) -> scale_by_learning_rate(schedule). Deliberately strict:
    ``make_fused_adamw_ema`` hardcodes adamw semantics, so any future
    transform added to the chain (e.g. clip_by_global_norm, whose state is an
    EmptyState a looser gate would wave through) must fail the gate loudly
    rather than be silently dropped from the fused update."""
    if not (isinstance(opt_state, tuple) and len(opt_state) == 3):
        return False
    adam, wd_node, sched = opt_state
    wd_ok = isinstance(wd_node, optax.EmptyState) or (
        isinstance(wd_node, optax.MaskedState)
        and isinstance(wd_node.inner_state, optax.EmptyState))
    return (isinstance(adam, optax.ScaleByAdamState) and wd_ok
            and isinstance(sched, optax.ScaleByScheduleState))


def make_fused_adamw_ema(cfg: TrainConfig, steps_per_epoch: int, *,
                         ema_decay: float = 0.9999, use_ema: bool = True,
                         b1: float = 0.9, b2: float = 0.999, eps: float = 1e-8):
    """One-HBM-pass AdamW + EMA + grad-norm update.

    Math-identical to ``make_optimizer``'s optax chain (scale_by_adam ->
    add_decayed_weights -> scale_by_schedule) followed by ``apply_updates``
    and ``ema_update``, but written as a single ``tree_map`` so XLA emits one
    fused elementwise kernel per parameter tensor: reads g/p/m/v/ema, writes
    p/m/v/ema, never materialising the update tensor or re-reading grads for
    the norm. Measured on v5e (DiT-L/2, 458M params): optimizer portion of
    the train step ~38 ms -> ~22 ms. State layout is bit-compatible with
    ``make_optimizer`` (same optax state tuple), so checkpoints, resume, and
    ``convert_optimizer`` are unaffected.

    Returns ``update(opt_state, params, grads, ema_params) ->
    (new_params, new_opt_state, new_ema, grad_norm)``.
    """
    schedule = cosine_epoch_schedule(cfg, steps_per_epoch)
    wd = cfg.weight_decay

    def update(opt_state, params, grads, ema_params):
        adam = next(n for n in opt_state if isinstance(n, optax.ScaleByAdamState))
        sched = next((n for n in opt_state
                      if isinstance(n, optax.ScaleByScheduleState)), None)
        count_inc = optax.safe_increment(adam.count)
        lr_count = sched.count if sched is not None else adam.count
        lr = jnp.asarray(schedule(lr_count), jnp.float32)
        # bias corrections as scalars, identical to optax.tree.bias_correction
        c1 = 1.0 - b1 ** count_inc
        c2 = 1.0 - b2 ** count_inc

        def leaf(p, g, m, v, e, decays_leaf):
            g = g.astype(m.dtype)
            m2 = b1 * m + (1.0 - b1) * g
            v2 = b2 * v + (1.0 - b2) * jnp.square(g)
            u = (m2 / c1) / (jnp.sqrt(v2 / c2) + eps)
            if wd and decays_leaf:
                u = u + wd * p
            p2 = p - lr.astype(p.dtype) * u
            e2 = ema_decay * e + (1.0 - ema_decay) * p2 if use_ema else p2
            return p2, m2, v2, e2, jnp.sum(jnp.square(g.astype(jnp.float32)))

        # same decay mask as make_optimizer (frozen Fourier W excluded)
        mask = decay_mask(params)
        zipped = jax.tree_util.tree_map(leaf, params, grads, adam.mu, adam.nu,
                                        ema_params, mask)
        is_l = lambda t: isinstance(t, tuple)
        pick = lambda i: jax.tree_util.tree_map(lambda t: t[i], zipped,
                                                is_leaf=is_l)
        new_params, m2, v2, ema2 = pick(0), pick(1), pick(2), pick(3)
        gnorm = jnp.sqrt(sum(jax.tree_util.tree_leaves(pick(4))))

        def walk(node):
            if isinstance(node, optax.ScaleByAdamState):
                return optax.ScaleByAdamState(count=count_inc, mu=m2, nu=v2)
            if _is_count_only(node):
                return type(node)(count=optax.safe_increment(node.count))
            if hasattr(node, "_fields"):
                return node
            if isinstance(node, tuple):
                return tuple(walk(n) for n in node)
            return node

        return new_params, walk(opt_state), ema2, gnorm

    return update
