"""Dynamic loss scaling (fp16-style mixed-precision utility).

Equivalent of the reference's vendored ADM MixedPrecisionTrainer
(reference models/guided_diffusion/fp16_util.py:139-221: loss-scale growth
on success, backoff on overflow). On TPU the default bf16 policy makes this
unnecessary — it exists for capability parity and for fp16 experimentation:
wrap any optax transform with :func:`dynamic_loss_scale`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class LossScaleState(NamedTuple):
    scale: jnp.ndarray          # current loss scale (log2 in the reference)
    inner: Any                  # wrapped optimizer state
    growth_counter: jnp.ndarray


def dynamic_loss_scale(
    tx: optax.GradientTransformation,
    init_scale: float = 2.0 ** 20,   # fp16_util INITIAL_LOG_LOSS_SCALE=20
    growth_interval: int = 2000,
    growth_factor: float = 2.0,
    backoff_factor: float = 0.5,     # fp16_util backoff: lg_loss_scale -= 1
) -> optax.GradientTransformation:
    """Gradients are expected PRE-multiplied by ``state.scale`` (scale the
    loss before jax.grad). Non-finite grads skip the step and back off the
    scale; ``growth_interval`` clean steps double it."""

    def init(params):
        return LossScaleState(
            scale=jnp.asarray(init_scale, jnp.float32),
            inner=tx.init(params),
            growth_counter=jnp.zeros((), jnp.int32),
        )

    def update(grads, state, params=None):
        unscaled = jax.tree_util.tree_map(lambda g: g / state.scale, grads)
        finite = jnp.all(jnp.asarray([
            jnp.all(jnp.isfinite(g)) for g in jax.tree_util.tree_leaves(unscaled)
        ]))

        updates, new_inner = tx.update(unscaled, state.inner, params)
        # skip the step on overflow: zero updates, keep inner state
        updates = jax.tree_util.tree_map(
            lambda u: jnp.where(finite, u, jnp.zeros_like(u)), updates)
        new_inner = jax.tree_util.tree_map(
            lambda a, b: jnp.where(finite, a, b) if isinstance(a, jnp.ndarray)
            and a.shape == getattr(b, "shape", None) else a,
            new_inner, state.inner,
        )

        counter = jnp.where(finite, state.growth_counter + 1, 0)
        grow = counter >= growth_interval
        scale = jnp.where(
            finite,
            jnp.where(grow, state.scale * growth_factor, state.scale),
            state.scale * backoff_factor,
        )
        counter = jnp.where(grow, 0, counter)
        return updates, LossScaleState(scale=scale, inner=new_inner,
                                       growth_counter=counter)

    return optax.GradientTransformation(init, update)
