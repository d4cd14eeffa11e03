"""Conditional flow-matching: shared machinery for the downstream tasks.

The reference's two downstream trainers
(reference downstream_tasks/train_flow_latent_inpainting.py:141-160,
train_flow_latent_semantic_syn.py:174-196) share one pattern: a conditioning
map ``c`` at latent resolution is channel-concatenated with the interpolant
before the velocity net (9 input channels for inpainting: 4 latent + 4
masked-latent + 1 mask; 8 for semantic synthesis: 4 + 4 seg-code), and at
sampling time with the ODE state (the reference's ``WrapperCondFlow``,
train_flow_latent_inpainting.py:45-53). Here the wrapper is a closure over
``c`` inside the jitted velocity function.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from lfm_tpu.ode import odeint
from lfm_tpu.ode.flow import interpolate
from lfm_tpu.train.state import TrainState, ema_update
from lfm_tpu.train.train import StepMetrics


def make_cond_train_step(
    model_apply: Callable,          # (model_params, t, x_cat) -> v
    cond_fn: Callable,              # (cond_params, batch, key) -> (z_data, c)
    tx,
    *,
    ema_decay: float = 0.9999,
    use_ema: bool = True,
):
    """params pytree = {"model": ..., "cond": ...} ("cond" may be {} when the
    conditioner has no trained weights, e.g. inpainting)."""

    def loss_fn(params, batch, key):
        kc, kt, kn = jax.random.split(key, 3)
        z_data, c = cond_fn(params.get("cond"), batch, kc)
        t = jax.random.uniform(kt, (z_data.shape[0],), jnp.float32)
        noise = jax.random.normal(kn, z_data.shape, z_data.dtype)
        v_t, u = interpolate(z_data, noise, t)
        x_cat = jnp.concatenate([v_t, c], axis=-1)
        v = model_apply(params["model"], t, x_cat)
        return jnp.mean(jnp.square(v.astype(jnp.float32) - u.astype(jnp.float32)))

    def step(state: TrainState, batch, key: jax.Array):
        key = jax.random.fold_in(key, state.step)
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(lambda p, u_: p + u_, state.params, updates)
        ema = ema_update(state.ema_params, params, ema_decay) if use_ema else params
        gnorm = jnp.sqrt(sum(jnp.sum(jnp.square(g))
                             for g in jax.tree_util.tree_leaves(grads)))
        return (
            TrainState(step=state.step + 1, params=params, opt_state=opt_state,
                       ema_params=ema),
            StepMetrics(loss=loss, grad_norm=gnorm),
        )

    return step


def cond_velocity(model_apply: Callable, model_params, c: jnp.ndarray) -> Callable:
    """WrapperCondFlow equivalent: v(t, x) = model(t, [x ++ c])."""

    def v(t, x):
        t_b = jnp.broadcast_to(jnp.asarray(t, jnp.float32), (x.shape[0],))
        return model_apply(model_params, t_b, jnp.concatenate([x, c], axis=-1))

    return v


def sample_conditional(
    model_apply: Callable, model_params, c: jnp.ndarray, noise: jnp.ndarray,
    *, method: str = "dopri5", atol: float = 1e-8, rtol: float = 1e-8,
    num_steps: int = 40,
):
    """Conditional ODE sampling; the reference's downstream demo uses
    atol=rtol=1e-8 (train_flow_latent_inpainting.py:61-65)."""
    v = cond_velocity(model_apply, model_params, c)
    res = odeint(v, noise, 1.0, 0.0, method=method, atol=atol, rtol=rtol,
                 num_steps=num_steps)
    return res.y, res.nfe


def inpainting_condition(vae, vae_params, scale_factor: float):
    """cond_fn for inpainting (train_flow_latent_inpainting.py:148-152):
    c = VAE(masked) * scale ++ mask resized to latent res. batch keys:
    x (image), mask (H,W,1), masked (image*(1-mask))."""

    def fn(_cond_params, batch, key):
        k1, k2 = jax.random.split(key)
        z = vae.apply(vae_params, batch["x"], k1, method=type(vae).encode_sample)
        z = z * scale_factor
        cz = vae.apply(vae_params, batch["masked"], k2, method=type(vae).encode_sample)
        cz = cz * scale_factor
        n, h, w, _ = cz.shape
        mask_small = jax.image.resize(batch["mask"], (n, h, w, 1), method="nearest")
        return z, jnp.concatenate([cz, mask_small], axis=-1)

    return fn


def semantic_condition(vae, vae_params, rescaler, scale_factor: float,
                       num_classes: int):
    """cond_fn for semantic synthesis (train_flow_latent_semantic_syn.py:174-191):
    c = SpatialRescaler(one_hot(seg)); the rescaler's params live in
    params['cond'] and train jointly. batch keys: x (image), seg (H,W) int."""

    def fn(cond_params, batch, key):
        z = vae.apply(vae_params, batch["x"], key, method=type(vae).encode_sample)
        z = z * scale_factor
        onehot = jax.nn.one_hot(batch["seg"], num_classes, dtype=jnp.float32)
        c = rescaler.apply({"params": cond_params}, onehot)
        return z, c

    return fn
