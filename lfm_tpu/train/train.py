"""Data-parallel flow-matching train step (pjit over a device mesh).

TPU-native redesign of the reference hot loop (reference
train_flow_latent.py:135-170): one jitted step fuses VAE-encode (frozen),
the FM interpolant/loss, backward, AdamW, and the EMA update. Gradient
all-reduce is induced by shardings — the batch is sharded over the ``data``
axis, params are replicated, so XLA inserts the psum over ICI (replacing
accelerate/DDP's NCCL all-reduce, train_flow_latent.py:91,154).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lfm_tpu.core.config import Config
from lfm_tpu.core.sharding import DATA_AXIS
from lfm_tpu.ode.flow import interpolate
from lfm_tpu.train.state import TrainState, ema_update, make_optimizer


class StepMetrics(NamedTuple):
    loss: jnp.ndarray
    grad_norm: jnp.ndarray


def make_train_step(
    model_apply: Callable,  # (params, t, z_t, y, rngs) -> v
    tx,
    *,
    ema_decay: float = 0.9999,
    use_ema: bool = True,
    encode_fn: Optional[Callable] = None,  # (batch_x, key) -> latents (frozen VAE)
    scale_factor: float = 0.18215,
    is_latent_data: bool = False,
    label_dropout: bool = False,
    fused_update: Optional[Callable] = None,
):
    """Build the jittable train step.

    batch = {"x": images NHWC in [-1,1] (or pre-encoded latents), "y": labels or None}

    ``fused_update`` (from ``state.make_fused_adamw_ema``) replaces the
    generic ``tx.update`` + ``apply_updates`` + ``ema_update`` + grad-norm
    sequence with a single-HBM-pass kernel per tensor; state layout and math
    are identical, only the schedule of reads/writes changes.
    """

    def loss_fn(params, z0, y, key):
        kt, kn, kd = jax.random.split(key, 3)
        t = jax.random.uniform(kt, (z0.shape[0],), jnp.float32)
        z1 = jax.random.normal(kn, z0.shape, z0.dtype)
        z_t, u = interpolate(z0, z1, t)
        rngs = {"label_dropout": kd} if label_dropout else None
        v = model_apply(params, t, z_t, y, rngs=rngs)
        return jnp.mean(jnp.square(v.astype(jnp.float32) - u.astype(jnp.float32)))

    def train_step(state: TrainState, batch, key: jax.Array):
        x = batch["x"]
        y = batch.get("y", None)
        k_enc, k_loss = jax.random.split(jax.random.fold_in(key, state.step))
        if is_latent_data or encode_fn is None:
            z0 = x * scale_factor if is_latent_data else x
        else:
            z0 = encode_fn(x, k_enc) * scale_factor

        loss, grads = jax.value_and_grad(loss_fn)(state.params, z0, y, k_loss)
        if fused_update is not None:
            params, opt_state, ema, gnorm = fused_update(
                state.opt_state, state.params, grads, state.ema_params
            )
        else:
            updates, opt_state = tx.update(grads, state.opt_state, state.params)
            params = jax.tree_util.tree_map(
                lambda p, u: p + u, state.params, updates
            )
            ema = (
                ema_update(state.ema_params, params, ema_decay)
                if use_ema else params
            )
            gnorm = jnp.sqrt(
                sum(jnp.sum(jnp.square(g))
                    for g in jax.tree_util.tree_leaves(grads))
            )
        new_state = TrainState(
            step=state.step + 1, params=params, opt_state=opt_state, ema_params=ema
        )
        return new_state, StepMetrics(loss=loss, grad_norm=gnorm)

    return train_step


def shard_mapped_model_apply(model, mesh: Mesh, *, train: bool = True):
    """Model-eval wrapper for the train step: evaluate the network inside a
    ``jax.shard_map`` over the data axis, so per-shard computation has
    single-device semantics (the form a pallas_call — the flash-attention
    custom_vjp — needs under SPMD on multi-chip meshes). Params ride in as
    a replicated input; shard_map's transpose inserts the gradient psum
    over the data axis automatically, which the exactness test pins against
    the plain path (tests/test_train_sample.py).

    Only for label_dropout==0 models: per-shard RNG would change the
    dropout pattern vs the unsharded step (loop.py gates on this)."""
    spec = P(DATA_AXIS)

    def model_apply(p, t, z, y, rngs=None):
        def local(p_, t_, z_, y_):
            # per-shard body has single-device semantics: enable the Pallas
            # attention dispatch (fused_attention fwd+bwd) inside the shard
            from lfm_tpu.kernels.flash_attention import assume_local_devices
            with assume_local_devices():
                return model.apply(p_, t_, z_, y_, train=train)

        if y is None:
            fn = jax.shard_map(
                lambda p_, t_, z_: local(p_, t_, z_, None), mesh=mesh,
                in_specs=(P(), spec, spec), out_specs=spec, check_vma=False)
            return fn(p, t, z)
        fn = jax.shard_map(local, mesh=mesh,
                           in_specs=(P(), spec, spec, spec),
                           out_specs=spec, check_vma=False)
        return fn(p, t, z, y)

    return model_apply


def jit_train_step(train_step, mesh: Mesh, state_shardings=None):
    """jit with explicit shardings: state replicated (dp) and outputs pinned
    replicated; the batch sharding is TAKEN FROM THE ARGUMENTS
    (in_shardings=None for the batch), so callers place batches themselves
    with ``core.sharding.shard_batch`` — which is what induces the gradient
    psum over the data axis. Used by train/loop.py.

    ``state_shardings``: optional NamedSharding pytree (or prefix) for the
    TrainState, for layouts where the state is NOT replicated — e.g.
    pipeline parallelism shards every ``blocks`` leaf over the pipe axis
    (sample/pp.py::pp_state_shardings, 1/S per-device block memory)."""
    repl = NamedSharding(mesh, P())
    ss = state_shardings if state_shardings is not None else repl
    return jax.jit(
        train_step,
        in_shardings=(ss, None, repl),  # batch sharding comes from shard_batch
        out_shardings=(ss, repl),
        donate_argnums=(0,),
    )
