"""Epoch loops for the downstream conditional tasks.

Rebuilds the reference's downstream trainers
(reference downstream_tasks/train_flow_latent_inpainting.py:69-226,
train_flow_latent_semantic_syn.py:84-260) on the shared conditional step
(train/conditional.py): same per-epoch demo panels (masked/seg + generated +
GT), two-tier checkpoints (the semantic task checkpoints the jointly-trained
SpatialRescaler under params['cond'], replacing the reference's separate
cond_stage_model_{E}.pth), and auto-resume.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from lfm_tpu.core import checkpoint as ckpt
from lfm_tpu.core.config import Config
from lfm_tpu.core.sharding import make_mesh, replicated, shard_batch
from lfm_tpu.data.loader import DataLoader
from lfm_tpu.nn.factory import create_network
from lfm_tpu.train.conditional import (
    inpainting_condition,
    make_cond_train_step,
    sample_conditional,
    semantic_condition,
)
from lfm_tpu.train.loop import save_image_grid
from lfm_tpu.train.state import TrainState, create_train_state, make_optimizer


def _collate_inpainting(dataset, batch_size, seed):
    """(img, mask, masked) triplets -> dict batches."""

    class _Wrap:
        num_classes = 1

        def __len__(self):
            return len(dataset)

        def __getitem__(self, i):
            img, mask, masked = dataset[i]
            return {"x": img, "mask": mask, "masked": masked}, 0

    loader = DataLoader(_Wrap(), batch_size, shuffle=True, drop_last=True,
                        seed=seed, with_labels=False)

    def batches():
        for b in loader:
            items = b["x"]
            yield {k: np.stack([it[k] for it in items]) for k in ("x", "mask", "masked")}

    return loader, batches


def train_inpainting(config: Config, dataset, vae, vae_params, *, mesh=None,
                     log_fn: Callable = print, max_steps: Optional[int] = None):
    """(train_flow_latent_inpainting.py:69-226). Model: 9 input channels."""
    tc = config.train
    mesh = mesh or make_mesh()
    model = create_network(config.model, dtype=jnp.bfloat16 if tc.precision == "bf16" else jnp.float32)

    s = config.model.latent_size
    # init + state build under jit (eager is ~1s/op through a TPU tunnel)
    params_m = jax.jit(model.init)(
        jax.random.PRNGKey(tc.seed), jnp.zeros((1,)),
        jnp.zeros((1, s, s, config.model.num_in_channels)))
    tx = make_optimizer(tc, steps_per_epoch=max(len(dataset) // tc.batch_size, 1))
    params = {"model": params_m, "cond": {}}
    state = jax.jit(lambda p: TrainState(
        step=jnp.zeros((), jnp.int32), params=p, opt_state=tx.init(p),
        ema_params=jax.tree_util.tree_map(jnp.copy, p)))(params)

    def model_apply(p, t, x):
        return model.apply(p, t, x)

    cond_fn = inpainting_condition(vae, vae_params, config.scale_factor)
    step = jax.jit(make_cond_train_step(model_apply, cond_fn, tx,
                                        ema_decay=tc.ema_decay, use_ema=tc.use_ema),
                   donate_argnums=(0,))

    return _run_cond_loop(config, state, step, dataset, _collate_inpainting,
                          model_apply, cond_fn, vae, vae_params, mesh, log_fn,
                          max_steps, task="inpaint")


def train_semantic(config: Config, dataset, vae, vae_params, rescaler, *,
                   num_classes: int, mesh=None, log_fn: Callable = print,
                   max_steps: Optional[int] = None):
    """(train_flow_latent_semantic_syn.py:84-260). Model: 8 input channels;
    rescaler trained jointly via params['cond']."""
    tc = config.train
    mesh = mesh or make_mesh()
    model = create_network(config.model, dtype=jnp.bfloat16 if tc.precision == "bf16" else jnp.float32)

    s = config.model.latent_size
    # init + state build under jit (eager is ~1s/op through a TPU tunnel)
    params_m = jax.jit(model.init)(
        jax.random.PRNGKey(tc.seed), jnp.zeros((1,)),
        jnp.zeros((1, s, s, config.model.num_in_channels)))
    rparams = jax.jit(rescaler.init)(
        jax.random.PRNGKey(tc.seed + 1),
        jnp.zeros((1, config.model.image_size, config.model.image_size, num_classes)),
    )["params"]
    tx = make_optimizer(tc, steps_per_epoch=max(len(dataset) // tc.batch_size, 1))
    params = {"model": params_m, "cond": rparams}
    state = jax.jit(lambda p: TrainState(
        step=jnp.zeros((), jnp.int32), params=p, opt_state=tx.init(p),
        ema_params=jax.tree_util.tree_map(jnp.copy, p)))(params)

    def model_apply(p, t, x):
        return model.apply(p, t, x)

    cond_fn = semantic_condition(vae, vae_params, rescaler, config.scale_factor,
                                 num_classes)
    step = jax.jit(make_cond_train_step(model_apply, cond_fn, tx,
                                        ema_decay=tc.ema_decay, use_ema=tc.use_ema),
                   donate_argnums=(0,))

    def collate(ds, bs, seed):
        class _Wrap:
            num_classes = 1

            def __len__(self):
                return len(ds)

            def __getitem__(self, i):
                img, seg = ds[i]
                return {"x": img, "seg": seg}, 0

        loader = DataLoader(_Wrap(), bs, shuffle=True, drop_last=True, seed=seed,
                            with_labels=False)

        def batches():
            for b in loader:
                items = b["x"]
                yield {
                    "x": np.stack([it["x"] for it in items]),
                    "seg": np.stack([it["seg"] for it in items]).astype(np.int32),
                }

        return loader, batches

    return _run_cond_loop(config, state, step, dataset, collate, model_apply,
                          cond_fn, vae, vae_params, mesh, log_fn, max_steps,
                          task="mask2image")


def _run_cond_loop(config, state, step, dataset, collate, model_apply, cond_fn,
                   vae, vae_params, mesh, log_fn, max_steps, task):
    tc = config.train
    repl = replicated(mesh)
    state = jax.device_put(state, repl)
    exp_path = os.path.join(config.output_dir + f"_{task}", config.dataset, config.exp)
    os.makedirs(exp_path, exist_ok=True)
    with open(os.path.join(exp_path, "config.json"), "w") as f:
        f.write(config.to_json())

    init_epoch = 0
    if (tc.resume or ckpt.has_content(exp_path)) and ckpt.has_content(exp_path):
        state, init_epoch = ckpt.restore_content(exp_path, state)
        state = jax.device_put(state, repl)
        log_fn(f"=> resume checkpoint (epoch {init_epoch})")

    loader, batches = collate(dataset, tc.batch_size, tc.seed)
    key = jax.device_put(jax.random.PRNGKey(tc.seed + 2), repl)
    global_step = int(state.step)

    for epoch in range(init_epoch, tc.num_epoch + 1):
        loader.set_epoch(epoch)
        for it, batch in enumerate(batches()):
            batch = shard_batch(mesh, batch)
            state, m = step(state, batch, key)
            global_step += 1
            if it % 100 == 0:
                log_fn(f"epoch {epoch} iteration{it}, Loss: {float(m.loss)}")
            if max_steps is not None and global_step >= max_steps:
                return state

        if epoch % tc.plot_every == 0:
            _demo_panel(config, state, model_apply, cond_fn, vae, vae_params,
                        dataset, exp_path, epoch, task)
        if tc.save_content and epoch % tc.save_content_every == 0:
            ckpt.save_content(exp_path, state, epoch + 1, config)
        if epoch % tc.save_ckpt_every == 0:
            ckpt.save_model(exp_path,
                            state.ema_params if tc.use_ema else state.params, epoch)
    return state


def _demo_panel(config, state, model_apply, cond_fn, vae, vae_params, dataset,
                exp_path, epoch, task):
    """Demo panels: center-box mask for inpainting (train:176-201), seg +
    generated + GT for semantic (train_semantic:202-224)."""
    n = 4
    items = [dataset[i] for i in range(min(n, len(dataset)))]
    params = state.ema_params if config.train.use_ema else state.params
    key = jax.random.PRNGKey(epoch)
    if task == "inpaint":
        img = np.stack([it[0] for it in items])
        h = img.shape[1]
        mask = np.zeros((len(items), h, h, 1), np.float32)
        mask[:, h // 4: 3 * h // 4, h // 4: 3 * h // 4] = 1.0
        batch = {"x": jnp.asarray(img), "mask": jnp.asarray(mask),
                 "masked": jnp.asarray(img * (1 - mask))}
        save_image_grid(img * (1 - mask),
                        os.path.join(exp_path, f"image_epoch_masked_{epoch}.png"))
    else:
        img = np.stack([it[0] for it in items])
        seg = np.stack([it[1] for it in items])
        batch = {"x": jnp.asarray(img), "seg": jnp.asarray(seg)}
        save_image_grid(img, os.path.join(exp_path, f"image_epoch_{epoch}_gt.png"))
    _, c = cond_fn(state.params.get("cond") if isinstance(state.params, dict) else None,
                   batch, key)
    noise = jax.random.normal(key, c.shape[:3] + (4,))
    z0, _ = sample_conditional(model_apply, params["model"], c, noise,
                               method="euler", num_steps=50)
    fake = vae.apply(vae_params, z0 / config.scale_factor, method=type(vae).decode)
    save_image_grid(np.asarray(fake), os.path.join(exp_path, f"image_epoch_{epoch}.png"))
