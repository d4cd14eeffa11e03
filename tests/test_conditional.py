"""Downstream conditional-task tests: inpainting + semantic synthesis."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfm_tpu.core.config import ModelConfig, TrainConfig
from lfm_tpu.nn.adm_unet import UNetModel
from lfm_tpu.nn.encoders import SpatialRescaler
from lfm_tpu.train.conditional import (
    cond_velocity,
    inpainting_condition,
    make_cond_train_step,
    sample_conditional,
    semantic_condition,
)
from lfm_tpu.train.state import TrainState, make_optimizer
from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

RES = 32  # image res; latent = 4


def _vae():
    vae = AutoencoderKL(block_out=(32, 32, 32, 32))
    params = vae.init(jax.random.PRNGKey(0), jnp.zeros((1, RES, RES, 3)),
                      jax.random.PRNGKey(1))
    return vae, params


def _unet(in_ch):
    m = UNetModel(image_size=4, in_channels=in_ch, model_channels=32,
                  out_channels=4, num_res_blocks=1, attention_resolutions=(2,),
                  channel_mult=(1, 2), num_heads=2)
    p = m.init(jax.random.PRNGKey(2), jnp.zeros((1,)), jnp.zeros((1, 4, 4, in_ch)))
    return m, p


def test_spatial_rescaler():
    r = SpatialRescaler(n_stages=3, multiplier=0.5, out_channels=4)
    x = jnp.ones((2, 32, 32, 19))
    p = r.init(jax.random.PRNGKey(0), x)
    out = r.apply(p, x)
    assert out.shape == (2, 4, 4, 4)


def test_inpainting_train_step_and_sampling():
    vae, vae_params = _vae()
    model, mparams = _unet(9)  # 4 latent + 4 cond + 1 mask

    def model_apply(p, t, x):
        return model.apply(p, t, x)

    cond_fn = inpainting_condition(vae, vae_params, 0.18215)
    tc = TrainConfig(lr=1e-3, no_lr_decay=True)
    tx = make_optimizer(tc, 10)
    params = {"model": mparams, "cond": {}}
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params),
                       ema_params=jax.tree_util.tree_map(jnp.copy, params))
    step = jax.jit(make_cond_train_step(model_apply, cond_fn, tx, use_ema=True,
                                        ema_decay=0.99))

    rng = np.random.default_rng(0)
    img = rng.uniform(-1, 1, (4, RES, RES, 3)).astype(np.float32)
    mask = np.zeros((4, RES, RES, 1), np.float32)
    mask[:, 8:24, 8:24] = 1
    batch = {"x": jnp.asarray(img), "mask": jnp.asarray(mask),
             "masked": jnp.asarray(img * (1 - mask))}

    losses = []
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(m.loss))
    assert np.isfinite(losses).all()
    assert int(state.step) == 3

    # conditional sampling with the trained params
    _, c = cond_fn(None, batch, jax.random.PRNGKey(9))
    noise = jax.random.normal(jax.random.PRNGKey(5), (4, 4, 4, 4))
    z0, nfe = sample_conditional(model_apply, state.params["model"], c, noise,
                                 method="euler", num_steps=4)
    assert z0.shape == (4, 4, 4, 4)
    assert np.isfinite(np.asarray(z0)).all()

    # composite eval semantics (test_flow_latent_inpainting.py:160-161)
    fake = np.asarray(vae.apply(vae_params, z0 / 0.18215, method=AutoencoderKL.decode))
    composite = fake * mask + (1 - mask) * img
    assert composite.shape == img.shape


def test_semantic_train_step_joint_optimization():
    vae, vae_params = _vae()
    model, mparams = _unet(8)  # 4 latent + 4 seg code
    num_cls = 19

    rescaler = SpatialRescaler(n_stages=3, multiplier=0.5, out_channels=4)
    rparams = rescaler.init(jax.random.PRNGKey(3),
                            jnp.zeros((1, RES, RES, num_cls)))["params"]

    def model_apply(p, t, x):
        return model.apply(p, t, x)

    cond_fn = semantic_condition(vae, vae_params, rescaler, 0.18215, num_cls)
    tc = TrainConfig(lr=1e-2, no_lr_decay=True)
    tx = make_optimizer(tc, 10)
    params = {"model": mparams, "cond": rparams}
    state = TrainState(step=jnp.asarray(0), params=params,
                       opt_state=tx.init(params),
                       ema_params=jax.tree_util.tree_map(jnp.copy, params))
    step = jax.jit(make_cond_train_step(model_apply, cond_fn, tx, use_ema=False))

    rng = np.random.default_rng(1)
    batch = {
        "x": jnp.asarray(rng.uniform(-1, 1, (4, RES, RES, 3)).astype(np.float32)),
        "seg": jnp.asarray(rng.integers(0, num_cls, (4, RES, RES))),
    }
    r0 = jax.tree_util.tree_map(np.asarray, state.params["cond"])
    for i in range(3):
        state, m = step(state, batch, jax.random.PRNGKey(i))
    assert np.isfinite(float(m.loss))
    # rescaler weights actually moved (joint optimization)
    r1 = state.params["cond"]
    moved = jax.tree_util.tree_map(
        lambda a, b: float(np.max(np.abs(np.asarray(a) - np.asarray(b)))), r0, r1
    )
    assert max(jax.tree_util.tree_leaves(moved)) > 0
