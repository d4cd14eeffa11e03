"""End-to-end slice tests: train a tiny DiT on synthetic latents over the
8-device CPU mesh, then sample with every solver family."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfm_tpu.core.config import Config, ModelConfig, SampleConfig, TrainConfig
from lfm_tpu.core.rng import SampleRNG
from lfm_tpu.core.sharding import replicated, shard_batch
from lfm_tpu.nn.dit import DiT
from lfm_tpu.sample.sample import make_sampler, noise_and_labels
from lfm_tpu.train.state import (
    create_train_state, fused_supported, make_fused_adamw_ema, make_optimizer,
)
from lfm_tpu.train.train import make_train_step


def _tiny_model():
    return DiT(img_resolution=8, patch_size=2, in_channels=4, hidden_size=64,
               depth=2, num_heads=4, num_classes=1)


def _tiny_config(**sample_kw):
    return Config(
        model=ModelConfig(model_type="DiT-S/2", image_size=64, num_classes=1),
        sample=SampleConfig(**sample_kw),
    )


@pytest.fixture(scope="module")
def trained():
    """Train the tiny DiT on latents drawn from N(mu, 0.25) for 30 steps."""
    model = _tiny_model()
    key = jax.random.PRNGKey(0)
    params = model.init(key, jnp.zeros((1,)), jnp.zeros((1, 8, 8, 4)), None)

    cfg = TrainConfig(lr=3e-3, no_lr_decay=True, use_ema=True, ema_decay=0.9)
    tx = make_optimizer(cfg, steps_per_epoch=10)
    state = create_train_state(params, cfg, steps_per_epoch=10)

    def model_apply(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    step = make_train_step(model_apply, tx, ema_decay=cfg.ema_decay,
                           use_ema=True, is_latent_data=False, scale_factor=1.0)
    step = jax.jit(step, donate_argnums=(0,))

    data_key = jax.random.PRNGKey(7)
    losses = []
    for i in range(150):
        k = jax.random.fold_in(data_key, i)
        z0 = 1.0 + 0.5 * jax.random.normal(k, (32, 8, 8, 4))
        state, m = step(state, {"x": z0, "y": None}, jax.random.PRNGKey(1))
        losses.append(float(m.loss))
    return model, state, losses


def test_loss_decreases(trained):
    _, _, losses = trained
    assert np.mean(losses[-5:]) < np.mean(losses[:5])
    assert np.isfinite(losses).all()


def test_ema_differs_from_params(trained):
    _, state, _ = trained
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.max(jnp.abs(a - b))), state.params, state.ema_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0


@pytest.mark.parametrize("method,karras,steps", [
    ("dopri5", False, 0),
    ("euler", False, 50),
    ("euler", True, 40),
    ("heun", True, 20),
])
def test_sample_distribution(trained, method, karras, steps):
    """Sampling from the trained field should land near the latent
    distribution N(1, 0.25) it was trained on."""
    model, state, _ = trained
    config = _tiny_config(method=method, use_karras_samplers=karras,
                          num_steps=steps or 40)
    sampler = make_sampler(config, model, state.ema_params, jit=True)
    rng = SampleRNG(seed=0)
    noise = rng.randn(jnp.arange(256), (8, 8, 4))
    out = sampler(noise)
    mean = float(out.images.mean())
    std = float(out.images.std())
    assert abs(mean - 1.0) < 0.25, (method, mean)
    assert abs(std - 0.5) < 0.35, (method, std)
    assert float(out.nfe) > 0


def test_train_step_on_mesh(mesh8, trained):
    """The same step runs sharded over the 8-device mesh with a global batch."""
    model, state, _ = trained
    cfg = TrainConfig(lr=1e-3, no_lr_decay=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)

    def model_apply(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    step = make_train_step(model_apply, tx, use_ema=False, scale_factor=1.0)
    repl = replicated(mesh8)
    state0 = create_train_state(
        jax.device_put(state.params, repl), cfg, steps_per_epoch=10
    )
    jstep = jax.jit(step)
    batch = shard_batch(mesh8, {"x": np.ones((16, 8, 8, 4), np.float32)})
    new_state, m = jstep(state0, batch, jax.device_put(jax.random.PRNGKey(0), repl))
    assert np.isfinite(float(m.loss))
    assert int(new_state.step) == 1

    # mesh result must equal single-device result
    sstep = jax.jit(step)
    s1, m1 = sstep(
        create_train_state(state.params, cfg, steps_per_epoch=10),
        {"x": jnp.ones((16, 8, 8, 4))},
        jax.random.PRNGKey(0),
    )
    np.testing.assert_allclose(float(m.loss), float(m1.loss), rtol=1e-5)


@pytest.mark.parametrize("wd,lr_decay", [(0.0, False), (0.01, True)])
def test_fused_adamw_matches_optax(wd, lr_decay):
    """The fused one-pass AdamW+EMA update must reproduce the optax chain
    exactly (params, Adam moments, counts, EMA, grad norm) over several
    steps, with and without weight decay / cosine LR schedule."""
    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), None)
    cfg = TrainConfig(lr=3e-3, no_lr_decay=not lr_decay, num_epoch=4,
                      weight_decay=wd, use_ema=True, ema_decay=0.9)
    tx = make_optimizer(cfg, steps_per_epoch=2)

    def model_apply(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    def run(fused):
        state = create_train_state(params, cfg, steps_per_epoch=2)
        assert fused_supported(state.opt_state)
        step = make_train_step(
            model_apply, tx, ema_decay=cfg.ema_decay, use_ema=True,
            scale_factor=1.0,
            fused_update=make_fused_adamw_ema(
                cfg, 2, ema_decay=cfg.ema_decay) if fused else None,
        )
        step = jax.jit(step)
        metrics = []
        for i in range(5):
            z0 = 1.0 + 0.5 * jax.random.normal(jax.random.PRNGKey(i), (8, 8, 8, 4))
            state, m = step(state, {"x": z0, "y": None}, jax.random.PRNGKey(1))
            metrics.append((float(m.loss), float(m.grad_norm)))
        return state, metrics

    # (a) the update math itself, eager on identical grads: ulp-level match
    from lfm_tpu.train.state import ema_update
    import optax

    state = create_train_state(params, cfg, steps_per_epoch=2)
    grads = jax.tree_util.tree_map(
        lambda p: 1e-3 * jax.random.normal(jax.random.PRNGKey(9), p.shape), params)
    fused = make_fused_adamw_ema(cfg, 2, ema_decay=cfg.ema_decay)
    up, opt_ref = tx.update(grads, state.opt_state, state.params)
    p_ref = optax.apply_updates(state.params, up)
    e_ref = ema_update(state.ema_params, p_ref, cfg.ema_decay)
    p_fus, opt_fus, e_fus, _ = fused(state.opt_state, state.params, grads,
                                     state.ema_params)
    for name, a, b in [("params", p_fus, p_ref), ("opt", opt_fus, opt_ref),
                       ("ema", e_fus, e_ref)]:
        for x, y in zip(jax.tree_util.tree_leaves(a),
                        jax.tree_util.tree_leaves(b)):
            np.testing.assert_allclose(np.asarray(x, np.float64),
                                       np.asarray(y, np.float64),
                                       rtol=1e-6, atol=1e-9, err_msg=name)
    assert (jax.tree_util.tree_structure(opt_fus)
            == jax.tree_util.tree_structure(opt_ref))

    # (b) end-to-end jitted train steps: fusion reorders the backward's float
    # reductions, so trajectories drift at ulp scale and Adam's normalization
    # amplifies it — tolerance reflects benign noise, not looser math
    s_ref, m_ref = run(fused=False)
    s_fus, m_fus = run(fused=True)
    np.testing.assert_allclose(m_fus, m_ref, rtol=1e-5)
    for name, a, b in [("params", s_fus.params, s_ref.params),
                       ("opt", s_fus.opt_state, s_ref.opt_state),
                       ("ema", s_fus.ema_params, s_ref.ema_params)]:
        la, lb = jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)
        assert len(la) == len(lb), name
        for x, y in zip(la, lb):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-3, atol=5e-6, err_msg=name)
    assert int(s_fus.step) == 5


def test_shard_mapped_train_eval_matches_plain(mesh8):
    """The shard_map model-eval wrapper (multi-device training path) must
    reproduce the plain step exactly: same loss, same grad norm, same
    updated params — including the gradient psum shard_map's transpose
    inserts for the replicated param input."""
    from lfm_tpu.train.train import shard_mapped_model_apply

    model = _tiny_model()
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), None)
    cfg = TrainConfig(lr=3e-3, no_lr_decay=True, use_ema=True, ema_decay=0.9)
    tx = make_optimizer(cfg, steps_per_epoch=10)

    def plain(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    wrapped = shard_mapped_model_apply(model, mesh8, train=False)

    results = {}
    for name, apply_fn in (("plain", plain), ("wrapped", wrapped)):
        state = create_train_state(params, cfg, steps_per_epoch=10)
        step = jax.jit(make_train_step(apply_fn, tx, ema_decay=cfg.ema_decay,
                                       use_ema=True, scale_factor=1.0))
        metrics = []
        for i in range(3):
            z0 = 1.0 + 0.5 * jax.random.normal(jax.random.PRNGKey(i),
                                               (16, 8, 8, 4))
            batch = shard_batch(mesh8, {"x": np.asarray(z0)})
            state, m = step(state, batch, jax.random.PRNGKey(1))
            metrics.append((float(m.loss), float(m.grad_norm)))
        results[name] = (state, metrics)

    np.testing.assert_allclose(results["wrapped"][1], results["plain"][1],
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(results["wrapped"][0].params),
                    jax.tree_util.tree_leaves(results["plain"][0].params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)


def test_noise_and_labels_conditional():
    config = Config(model=ModelConfig(model_type="DiT-B/2", image_size=256,
                                      num_classes=1000, label_dropout=0.1))
    rng = SampleRNG(seed=0)
    noise, y = noise_and_labels(config, rng, jnp.arange(4))
    assert noise.shape == (4, 32, 32, 4)
    assert y is not None and y.shape == (4,)
    assert int(y.max()) < 1000


def test_cfg_sampling_runs(trained):
    model = DiT(img_resolution=8, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=10, label_dropout=0.1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32))
    config = Config(
        model=ModelConfig(model_type="DiT-S/2", image_size=64, num_classes=10),
        sample=SampleConfig(method="euler", num_steps=8, cfg_scale=1.5),
    )
    sampler = make_sampler(config, model, params, jit=True)
    noise = SampleRNG(0).randn(jnp.arange(4), (8, 8, 4))
    y = jnp.array([1, 2, 3, 4])
    out = sampler(noise, y)
    assert out.images.shape == (4, 8, 8, 4)
    assert np.isfinite(np.asarray(out.images)).all()


def test_dopri5_agrees_with_fine_euler(trained):
    """Adaptive and very-fine fixed integration of the same learned field
    must land on (nearly) the same samples — the property FID parity rests on."""
    model, state, _ = trained
    noise = SampleRNG(seed=3).randn(jnp.arange(16), (8, 8, 4))

    def make(method, steps):
        config = _tiny_config(method=method, num_steps=steps)
        return make_sampler(config, model, state.ema_params, jit=True)

    z_adaptive = make("dopri5", 0)(noise).latents
    z_fine = make("euler", 800)(noise).latents
    err = float(jnp.max(jnp.abs(z_adaptive - z_fine)))
    # bound dominated by euler-800's own O(h) error at the solver's rtol;
    # 5.1e-3 observed since round 4 pinned the t1 dense output to
    # torchdiffeq's DPS_C_MID quartic (test_controller_trace.py) instead of
    # the round-1 Shampine-P fit the original 5e-3 bound was picked against
    assert err < 1e-2, err
