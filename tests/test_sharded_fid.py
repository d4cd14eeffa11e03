"""Sharded FID generation + checkpoint tests on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.core.config import Config, ModelConfig, SampleConfig, TrainConfig
from lfm_tpu.nn.dit import DiT
from lfm_tpu.sample.sharded import generate_fid_activations, make_sharded_generator


def _setup():
    model = DiT(img_resolution=8, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), None)
    key = jax.random.PRNGKey(9)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 * jax.random.normal(key, a.shape, a.dtype), params
    )
    config = Config(
        model=ModelConfig(model_type="DiT-S/2", image_size=64, num_classes=1),
        sample=SampleConfig(method="euler", num_steps=4, n_sample=40, batch_size=16),
    )
    return config, model, params


def test_sharded_generation_mesh_invariant(mesh8):
    """Latents for the same global sample indices must be identical on an
    8-device mesh and a 1-device mesh — the world-size-invariance property
    the reference engineered via DeterministicGenerator."""
    from lfm_tpu.core.sharding import make_mesh

    config, model, params = _setup()
    outs = {}
    for mesh in (mesh8, make_mesh(dp=1, devices=jax.devices()[:1])):
        step_fn, n_steps, gb = make_sharded_generator(
            config, model, params, mesh=mesh
        )
        got = {}
        for s in range(n_steps):
            img, _, _, idx = step_fn(s)
            for row, i in enumerate(idx):
                got[int(i)] = img[row]
        outs[mesh.devices.size] = got

    assert set(outs[8]) == set(outs[1])
    for i in outs[8]:
        np.testing.assert_allclose(outs[8][i], outs[1][i], atol=2e-5)


def test_sharded_dopri5_mesh_invariant(mesh8):
    """The production FID path (dopri5: shard_map'd model eval inside the
    adaptive while_loop) must generate the same latents on an 8-device and a
    1-device mesh. Adaptive step control is global (outside the shard_map),
    so trajectories agree to float tolerance."""
    from lfm_tpu.core.sharding import make_mesh

    config, model, params = _setup()
    config = config.replace(sample=SampleConfig(
        method="dopri5", n_sample=16, batch_size=16))
    outs = {}
    for mesh in (mesh8, make_mesh(dp=1, devices=jax.devices()[:1])):
        step_fn, n_steps, _ = make_sharded_generator(
            config, model, params, mesh=mesh)
        img, _, nfe, idx = step_fn(0)
        outs[mesh.devices.size] = (np.asarray(img), float(nfe))
    np.testing.assert_allclose(outs[8][0], outs[1][0], atol=5e-5)
    assert outs[8][1] == outs[1][1] > 0  # identical NFE: global step control


def test_generate_fid_activations_with_tiny_vae_inception(mesh8, tmp_path):
    """Full path: sample -> VAE decode -> inception activations -> FID."""
    from lfm_tpu.eval.fid import activation_statistics, fid_from_activations, save_statistics
    from lfm_tpu.eval.inception import FIDInceptionV3
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    config, model, params = _setup()
    config = config.replace(sample=SampleConfig(
        method="euler", num_steps=2, n_sample=16, batch_size=16))

    vae = AutoencoderKL(block_out=(32, 32, 32, 32))
    vae_params = vae.init(jax.random.PRNGKey(1), jnp.zeros((1, 64, 64, 3)),
                          jax.random.PRNGKey(2))
    inc = FIDInceptionV3()
    inc_params = inc.init(jax.random.PRNGKey(3), jnp.zeros((1, 32, 32, 3)))

    acts = generate_fid_activations(
        config, model, params, vae, vae_params, inc_params, mesh=mesh8
    )
    assert acts.shape == (16, 2048)
    assert np.isfinite(acts).all()

    mu, sigma = activation_statistics(acts)
    p = str(tmp_path / "stats.npy")
    save_statistics(p, mu, sigma)
    assert fid_from_activations(acts, p) < 1e-2


def test_checkpoint_roundtrip(tmp_path):
    from lfm_tpu.core.checkpoint import (
        has_content, load_model, restore_content, save_content, save_model,
    )
    from lfm_tpu.train.state import create_train_state, make_optimizer

    config, model, params = _setup()
    tc = TrainConfig(lr=1e-3)
    state = create_train_state(params, tc, steps_per_epoch=10)
    state = state._replace(step=jnp.asarray(123, jnp.int32))

    exp = str(tmp_path / "exp")
    import os

    os.makedirs(exp)
    assert not has_content(exp)
    save_content(exp, state, epoch=7, config=config)
    assert has_content(exp)

    fresh = create_train_state(params, tc, steps_per_epoch=10)
    restored, epoch = restore_content(exp, fresh)
    assert epoch == 7
    assert int(restored.step) == 123
    for a, b in zip(jax.tree_util.tree_leaves(restored.params),
                    jax.tree_util.tree_leaves(state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    save_model(exp, state.ema_params, epoch=7)
    ema = load_model(exp, 7, template=state.ema_params)
    for a, b in zip(jax.tree_util.tree_leaves(ema),
                    jax.tree_util.tree_leaves(state.ema_params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
