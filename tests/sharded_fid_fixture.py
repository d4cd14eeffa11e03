"""Shared tiny sharded-FID fixture: built from FIXED SEEDS so independent
processes (the 2-process multihost test workers and the single-process
parent) construct bit-identical models with no checkpoint file, then run the
mesh-sharded FID activation generator over all visible devices.

Used by tests/test_multihost.py::test_real_two_process_sharded_fid and its
worker (tests/multihost_fid_worker.py)."""

import jax
import jax.numpy as jnp


def build_fixture():
    from lfm_tpu.core.config import Config, ModelConfig, SampleConfig
    from lfm_tpu.eval.inception import FIDInceptionV3
    from lfm_tpu.nn.dit import DiT
    from lfm_tpu.vae.autoencoder_kl import AutoencoderKL

    model = DiT(img_resolution=8, patch_size=2, in_channels=4, hidden_size=64,
                depth=2, num_heads=4, num_classes=1)
    # inits under jit: this fixture also runs on the real chip through the
    # tunnel (eager init is ~1s/op there)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), jnp.zeros((1,)),
                                 jnp.zeros((1, 8, 8, 4)), None)
    config = Config(
        model=ModelConfig(model_type="DiT-S/2", image_size=64, num_classes=1),
        sample=SampleConfig(method="euler", num_steps=2, n_sample=16,
                            batch_size=16),
    )
    vae = AutoencoderKL(block_out=(32, 32, 32, 32))
    vae_params = jax.jit(vae.init)(jax.random.PRNGKey(4),
                                   jnp.zeros((1, 64, 64, 3)),
                                   jax.random.PRNGKey(5))
    inc_params = jax.jit(FIDInceptionV3().init)(jax.random.PRNGKey(6),
                                                jnp.zeros((1, 32, 32, 3)))
    return config, model, params, vae, vae_params, inc_params


def run_fixture(fix, mesh=None):
    from lfm_tpu.core.sharding import make_mesh
    from lfm_tpu.sample.sharded import generate_fid_activations

    config, model, params, vae, vae_params, inc_params = fix
    mesh = mesh if mesh is not None else make_mesh()  # all visible devices
    return generate_fid_activations(
        config, model, params, vae, vae_params, inc_params, mesh=mesh)
