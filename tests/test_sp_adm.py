"""Spatial sequence parallelism for conv UNets (ADM/EDM): GSPMD-partitioned
forward vs the single-device forward on the virtual 8-device CPU mesh
(VERDICT r3 item 4 — the reference's memory-pressure workloads are the
512/1024px ADM configs, reference bash_scripts/run.sh:96-118).

The sharded program annotates the latent ROW axis over the `seq` mesh axis
and lets XLA's partitioner insert conv halo exchanges / norm reductions /
attention collectives (sample/sp.py::make_spatial_sp_apply) — exact math,
so outputs must match to f32 reduction order."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from lfm_tpu.core.sharding import DATA_AXIS, SEQ_AXIS, make_mesh
from lfm_tpu.nn.adm_unet import UNetModel
from lfm_tpu.nn.edm_unet import DhariwalUNet
from lfm_tpu.sample.sp import make_spatial_sp_apply, sp_data_sharding

TINY_ADM = dict(
    image_size=16, in_channels=4, model_channels=32, out_channels=4,
    num_res_blocks=1, attention_resolutions=(8, 4), channel_mult=(1, 2),
    num_heads=2,
)


def _data(n=4, res=16, chans=4, classes=None, seed=3):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, res, res, chans)).astype(np.float32))
    t = jnp.asarray(np.linspace(0.2, 0.8, n).astype(np.float32))
    y = jnp.asarray(rng.integers(0, classes, size=(n,)).astype(np.int32)) \
        if classes else None
    return t, x, y


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 8)])
def test_adm_spatial_sp_matches_unsharded(dp, sp):
    mesh = make_mesh(dp=dp, sp=sp)
    model = UNetModel(**TINY_ADM)
    t, x, y = _data(n=2 * max(dp, 2))
    params = model.init(jax.random.PRNGKey(0), t, x, None)

    want = model.apply(params, t, x, None)
    apply_sp = make_spatial_sp_apply(model, mesh, has_labels=False)
    x_sh = jax.device_put(x, sp_data_sharding(mesh))
    got = jax.jit(apply_sp)(params, t, x_sh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_adm_spatial_sp_classes_and_scale_shift():
    mesh = make_mesh(dp=2, sp=4)
    model = UNetModel(**{**TINY_ADM, "num_classes": 5,
                         "use_scale_shift_norm": True,
                         "resblock_updown": True})
    t, x, y = _data(classes=5)
    params = model.init(jax.random.PRNGKey(0), t, x, y)

    want = model.apply(params, t, x, y)
    apply_sp = make_spatial_sp_apply(model, mesh)
    got = jax.jit(apply_sp)(params, t,
                            jax.device_put(x, sp_data_sharding(mesh)), y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_dhariwal_spatial_sp_matches_unsharded():
    """EDM family (DhariwalUNet is the reference's non-origin ADM,
    models/EDM.py:716-861)."""
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    model = DhariwalUNet(img_resolution=16, model_channels=32,
                         channel_mult=(1, 2), num_blocks=1,
                         attn_resolutions=(8,), dropout=0.0)
    t, x, _ = _data(n=2)
    params = model.init(jax.random.PRNGKey(0), t, x)

    want = model.apply(params, t, x)

    def apply(params, t, x):
        xs = NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None, None))
        x = jax.lax.with_sharding_constraint(x, xs)
        return jax.lax.with_sharding_constraint(model.apply(params, t, x), xs)

    got = jax.jit(apply)(params, t, jax.device_put(
        x, NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None, None))))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_adm_sp_sampler_end_to_end_matches_plain():
    """make_sampler(sp_mesh=...) dispatches conv UNets to the GSPMD spatial
    path and the full euler ODE loop matches the unsharded sampler."""
    from lfm_tpu.core.config import Config, ModelConfig, SampleConfig
    from lfm_tpu.sample.sample import make_sampler

    mesh = make_mesh(dp=2, sp=4)
    model = UNetModel(**TINY_ADM)
    t, x, _ = _data()
    params = model.init(jax.random.PRNGKey(0), t, x, None)
    config = Config(
        model=ModelConfig(model_type="adm", image_size=128, num_classes=1,
                          nf=32),
        sample=SampleConfig(method="euler", num_steps=4),
    )
    plain = make_sampler(config, model, params, jit=True)
    sp = make_sampler(config, model, params, jit=True, sp_mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sp(x).latents), np.asarray(plain(x).latents),
        rtol=2e-4, atol=2e-4)
