"""Sequence parallelism: ring attention + sp DiT vs their unsharded forms
on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from lfm_tpu.core.ring import ring_attention
from lfm_tpu.core.sharding import DATA_AXIS, SEQ_AXIS, make_mesh
from lfm_tpu.nn.dit import create_dit
from lfm_tpu.sample.sp import make_sp_apply, sp_data_sharding


def reference_attention(q, k, v):
    scale = 1.0 / np.sqrt(q.shape[-1])
    s = jnp.einsum("nqhd,nkhd->nhqk", q, k) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", p, v)


@pytest.mark.parametrize("dp,sp", [(2, 4), (1, 8)])
def test_ring_attention_matches_reference(dp, sp):
    mesh = make_mesh(dp=dp, sp=sp)
    rng = np.random.default_rng(0)
    n, t, h, d = 2 * dp, 8 * sp, 4, 16
    q, k, v = (jnp.asarray(rng.normal(size=(n, t, h, d)).astype(np.float32))
               for _ in range(3))

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, SEQ_AXIS),
        mesh=mesh,
        in_specs=(P(DATA_AXIS, SEQ_AXIS, None, None),) * 3,
        out_specs=P(DATA_AXIS, SEQ_AXIS, None, None),
        check_vma=False,
    )
    got = jax.jit(ring)(q, k, v)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_ring_attention_grads_match():
    mesh = make_mesh(dp=1, sp=4, devices=jax.devices()[:4])
    rng = np.random.default_rng(1)
    n, t, h, d = 2, 16, 2, 8
    q, k, v = (jnp.asarray(rng.normal(size=(n, t, h, d)).astype(np.float32))
               for _ in range(3))
    co = jnp.asarray(rng.normal(size=(n, t, h, d)).astype(np.float32))

    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, SEQ_AXIS),
        mesh=mesh,
        in_specs=(P(None, SEQ_AXIS, None, None),) * 3,
        out_specs=P(None, SEQ_AXIS, None, None),
        check_vma=False,
    )
    g_ring = jax.grad(lambda q, k, v: jnp.sum(ring(q, k, v) * co), (0, 1, 2))(q, k, v)
    g_ref = jax.grad(
        lambda q, k, v: jnp.sum(reference_attention(q, k, v) * co), (0, 1, 2)
    )(q, k, v)
    for a, b in zip(g_ring, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-5, atol=5e-5)


def test_sp_dit_matches_unsharded():
    """DiT-S/2 with the row axis sharded 4-way: same outputs, same params."""
    mesh = make_mesh(dp=2, sp=4)
    model = create_dit("DiT-S/2", img_resolution=32, num_classes=1)
    model_sp = create_dit("DiT-S/2", img_resolution=32, num_classes=1,
                          sp_axis=SEQ_AXIS)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 32, 32, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(4,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), t, x, None)

    want = model.apply(params, t, x)

    apply_sp = make_sp_apply(model_sp, mesh, has_labels=False)
    x_sh = jax.device_put(x, sp_data_sharding(mesh))
    got = jax.jit(apply_sp)(params, t, x_sh)

    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sp_dit_labels_and_mixed_mesh():
    """dp=4 x sp=2 with class labels; tiny DiT-T/2 keeps the mesh cheap."""
    mesh = make_mesh(dp=4, sp=2)
    kw = dict(img_resolution=16, num_classes=10)
    model = create_dit("DiT-T/2", **kw)
    model_sp = create_dit("DiT-T/2", sp_axis=SEQ_AXIS, **kw)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(8, 16, 16, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(8,)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), t, x, y)

    want = model.apply(params, t, x, y)
    apply_sp = make_sp_apply(model_sp, mesh)
    got = jax.jit(apply_sp)(params, t, jax.device_put(x, sp_data_sharding(mesh)), y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-4)


def test_sp_requires_matching_axis():
    mesh = make_mesh(dp=2, sp=4)
    model = create_dit("DiT-T/2", img_resolution=16, num_classes=1)
    with pytest.raises(AssertionError):
        make_sp_apply(model, mesh)


def test_sp_sampler_end_to_end_matches_plain():
    """make_sampler(sp_mesh=...) through the full ODE loop (euler + CFG)
    produces the same latents as the unsharded sampler."""
    from lfm_tpu.core.config import Config, ModelConfig, SampleConfig
    from lfm_tpu.sample.sample import make_sampler

    mesh = make_mesh(dp=2, sp=4)
    model = create_dit("DiT-T/2", img_resolution=16, num_classes=10,
                       label_dropout=0.1)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(4,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 16, 16, 4)), jnp.zeros((1,), jnp.int32))
    config = Config(
        model=ModelConfig(model_type="DiT-T/2", image_size=128, num_classes=10),
        sample=SampleConfig(method="euler", num_steps=4, cfg_scale=1.5),
    )
    plain = make_sampler(config, model, params, jit=True)
    sp = make_sampler(config, model, params, jit=True, sp_mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(sp(x, y).latents), np.asarray(plain(x, y).latents),
        rtol=2e-4, atol=2e-4)
