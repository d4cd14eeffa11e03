"""Model-zoo variants + loss-scaling tests."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from lfm_tpu.nn.variants import (
    AttentionPool2d,
    EncoderUNetModel,
    ResNet,
    SuperResModel,
    resnet18,
    resnet50,
)
from lfm_tpu.train.scaling import dynamic_loss_scale


def test_superres_model():
    m = SuperResModel(image_size=16, in_channels=8, model_channels=32,
                      out_channels=4, num_res_blocks=1,
                      attention_resolutions=(8,), channel_mult=(1, 2),
                      num_heads=2)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    low = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 4))
    t = jnp.array([0.5, 0.7])
    p = m.init(jax.random.PRNGKey(2), t, x, low_res=low)
    out = m.apply(p, t, x, low_res=low)
    assert out.shape == (2, 16, 16, 4)


@pytest.mark.parametrize("pool", ["adaptive", "attention", "spatial", "spatial_v2"])
def test_encoder_unet_pools(pool):
    m = EncoderUNetModel(image_size=16, in_channels=4, model_channels=32,
                         out_channels=10, num_res_blocks=1,
                         attention_resolutions=(8,), channel_mult=(1, 2),
                         num_heads=2, num_head_channels=16, pool=pool)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 16, 4))
    t = jnp.array([0.5, 0.7])
    p = m.init(jax.random.PRNGKey(1), t, x)
    out = m.apply(p, t, x)
    assert out.shape == (2, 10)
    assert np.isfinite(np.asarray(out)).all()


def test_resnet_variants():
    for fn, params_ratio in [(resnet18, 1), (resnet50, 2)]:
        m = fn(num_classes=10)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, 32, 32, 3))
        variables = m.init(jax.random.PRNGKey(1), x)
        out = m.apply(variables, x)
        assert out.shape == (2, 10)
        np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, atol=1e-5)  # softmax


def test_dynamic_loss_scale():
    tx = dynamic_loss_scale(optax.sgd(0.1), init_scale=1024.0,
                            growth_interval=2)
    params = {"w": jnp.ones(3)}
    state = tx.init(params)
    assert float(state.scale) == 1024.0

    # scaled finite grads -> unscaled update applied
    grads = {"w": jnp.ones(3) * 1024.0}
    updates, state = tx.update(grads, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), -0.1, rtol=1e-6)
    assert int(state.growth_counter) == 1

    # second finite step hits growth_interval -> scale doubles
    updates, state = tx.update(grads, state, params)
    assert float(state.scale) == 2048.0
    assert int(state.growth_counter) == 0

    # overflow -> zero update + backoff
    bad = {"w": jnp.array([jnp.inf, 1.0, 1.0]) * state.scale}
    updates, state = tx.update(bad, state, params)
    np.testing.assert_allclose(np.asarray(updates["w"]), 0.0)
    assert float(state.scale) == 1024.0
