"""Every released preset's model must build and run a forward pass.

Catches factory/config mismatches for the full released matrix (the
reference's de-facto regression surface, readme.md:101-185). Full-size
forwards are slow on 1 CPU core, so models are built at full config but run
at reduced latent resolution where the architecture allows (UNets are
resolution-agnostic; DiT is fixed-res so DiT presets run at full 32x32).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lfm_tpu.core.config import PRESETS, get_preset
from lfm_tpu.nn.factory import create_network

DIT_PRESETS = ["celeb256_dit", "imnet_dit"]
ADM_PRESETS = ["celeb256_adm", "celeb512_adm", "ffhq_adm", "imnet_adm"]


@pytest.mark.parametrize("name", DIT_PRESETS)
def test_dit_presets_forward(name):
    config = get_preset(name)
    model = create_network(config.model)
    s = config.model.latent_size
    x = jnp.zeros((1, s, s, 4))
    t = jnp.zeros((1,))
    y = (jnp.zeros((1,), jnp.int32)
         if (config.model.num_classes or 0) > 0 else None)
    params = jax.eval_shape(
        lambda: model.init({"params": jax.random.PRNGKey(0),
                            "label_dropout": jax.random.PRNGKey(1)}, t, x, y)
    )
    n_params = sum(int(np.prod(l.shape)) for l in jax.tree_util.tree_leaves(params))
    assert n_params > 1e8  # DiT-B/2 ~130M, DiT-L/2 ~458M


@pytest.mark.parametrize("name", ADM_PRESETS)
def test_adm_presets_forward_small(name):
    """Build the exact preset UNet topology but at latent 16 (UNets are
    resolution-agnostic; attention placement follows config)."""
    config = get_preset(name)
    mc = dataclasses.replace(config.model, image_size=16 * config.model.f)
    model = create_network(mc)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 16, 4))
    t = jnp.full((1,), 0.5)
    y = (jnp.zeros((1,), jnp.int32)
         if (mc.num_classes or 0) > 1 else None)
    params = model.init({"params": jax.random.PRNGKey(1)}, t, x, y)
    out = model.apply(params, t, x, y)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_all_presets_resolve_models():
    for name in PRESETS:
        config = get_preset(name)
        model = create_network(config.model)
        assert model is not None
