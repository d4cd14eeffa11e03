"""FSDP / tensor-parallel sharding tests on the virtual CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P

from lfm_tpu.core.partition import (
    combined_shardings,
    dit_tp_shardings,
    fsdp_shardings,
    shard_params,
)
from lfm_tpu.core.sharding import make_mesh, replicated, shard_batch
from lfm_tpu.nn.dit import DiT
from lfm_tpu.train.state import TrainState, create_train_state, make_optimizer
from lfm_tpu.train.train import make_train_step
from lfm_tpu.core.config import TrainConfig


def _model_and_params():
    model = DiT(img_resolution=8, patch_size=2, in_channels=4, hidden_size=128,
                depth=2, num_heads=4, num_classes=1)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), None)
    return model, params


def test_fsdp_shards_large_params():
    mesh = make_mesh(dp=2, fsdp=4)
    model, params = _model_and_params()
    sh = fsdp_shardings(params, mesh, min_size=1024)
    qkv = sh["params"]["blocks"]["block"]["attn"]["qkv"]["kernel"]
    assert "fsdp" in tuple(qkv.spec)
    # tiny params replicated
    bias_small = sh["params"]["t_embedder"]["fc1"]["bias"]
    assert bias_small.spec == P()


def test_tp_rules():
    mesh = make_mesh(dp=2, tp=4)
    model, params = _model_and_params()
    sh = dit_tp_shardings(params, mesh)
    blk = sh["params"]["blocks"]["block"]
    # scanned kernels are (layer, in, out)
    assert blk["attn"]["qkv"]["kernel"].spec == P(None, None, "tensor")
    assert blk["attn"]["proj"]["kernel"].spec == P(None, "tensor", None)
    assert blk["mlp"]["fc1"]["kernel"].spec == P(None, None, "tensor")
    assert blk["mlp"]["fc2"]["kernel"].spec == P(None, "tensor", None)
    assert blk["adaLN_modulation"]["kernel"].spec == P()


@pytest.mark.parametrize("layout", [
    dict(dp=2, fsdp=4, tp=1, tp_rules="none"),
    dict(dp=2, fsdp=1, tp=4, tp_rules="dit"),
    dict(dp=2, fsdp=2, tp=2, tp_rules="dit"),
])
def test_sharded_training_matches_replicated(layout):
    """Train steps with FSDP/TP-sharded params must produce the same loss and
    updated params as the fully replicated run."""
    tp_rules = layout.pop("tp_rules")
    mesh = make_mesh(**layout)
    model, params = _model_and_params()
    key = jax.random.PRNGKey(5)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(key, a.shape, a.dtype), params
    )

    tc = TrainConfig(lr=1e-3, no_lr_decay=True)
    tx = make_optimizer(tc, 10)

    def model_apply(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    step = make_train_step(model_apply, tx, use_ema=False, scale_factor=1.0)
    jstep = jax.jit(step)

    batch_np = {"x": np.asarray(
        jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4)))}

    # replicated baseline (same mesh so batch sharding matches)
    repl = replicated(mesh)
    s0 = create_train_state(jax.device_put(params, repl), tc, 10)
    b = shard_batch(mesh, batch_np)
    k = jax.device_put(jax.random.PRNGKey(0), repl)
    s_ref, m_ref = jstep(s0, b, k)

    # sharded params
    sh = combined_shardings(params, mesh, tp_rules=tp_rules, fsdp_min_size=1024)
    sharded_params = shard_params(params, sh)
    s1 = create_train_state(sharded_params, tc, 10)
    s_shard, m_shard = jstep(s1, shard_batch(mesh, batch_np), k)

    np.testing.assert_allclose(float(m_ref.loss), float(m_shard.loss), rtol=1e-5)
    # parameters after one step agree
    for a, b_ in zip(jax.tree_util.tree_leaves(s_ref.params),
                     jax.tree_util.tree_leaves(s_shard.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)
