"""Parity of the fused Pallas DiT block / full fused forward vs the flax
module path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from lfm_tpu.kernels.dit_block import fused_dit_block
from lfm_tpu.nn.dit import DiT, DiTBlock, create_dit
from lfm_tpu.nn.dit_fused import cast_params_bf16, dit_fused_apply


def test_fused_block_parity_interpret():
    """Single block: Pallas kernel (interpret) vs DiTBlock.apply, f32
    weights cast to bf16 as the module's dtype policy does."""
    c, t, n, heads = 128, 64, 4, 4
    block = DiTBlock(hidden_size=c, num_heads=heads, dtype=jnp.bfloat16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (n, t, c), jnp.bfloat16)
    cond = jax.random.normal(jax.random.PRNGKey(1), (n, c), jnp.bfloat16)
    params = block.init(jax.random.PRNGKey(2), x, cond)
    # adaLN is zero-init; give it signal so modulate paths are exercised
    params = jax.tree_util.tree_map(
        lambda a: jax.random.normal(jax.random.PRNGKey(3), a.shape,
                                    jnp.float32) * 0.02
        if a.size else a, params)

    want = block.apply(params, x, cond)

    p = jax.tree_util.tree_map(lambda a: a.astype(jnp.bfloat16),
                               params["params"])
    mod = (jnp.dot(jax.nn.silu(cond), p["adaLN_modulation"]["kernel"])
           + p["adaLN_modulation"]["bias"])
    with pltpu.force_tpu_interpret_mode():
        got = fused_dit_block(
            x, mod,
            p["attn"]["qkv"]["kernel"], p["attn"]["qkv"]["bias"],
            p["attn"]["proj"]["kernel"], p["attn"]["proj"]["bias"],
            p["mlp"]["fc1"]["kernel"], p["mlp"]["fc1"]["bias"],
            p["mlp"]["fc2"]["kernel"], p["mlp"]["fc2"]["bias"],
            num_heads=heads, samples_per_cell=2,
        )
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(want, np.float32),
        rtol=0.05, atol=0.05)


def test_fused_forward_parity_interpret():
    """Full DiT forward: dit_fused_apply vs model.apply on a small config."""
    model = DiT(img_resolution=16, patch_size=2, in_channels=4,
                hidden_size=128, depth=3, num_heads=4, num_classes=10,
                dtype=jnp.bfloat16, scan_blocks=True)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4, 16, 16, 4))
    t = jnp.linspace(0.1, 0.9, 4)
    y = jnp.array([0, 3, 5, 9])
    params = model.init(jax.random.PRNGKey(1), t, x, y)
    # randomize zero-init tables so the comparison is nontrivial
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.05
              for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    want = model.apply(params, t, x, y)
    bf = cast_params_bf16(params)
    with pltpu.force_tpu_interpret_mode():
        got = dit_fused_apply(model, bf, t, x, y)
    assert got.shape == want.shape == (4, 16, 16, 4)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    denom = max(1e-3, float(np.abs(w).max()))
    assert float(np.abs(g - w).max()) / denom < 0.05


def test_fused_applicable_gate():
    """The static gate keeps the fused path off for non-TPU backends,
    non-scan DiTs, and non-bf16 models."""
    from lfm_tpu.nn.dit_fused import fused_applicable

    x = jnp.zeros((8, 32, 32, 4))
    dit_l = create_dit("DiT-L/2", img_resolution=32, num_classes=1,
                       dtype=jnp.bfloat16)
    # CPU backend in tests -> always off
    assert not fused_applicable(dit_l, x)
    no_scan = create_dit("DiT-L/2", img_resolution=32, num_classes=1,
                         dtype=jnp.bfloat16, scan_blocks=False)
    assert not fused_applicable(no_scan, x)
    # f32 models must keep f32 numerics through the module path
    dit_f32 = create_dit("DiT-L/2", img_resolution=32, num_classes=1)
    assert not fused_applicable(dit_f32, x)


def _block_args(key, n=4, t=64, c=128, heads=4, hidden=None):
    hidden = hidden or 4 * c
    ks = jax.random.split(key, 11)
    b = jnp.bfloat16
    return dict(
        x=jax.random.normal(ks[0], (n, t, c), b),
        mod=0.2 * jax.random.normal(ks[1], (n, 6 * c), b),
        wqkv=0.05 * jax.random.normal(ks[2], (c, 3 * c), b),
        bqkv=0.05 * jax.random.normal(ks[3], (3 * c,), b),
        wproj=0.05 * jax.random.normal(ks[4], (c, c), b),
        bproj=0.05 * jax.random.normal(ks[5], (c,), b),
        w1=0.05 * jax.random.normal(ks[6], (c, hidden), b),
        b1=0.05 * jax.random.normal(ks[7], (hidden,), b),
        w2=0.05 * jax.random.normal(ks[8], (hidden, c), b),
        b2=0.05 * jax.random.normal(ks[9], (c,), b),
    ), heads


@pytest.mark.parametrize("pallas_bwd", [False, True])
def test_fused_block_train_grad_parity_interpret(pallas_bwd):
    """custom_vjp Pallas forward + (jnp | Pallas) backward vs jax.grad
    through the pure-jnp reference of the same math: every cotangent (x,
    mod, all weights and biases) must match within bf16 tolerance."""
    from lfm_tpu.kernels.dit_block_train import (make_fused_block_train,
                                                 reference_block)

    args, heads = _block_args(jax.random.PRNGKey(0))
    names = list(args.keys())
    vals = [args[k] for k in names]
    block = make_fused_block_train(heads, 2, 2, pallas_bwd=pallas_bwd)

    def loss_fused(*a):
        return jnp.sum(jnp.square(block(*a).astype(jnp.float32)))

    def loss_ref(*a):
        return jnp.sum(jnp.square(
            reference_block(*a, num_heads=heads).astype(jnp.float32)))

    with pltpu.force_tpu_interpret_mode():
        out_f = block(*vals)
        grads_f = jax.grad(loss_fused, argnums=tuple(range(10)))(*vals)
    out_r = reference_block(*vals, num_heads=heads)
    grads_r = jax.grad(loss_ref, argnums=tuple(range(10)))(*vals)

    np.testing.assert_allclose(np.asarray(out_f, np.float32),
                               np.asarray(out_r, np.float32),
                               rtol=0.05, atol=0.05)
    for name, a, b in zip(names, grads_f, grads_r):
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(b).max(), 1e-3)
        rel = np.abs(a - b).max() / denom
        assert rel < 0.06, (name, rel, np.abs(b).max())


@pytest.mark.slow
def test_fused_train_apply_grad_parity_interpret():
    """jax.grad of an FM-style loss through dit_fused_apply(train_vjp=True)
    vs through model.apply — full DiT, f32 master params."""
    model = DiT(img_resolution=16, patch_size=2, in_channels=4,
                hidden_size=128, depth=2, num_heads=4, num_classes=1,
                dtype=jnp.bfloat16, scan_blocks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 16, 16, 4))
    t = jnp.linspace(0.2, 0.8, 4)
    params = model.init(jax.random.PRNGKey(1), t, x, None)
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(2), len(leaves))
    leaves = [jax.random.normal(k, l.shape, l.dtype) * 0.05
              for k, l in zip(keys, leaves)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)
    target = jax.random.normal(jax.random.PRNGKey(3), x.shape)

    def loss_module(p):
        return jnp.mean(jnp.square(model.apply(p, t, x) - target))

    def loss_fused(p):
        v = dit_fused_apply(model, p, t, x, None, samples_per_cell=2,
                            train_vjp=True, bwd_samples_per_cell=2)
        return jnp.mean(jnp.square(v - target))

    l_r, g_r = jax.value_and_grad(loss_module)(params)
    with pltpu.force_tpu_interpret_mode():
        l_f, g_f = jax.value_and_grad(loss_fused)(params)

    assert abs(float(l_f) - float(l_r)) < 0.02 * max(1.0, abs(float(l_r)))
    flat_r = jax.tree_util.tree_flatten_with_path(g_r)[0]
    flat_f = jax.tree_util.tree_flatten_with_path(g_f)[0]
    assert len(flat_r) == len(flat_f)
    for (path_r, a), (path_f, b) in zip(flat_r, flat_f):
        assert path_r == path_f
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        denom = max(np.abs(a).max(), 1e-4)
        rel = np.abs(a - b).max() / denom
        assert rel < 0.08, (jax.tree_util.keystr(path_r), rel)


def test_fused_forward_null_label_interpret():
    """y=None must route to the null label exactly like the module path."""
    model = DiT(img_resolution=8, patch_size=2, in_channels=4,
                hidden_size=64, depth=2, num_heads=4, num_classes=1,
                dtype=jnp.bfloat16, scan_blocks=True)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4))
    t = jnp.array([0.2, 0.7])
    params = model.init(jax.random.PRNGKey(1), t, x, None)
    want = model.apply(params, t, x, None)
    with pltpu.force_tpu_interpret_mode():
        got = dit_fused_apply(model, cast_params_bf16(params), t, x, None)
    w = np.asarray(want, np.float32)
    g = np.asarray(got, np.float32)
    denom = max(1e-3, float(np.abs(w).max()))
    assert float(np.abs(g - w).max()) / denom < 0.05
