"""DiT model tests: shapes, zero-init identity, CFG, scan/loop equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from lfm_tpu.nn.dit import DIT_CONFIGS, DiT, create_dit


def _init(model, n=2, res=8, c=4, classes=False):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (n, res, res, c))
    t = jnp.linspace(0.1, 0.9, n)
    y = jnp.arange(n) % max(model.num_classes, 1) if classes else None
    params = model.init(key, t, x, y)
    return params, t, x, y


def test_forward_shape_small():
    model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=2,
                num_heads=4, num_classes=1)
    params, t, x, _ = _init(model)
    out = model.apply(params, t, x)
    assert out.shape == x.shape
    assert jnp.all(jnp.isfinite(out))


def test_zero_init_gives_zero_output():
    """adaLN-zero + zero final layer => v(t,x) == 0 at init
    (reference models/DiT.py:219-228)."""
    model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=2,
                num_heads=4, num_classes=1)
    params, t, x, _ = _init(model)
    out = model.apply(params, t, x)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)


def test_scan_equals_loop():
    kw = dict(img_resolution=8, patch_size=2, hidden_size=64, depth=3,
              num_heads=4, num_classes=1)
    m_scan = DiT(scan_blocks=True, **kw)
    m_loop = DiT(scan_blocks=False, **kw)
    params_scan, t, x, _ = _init(m_scan)

    # restack scan params into per-block params for the loop model
    blocks = params_scan["params"]["blocks"]["block"]
    loop_params = {k: v for k, v in params_scan["params"].items() if k != "blocks"}
    for i in range(3):
        loop_params[f"blocks_{i}"] = jax.tree_util.tree_map(lambda a: a[i], blocks)

    # randomize so the outputs are non-trivial (zero-init otherwise)
    key = jax.random.PRNGKey(5)
    params_scan = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(key, a.shape, a.dtype), params_scan
    )
    blocks = params_scan["params"]["blocks"]["block"]
    loop_params = {k: v for k, v in params_scan["params"].items() if k != "blocks"}
    for i in range(3):
        loop_params[f"blocks_{i}"] = jax.tree_util.tree_map(lambda a: a[i], blocks)

    out_scan = m_scan.apply(params_scan, t, x)
    out_loop = m_loop.apply({"params": loop_params}, t, x)
    np.testing.assert_allclose(np.asarray(out_scan), np.asarray(out_loop), atol=1e-5)


def test_class_conditional_and_null_label():
    model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=2,
                num_heads=4, num_classes=10, label_dropout=0.1)
    params, t, x, y = _init(model, classes=True)
    tbl = params["params"]["y_embedder"]["embedding"]
    assert tbl.shape[0] == 11  # CFG null row
    out = model.apply(params, t, x, y)
    assert out.shape == x.shape
    # y=None uses the null label
    out_null = model.apply(params, t, x, None)
    assert out_null.shape == x.shape


def test_forward_with_cfg_halves_match():
    model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=2,
                num_heads=4, num_classes=10, label_dropout=0.1)
    key = jax.random.PRNGKey(0)
    n = 2
    x = jax.random.normal(jax.random.PRNGKey(1), (n, 8, 8, 4))
    x2 = jnp.concatenate([x, x], axis=0)
    y = jnp.concatenate([jnp.array([3, 7]), jnp.array([10, 10])])
    t = jnp.full((2 * n,), 0.5)
    params = model.init(key, t, x2, y)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.02 * jax.random.normal(key, a.shape, a.dtype), params
    )
    out = model.forward_with_cfg(params, t, x2, y, cfg_scale=1.5)
    assert out.shape == x2.shape
    np.testing.assert_allclose(np.asarray(out[:n]), np.asarray(out[n:]), atol=1e-6)
    # cfg_scale=1 reduces to the conditional output
    out1 = model.forward_with_cfg(params, t, x2, y, cfg_scale=1.0)
    cond = model.apply(params, t, x2, y)[:n]
    np.testing.assert_allclose(np.asarray(out1[:n]), np.asarray(cond), atol=1e-5)


def test_all_configs_build():
    for name, (depth, hidden, patch, heads) in DIT_CONFIGS.items():
        m = create_dit(name, img_resolution=32)
        assert m.depth == depth and m.hidden_size == hidden
        assert m.patch_size == patch and m.num_heads == heads


def test_ditl2_param_count():
    """DiT-L/2 must have the reference's ~458M parameters (SURVEY.md §2.3)."""
    m = create_dit("DiT-L/2", img_resolution=32, num_classes=1)
    params = jax.eval_shape(
        lambda: m.init(jax.random.PRNGKey(0), jnp.zeros((1,)), jnp.zeros((1, 32, 32, 4)), None)
    )
    n = sum(np.prod(l.shape) for l in jax.tree_util.tree_leaves(params))
    assert 4.4e8 < n < 4.8e8, f"DiT-L/2 has {n:,} params"


def test_label_dropout_training():
    model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=1,
                num_heads=4, num_classes=10, label_dropout=0.5)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4))
    t = jnp.full((8,), 0.5)
    y = jnp.zeros((8,), jnp.int32)
    params = model.init({"params": key, "label_dropout": key}, t, x, y, train=True)
    # train=True with dropout must require the rng and not crash
    out = model.apply(params, t, x, y, train=True, rngs={"label_dropout": key})
    assert out.shape == x.shape


def test_bf16_policy():
    model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=2,
                num_heads=4, num_classes=1, dtype=jnp.bfloat16)
    params, t, x, _ = _init(model)
    out = model.apply(params, t, x)
    assert out.dtype == jnp.float32  # cast back at the boundary
    # params stay f32
    leaves = jax.tree_util.tree_leaves(params)
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_remat_policy_gradient_parity():
    """remat with the "dots" selective policy must give the same loss and
    gradients as full-block remat (policy only changes what is saved)."""
    def grads(policy):
        model = DiT(img_resolution=8, patch_size=2, hidden_size=64, depth=2,
                    num_heads=4, num_classes=1, remat=True, remat_policy=policy)
        params, t, x, _ = _init(model)

        def loss(p):
            return jnp.mean(jnp.square(model.apply(p, t, x) - x))

        return jax.grad(loss)(params)

    g_full = grads(None)
    for policy in ("dots", "dots_attn"):
        g_pol = grads(policy)
        for a, b in zip(jax.tree_util.tree_leaves(g_full),
                        jax.tree_util.tree_leaves(g_pol)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-6)
