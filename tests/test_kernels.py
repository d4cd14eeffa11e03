"""Pallas kernel tests (interpret mode on CPU; real TPU runs are exercised
by bench/verify scripts)."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lfm_tpu.kernels.flash_attention import (
    _flash_kernel,
    _pick_block,
    reference_attention,
)


def _flash_interpret(q, k, v, bq=64, bk=64):
    """Run the flash kernel in pallas interpret mode (CPU-safe)."""
    import math

    n, t, h, d = q.shape
    scale = 1.0 / math.sqrt(d)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(n * h, t, d)

    out = pl.pallas_call(
        functools.partial(_flash_kernel, bk=bk, scale=scale),
        grid=(n * h, t // bq),
        in_specs=[
            pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((1, t, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n * h, t, d), q.dtype),
        interpret=True,
    )(to_bh(q), to_bh(k), to_bh(v))
    return out.reshape(n, h, t, d).transpose(0, 2, 1, 3)


@pytest.mark.parametrize("t,bq,bk", [(128, 64, 64), (256, 128, 256), (64, 64, 32)])
def test_flash_matches_reference(t, bq, bk):
    rng = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(rng, 3)
    n, h, d = 2, 4, 64
    q = jax.random.normal(kq, (n, t, h, d))
    k = jax.random.normal(kk, (n, t, h, d))
    v = jax.random.normal(kv, (n, t, h, d))
    want = reference_attention(q, k, v)
    got = _flash_interpret(q, k, v, bq=bq, bk=bk)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_flash_bf16_io():
    rng = jax.random.PRNGKey(1)
    kq, kk, kv = jax.random.split(rng, 3)
    q = jax.random.normal(kq, (1, 128, 2, 64), jnp.bfloat16)
    k = jax.random.normal(kk, (1, 128, 2, 64), jnp.bfloat16)
    v = jax.random.normal(kv, (1, 128, 2, 64), jnp.bfloat16)
    want = reference_attention(q.astype(jnp.float32), k.astype(jnp.float32),
                               v.astype(jnp.float32))
    got = _flash_interpret(q, k, v)
    assert got.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(got, np.float32), np.asarray(want),
                               rtol=2e-2, atol=2e-2)


def test_pick_block():
    assert _pick_block(256, 512) == 256
    assert _pick_block(1024, 512) == 512
    assert _pick_block(100, 64) == 50


def test_dit_attention_flash_flag():
    """DiT with use_flash must agree with the einsum path (interpret mode)."""
    from lfm_tpu.nn.layers import Attention

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 128))
    a_plain = Attention(128, 4, use_flash=False)
    params = a_plain.init(jax.random.PRNGKey(1), x)
    want = a_plain.apply(params, x)

    a_flash = Attention(128, 4, use_flash=True)
    with pltpu.force_tpu_interpret_mode():
        got = a_flash.apply(params, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-5, atol=2e-5)


def test_groupnorm_silu_matches_reference_and_flax():
    from flax import linen as nn

    from lfm_tpu.kernels.groupnorm_silu import (
        _gn_silu_kernel,
        groupnorm_silu,
        reference_groupnorm_silu,
    )

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, 8, 64)).astype(np.float32))
    scale = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))
    bias = jnp.asarray(rng.normal(size=(64,)).astype(np.float32))

    want = reference_groupnorm_silu(x, scale, bias, groups=32)
    # flax GroupNorm + silu as independent ground truth
    gn = nn.GroupNorm(num_groups=32, epsilon=1e-5)
    flax_out = jax.nn.silu(gn.apply({"params": {"scale": scale, "bias": bias}}, x))
    np.testing.assert_allclose(np.asarray(want), np.asarray(flax_out),
                               rtol=1e-5, atol=1e-5)

    import functools as ft

    n, h, w, c = x.shape
    got = pl.pallas_call(
        ft.partial(_gn_silu_kernel, groups=32, eps=1e-5),
        grid=(n,),
        in_specs=[
            pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, h * w, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, h * w, c), x.dtype),
        interpret=True,
    )(x.reshape(n, h * w, c), scale.reshape(1, c), bias.reshape(1, c))
    np.testing.assert_allclose(np.asarray(got.reshape(x.shape)), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_fused_attention_dispatch_and_grad():
    """fused_attention: CPU falls back to the reference path; the custom
    VJP must equal autodiff through reference_attention."""
    from lfm_tpu.kernels.flash_attention import fused_attention, reference_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 64, 4, 32))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 64, 4, 32))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 64, 4, 32))

    np.testing.assert_allclose(np.asarray(fused_attention(q, k, v)),
                               np.asarray(reference_attention(q, k, v)),
                               rtol=1e-6, atol=1e-6)

    def loss_fused(q, k, v):
        return jnp.sum(jnp.square(fused_attention(q, k, v)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.square(reference_attention(q, k, v)))

    g1 = jax.grad(loss_fused, argnums=(0, 1, 2))(q, k, v)
    g2 = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-5)


def test_attention_small_bwd_interpret_mode_parity():
    """Pallas backward kernel (interpret mode) vs autodiff through the
    einsum reference — dq, dk, dv all match."""
    from lfm_tpu.kernels.flash_attention import attention_small_bwd, reference_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 4, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 4, 64))
    do = jax.random.normal(jax.random.PRNGKey(3), (2, 128, 4, 64))

    _, vjp = jax.vjp(reference_attention, q, k, v)
    want = vjp(do)
    with pltpu.force_tpu_interpret_mode():
        got = attention_small_bwd(q, k, v, do)
    for a, b in zip(got, want):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-5)


def test_attention_small_interpret_mode_parity():
    """The small-T whole-sequence kernel itself (interpret mode) vs einsum."""
    from lfm_tpu.kernels.flash_attention import attention_small, reference_attention

    q = jax.random.normal(jax.random.PRNGKey(0), (2, 128, 4, 64))
    k = jax.random.normal(jax.random.PRNGKey(1), (2, 128, 4, 64))
    v = jax.random.normal(jax.random.PRNGKey(2), (2, 128, 4, 64))
    with pltpu.force_tpu_interpret_mode():
        got = attention_small(q, k, v)
    want = reference_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pallas_gate_assume_local(monkeypatch):
    """Inside a shard_map body device_count() is still the mesh size, so the
    dispatch gate must honor the assume_local context (ADVICE r2: without it
    the train-side shard_map wrapper never engaged the Pallas kernels)."""
    from lfm_tpu.kernels import flash_attention as fa

    monkeypatch.setattr(fa.jax, "default_backend", lambda: "tpu")
    # CPU suite runs with 8 virtual devices -> gate closed by default
    assert fa.jax.device_count() == 8
    assert not fa._pallas_ok()
    with fa.assume_local_devices():
        assert fa._pallas_ok()
        with fa.assume_local_devices():
            assert fa._pallas_ok()
        assert fa._pallas_ok()  # nesting restores, not clears
    assert not fa._pallas_ok()
    # off-TPU the context must NOT open the gate
    monkeypatch.setattr(fa.jax, "default_backend", lambda: "cpu")
    with fa.assume_local_devices():
        assert not fa._pallas_ok()
