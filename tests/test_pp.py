"""Pipeline parallelism: core/pipeline.py + the pp DiT wrapper vs their
unsharded forms on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import PartitionSpec as P

from lfm_tpu.core.pipeline import pipeline_blocks
from lfm_tpu.core.sharding import DATA_AXIS, PIPE_AXIS, make_mesh
from lfm_tpu.nn.dit import DiT
from lfm_tpu.sample.pp import make_pp_apply, pp_param_shardings


def tiny_dit(depth=4, **kw):
    kw.setdefault("img_resolution", 8)
    kw.setdefault("patch_size", 2)
    kw.setdefault("in_channels", 4)
    kw.setdefault("hidden_size", 64)
    kw.setdefault("num_heads", 4)
    kw.setdefault("num_classes", 1)
    return DiT(depth=depth, **kw)


def test_pipeline_blocks_matches_sequential():
    """The generic primitive on a toy stack: per-block W matmul + c bias."""
    depth, b, t, d = 8, 4, 6, 16
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.normal(size=(depth, d, d)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

    def block(wi, xb, cb):
        return jnp.tanh(xb @ wi + cb[:, None, :])

    want = x
    for i in range(depth):
        want = block(w[i], want, c)

    def apply_stage(w_loc, xb, cb):
        def body(carry, wi):
            return block(wi, carry, cb), None
        out, _ = jax.lax.scan(body, xb, w_loc)
        return out

    for pp, mb in [(4, None), (4, 2), (8, 4)]:
        mesh = make_mesh(dp=1, pp=pp, devices=jax.devices()[:pp])
        fn = shard_map(
            lambda w_, x_, c_: pipeline_blocks(
                apply_stage, w_, x_, c_, PIPE_AXIS, mb),
            mesh=mesh, in_specs=(P(PIPE_AXIS), P(), P()), out_specs=P(),
            check_vma=False)
        got = jax.jit(fn)(w, x, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"pp={pp} mb={mb}")


def test_pp_dit_matches_unsharded():
    """depth-4 DiT over pp=4 x dp=2: same outputs, same (replicated) params."""
    mesh = make_mesh(dp=2, pp=4)
    model = tiny_dit()
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(8,)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), t, x, None)

    want = model.apply(params, t, x)
    apply_pp = make_pp_apply(model, mesh, has_labels=False)
    got = jax.jit(apply_pp)(params, t, x)
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_dit_labels_microbatches_and_placement():
    """Labels + explicit microbatch count + params PLACED per the pp
    shardings (blocks' depth axis sharded over pipe)."""
    mesh = make_mesh(dp=2, pp=4)
    model = tiny_dit(num_classes=10)
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(8,)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(8,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), t, x, y)

    want = model.apply(params, t, x, y)
    placed = jax.tree_util.tree_map(
        jax.device_put, params, pp_param_shardings(model, params, mesh))
    apply_pp = make_pp_apply(model, mesh, num_microbatches=2)
    got = jax.jit(apply_pp)(placed, t, x, y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)


def test_pp_grads_match_unsharded():
    """jax.grad through the pipelined forward == grads of the plain model
    for every parameter (stage-local block grads reassemble exactly)."""
    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    model = tiny_dit(hidden_size=32, num_heads=2)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(4,)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(4, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), t, x, None)

    apply_pp = make_pp_apply(model, mesh, has_labels=False)
    g_pp = jax.jit(jax.grad(lambda p: jnp.sum(apply_pp(p, t, x) * co)))(params)
    g_ref = jax.jit(jax.grad(lambda p: jnp.sum(model.apply(p, t, x) * co)))(params)

    flat_pp = jax.tree_util.tree_leaves_with_path(g_pp)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_pp) == len(flat_ref)
    for (path, a), b in zip(flat_pp, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_pp_train_step_matches_plain():
    """One full train step (FM loss + AdamW + EMA) with the network evaluated
    through the pipeline == the plain step, same key (exactness like
    tests/test_train_sample.py pins for the dp shard_map path)."""
    from lfm_tpu.core.config import TrainConfig
    from lfm_tpu.train.state import create_train_state, make_optimizer
    from lfm_tpu.train.train import make_train_step

    mesh = make_mesh(dp=2, pp=4)
    model = tiny_dit(hidden_size=32, num_heads=2)
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), None)
    cfg = TrainConfig(lr=1e-3, no_lr_decay=True, use_ema=True)
    tx = make_optimizer(cfg, steps_per_epoch=10)

    def plain_apply(p, t, z, y, rngs=None):
        return model.apply(p, t, z, y)

    pp_apply = make_pp_apply(model, mesh, train=True)

    batch = {"x": jnp.asarray(np.random.default_rng(4).normal(
        size=(8, 8, 8, 4)).astype(np.float32))}
    key = jax.random.PRNGKey(7)

    outs = {}
    for name, apply in [("plain", plain_apply), ("pp", pp_apply)]:
        step = make_train_step(apply, tx, use_ema=True, scale_factor=1.0)
        state = create_train_state(params, cfg, steps_per_epoch=10)
        new_state, metrics = jax.jit(step)(state, batch, key)
        outs[name] = (float(metrics.loss), new_state.params)

    assert np.isfinite(outs["pp"][0])
    np.testing.assert_allclose(outs["pp"][0], outs["plain"][0], rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(outs["pp"][1]),
                    jax.tree_util.tree_leaves(outs["plain"][1])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_pp_sampler_end_to_end_matches_plain():
    """make_sampler(pp_mesh=...) through the full ODE loop (euler + CFG)
    produces the same latents as the unsharded sampler."""
    from lfm_tpu.core.config import Config, ModelConfig, SampleConfig
    from lfm_tpu.sample.sample import make_sampler

    mesh = make_mesh(dp=2, pp=4)
    model = tiny_dit(hidden_size=32, num_heads=2, num_classes=10,
                     label_dropout=0.1)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 8, 8, 4)).astype(np.float32))
    y = jnp.asarray(rng.integers(0, 10, size=(4,)).astype(np.int32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32))
    config = Config(
        model=ModelConfig(model_type="DiT-T/2", image_size=64, num_classes=10),
        sample=SampleConfig(method="euler", num_steps=4, cfg_scale=1.5),
    )
    plain = make_sampler(config, model, params, jit=True)
    pp = make_sampler(config, model, params, jit=True, pp_mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(pp(x, y).latents), np.asarray(plain(x, y).latents),
        rtol=2e-4, atol=2e-4)


def test_pp_rejects_bad_configs():
    mesh = make_mesh(dp=2, pp=4)
    with pytest.raises(AssertionError):  # depth 2 not divisible by 4 stages
        make_pp_apply(tiny_dit(depth=2), mesh)
    with pytest.raises(AssertionError):  # label dropout needs rng per stage
        make_pp_apply(tiny_dit(num_classes=10, label_dropout=0.1), mesh,
                      train=True)


def test_interleaved_pipeline_matches_sequential():
    """The interleaved primitive on the same toy stack: every (S, v, M)
    combination reproduces the sequential result. Chunk layout: device d
    holds virtual stages k*S + d, chunk-major in its local slab."""
    from lfm_tpu.core.pipeline import pipeline_blocks_interleaved

    depth, b, t, d = 16, 8, 6, 16
    rng = np.random.default_rng(10)
    w = jnp.asarray(rng.normal(size=(depth, d, d)).astype(np.float32) * 0.1)
    x = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    c = jnp.asarray(rng.normal(size=(b, d)).astype(np.float32))

    def block(wi, xb, cb):
        return jnp.tanh(xb @ wi + cb[:, None, :])

    want = x
    for i in range(depth):
        want = block(w[i], want, c)

    def apply_chunk(w_chunk, xb, cb):
        def body(carry, wi):
            return block(wi, carry, cb), None
        out, _ = jax.lax.scan(body, xb, w_chunk)
        return out

    for pp, v, mb in [(4, 2, None), (4, 2, 8), (2, 4, 4), (4, 4, 4),
                      (4, 1, 4), (8, 2, 8)]:
        lc = depth // (pp * v)
        # canonical depth order -> interleaved placement order
        w_il = jnp.swapaxes(w.reshape(v, pp, lc, d, d), 0, 1).reshape(
            depth, d, d)
        mesh = make_mesh(dp=1, pp=pp, devices=jax.devices()[:pp])
        fn = shard_map(
            lambda w_, x_, c_: pipeline_blocks_interleaved(
                apply_chunk,
                jax.tree_util.tree_map(
                    lambda p: p.reshape(v, lc, *p.shape[1:]), w_),
                x_, c_, PIPE_AXIS, v, mb),
            mesh=mesh, in_specs=(P(PIPE_AXIS), P(), P()), out_specs=P(),
            check_vma=False)
        got = jax.jit(fn)(w_il, x, c)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"pp={pp} v={v} mb={mb}")


def test_interleaved_pp_dit_matches_unsharded():
    """depth-8 DiT, pp=4 x dp=2, v=2 virtual chunks: same outputs as the
    plain model after interleave_block_params; grads match after the
    inverse permutation."""
    from lfm_tpu.sample.pp import (deinterleave_block_params,
                                   interleave_block_params)

    mesh = make_mesh(dp=2, pp=4)
    model = tiny_dit(depth=8, hidden_size=32, num_heads=2)
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 8, 8, 4)).astype(np.float32))
    t = jnp.asarray(rng.uniform(size=(8,)).astype(np.float32))
    co = jnp.asarray(rng.normal(size=(8, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), t, x, None)

    il = interleave_block_params(params, 4, 2)
    # round-trip sanity
    for a, b in zip(jax.tree_util.tree_leaves(
            deinterleave_block_params(il, 4, 2)),
            jax.tree_util.tree_leaves(params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    want = model.apply(params, t, x)
    apply_il = make_pp_apply(model, mesh, has_labels=False, num_chunks=2)
    got = jax.jit(apply_il)(il, t, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-5)

    g_il = jax.jit(jax.grad(lambda p: jnp.sum(apply_il(p, t, x) * co)))(il)
    g_ref = jax.jit(jax.grad(
        lambda p: jnp.sum(model.apply(p, t, x) * co)))(params)
    flat_il = jax.tree_util.tree_leaves_with_path(
        deinterleave_block_params(g_il, 4, 2))
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    assert len(flat_il) == len(flat_ref)
    for (path, a), b in zip(flat_il, flat_ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(path))


def test_interleaved_rejects_bad_microbatches():
    from lfm_tpu.core.pipeline import pipeline_blocks_interleaved

    mesh = make_mesh(dp=1, pp=4, devices=jax.devices()[:4])
    w = jnp.zeros((4, 2, 8, 8))
    x = jnp.zeros((6, 3, 8))
    c = jnp.zeros((6, 8))
    fn = shard_map(
        lambda w_, x_, c_: pipeline_blocks_interleaved(
            lambda p, xb, cb: xb, w_, x_, c_, PIPE_AXIS, 2, 6),
        mesh=mesh, in_specs=(P(PIPE_AXIS), P(), P()), out_specs=P(),
        check_vma=False)
    with pytest.raises(AssertionError):  # 6 % 4 != 0
        jax.jit(fn)(w, x, c)


def test_pp_sampler_interleaved_chunks_matches():
    """make_sampler with config.mesh.pp_chunks=2: the sampler permutes the
    canonical params into placement order internally and the interleaved
    schedule reproduces the contiguous-pp (and plain) latents."""
    import dataclasses

    from lfm_tpu.core.config import Config, MeshConfig, ModelConfig, SampleConfig
    from lfm_tpu.sample.sample import make_sampler

    mesh = make_mesh(dp=2, pp=4)
    model = tiny_dit(depth=8, hidden_size=32, num_heads=2)
    rng = np.random.default_rng(7)
    # 16 samples / dp=2 -> 8 per shard; m defaults to S=4 microbatches
    x = jnp.asarray(rng.normal(size=(16, 8, 8, 4)).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), jnp.zeros((1,)),
                        jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32))
    config = Config(
        model=ModelConfig(model_type="DiT-T/2", image_size=64, num_classes=1),
        sample=SampleConfig(method="euler", num_steps=4),
    )
    plain = make_sampler(config, model, params, jit=True)
    il_cfg = dataclasses.replace(config, mesh=MeshConfig(pp=4, pp_chunks=2))
    il = make_sampler(il_cfg, model, params, jit=True, pp_mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(il(x).latents), np.asarray(plain(x).latents),
        rtol=2e-4, atol=2e-4)


def test_loop_train_pp_interleaved_matches_plain(tmp_path):
    """Loop-level pipelined training (config.mesh.pp=2, pp_chunks=2, via
    train/loop.py): the pp run's params, EMA, and checkpoints are CANONICAL
    and match a plain dp-only run step for step — including a resume through
    a content checkpoint (placement permutation round-trips through disk)."""
    import dataclasses

    from lfm_tpu.core.config import (Config, MeshConfig, ModelConfig,
                                     TrainConfig)
    from lfm_tpu.train.loop import train

    class TinyLatents:
        num_classes = 1

        def __len__(self):
            return 16

        def __getitem__(self, i):
            rng = np.random.default_rng(100 + i)
            return rng.normal(size=(8, 8, 4)).astype(np.float32), 0

    def cfg(exp, mesh_cfg, num_epoch=1, resume=False):
        return Config(
            exp=exp, dataset="synthetic_latent", output_dir=str(tmp_path),
            model=ModelConfig(model_type="DiT-T4/2", image_size=64,
                              num_classes=1),
            mesh=mesh_cfg,
            train=TrainConfig(batch_size=8, num_epoch=num_epoch, lr=1e-3,
                              no_lr_decay=True, use_ema=True,
                              save_content=True, save_content_every=1,
                              save_ckpt_every=1, plot_every=100,
                              precision="f32", resume=resume),
        )

    quiet = lambda *a: None  # noqa: E731
    plain = train(cfg("pp_plain", MeshConfig()), dataset=TinyLatents(),
                  log_fn=quiet)
    pp_cfg = MeshConfig(pp=2, pp_chunks=2)
    pp1 = train(cfg("pp_il", pp_cfg, num_epoch=0), dataset=TinyLatents(),
                log_fn=quiet)
    assert int(pp1.step) == 2
    # resume from the content checkpoint (written canonical, re-permuted on
    # load) and finish the second epoch
    pp2 = train(cfg("pp_il", pp_cfg, num_epoch=1, resume=True),
                dataset=TinyLatents(), log_fn=quiet)
    assert int(pp2.step) == int(plain.step) == 4
    for what, a, b in (("params", pp2.params, plain.params),
                       ("ema", pp2.ema_params, plain.ema_params)):
        fa = jax.tree_util.tree_leaves_with_path(a)
        fb = jax.tree_util.tree_leaves(b)
        assert len(fa) == len(fb)
        for (path, la), lb in zip(fa, fb):
            np.testing.assert_allclose(
                np.asarray(la), np.asarray(lb), rtol=5e-4, atol=1e-5,
                err_msg=f"{what}:{jax.tree_util.keystr(path)}")
