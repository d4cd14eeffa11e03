"""Pipeline-parallel DiT evaluation: block stages over the ``pipe`` mesh axis.

Beyond-reference scaling path (the reference replicates the whole network
per GPU, ddp_utils.py:17-30): a DiT too large for one chip's HBM runs with
its block stack split into contiguous stages over the mesh's ``pipe`` axis —
each device holds depth/S blocks — and microbatches flowing stage-to-stage
on ICI via the ``lax.ppermute`` pipeline in core/pipeline.py.

The parameter TREE is identical to the unsharded model (converted reference
checkpoints load unchanged); only the placement differs: the scanned block
stack's leading depth axis is sharded over ``pipe`` (``pp_param_specs``),
so per-device parameter memory scales 1/S. The cheap embedders / final layer
(<1% of FLOPs and params, dit.py:240-247,273-274) are replicated and run
redundantly on every stage — SPMD-friendlier than hosting them on one stage.

Differentiable: used both by the sampler and as ``model_apply`` inside
``train.make_train_step`` (grads of replicated params psum over the pipe
axis via the shard_map transpose; block grads stay stage-local).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lfm_tpu.core.pipeline import pipeline_blocks, pipeline_blocks_interleaved
from lfm_tpu.core.sharding import DATA_AXIS, PIPE_AXIS

__all__ = ["make_pp_apply", "pp_param_specs", "pp_param_shardings",
           "interleave_block_params", "deinterleave_block_params",
           "permute_state_blocks", "pp_state_shardings"]


def _permute_blocks(params, n_stages: int, num_chunks: int, inverse: bool):
    def fix(tree, under_blocks):
        if isinstance(tree, dict):
            return {k: fix(v, under_blocks or k == "blocks")
                    for k, v in tree.items()}
        if not under_blocks:
            return tree
        depth = tree.shape[0]
        assert depth % (n_stages * num_chunks) == 0, (
            f"depth {depth} not divisible into {n_stages} stages x "
            f"{num_chunks} chunks")
        lc = depth // (n_stages * num_chunks)
        if inverse:
            t = tree.reshape(n_stages, num_chunks, lc, *tree.shape[1:])
            t = jnp.swapaxes(t, 0, 1)
        else:
            t = tree.reshape(num_chunks, n_stages, lc, *tree.shape[1:])
            t = jnp.swapaxes(t, 0, 1)
        return t.reshape(depth, *tree.shape[1:])

    return fix(params, False)


def interleave_block_params(params, n_stages: int, num_chunks: int):
    """Permute the ``blocks`` depth axis from the canonical checkpoint
    order into the interleaved-pipeline placement order: after sharding the
    leading axis over ``pipe``, device d's contiguous slab holds its
    ``num_chunks`` virtual stages k*S + d (chunk-major). The tree structure
    is unchanged — apply this AFTER loading a (converted reference)
    checkpoint and BEFORE device placement; invert with
    ``deinterleave_block_params`` before saving."""
    return _permute_blocks(params, n_stages, num_chunks, inverse=False)


def deinterleave_block_params(params, n_stages: int, num_chunks: int):
    """Inverse of ``interleave_block_params`` (canonical order restore)."""
    return _permute_blocks(params, n_stages, num_chunks, inverse=True)


def _under_blocks(path) -> bool:
    return any(getattr(k, "key", getattr(k, "name", None)) == "blocks"
               for k in path)


def permute_state_blocks(tree, n_stages: int, num_chunks: int, *,
                         inverse: bool = False):
    """``interleave_block_params`` generalized to ANY pytree (e.g. a full
    TrainState: params + EMA + optax moment trees all mirror the param
    structure): every array leaf under a ``blocks`` key has its leading
    depth axis permuted between canonical checkpoint order and interleaved
    pipeline placement order. Non-``blocks`` leaves (step counters, embedder
    params, schedule state) pass through unchanged."""
    if num_chunks <= 1:
        return tree

    def fix(path, x):
        if not _under_blocks(path) or getattr(x, "ndim", 0) == 0:
            return x
        depth = x.shape[0]
        assert depth % (n_stages * num_chunks) == 0, (
            f"depth {depth} not divisible into {n_stages} stages x "
            f"{num_chunks} chunks")
        lc = depth // (n_stages * num_chunks)
        if inverse:
            t = x.reshape(n_stages, num_chunks, lc, *x.shape[1:])
        else:
            t = x.reshape(num_chunks, n_stages, lc, *x.shape[1:])
        return jnp.swapaxes(t, 0, 1).reshape(depth, *x.shape[1:])

    return jax.tree_util.tree_map_with_path(fix, tree)


def pp_state_shardings(state, mesh: Mesh, *, pipe_axis: str = PIPE_AXIS):
    """NamedSharding pytree for a full TrainState under pipeline
    parallelism: every array leaf under a ``blocks`` key (params, EMA, optax
    moments — they all mirror the param tree) shards its leading depth axis
    over ``pipe`` (1/S per-device block memory, matching ``make_pp_apply``'s
    shard_map in_specs so jit never gathers them); everything else
    replicates."""
    def walk(path, x):
        spec = (P(pipe_axis) if _under_blocks(path) and getattr(x, "ndim", 0)
                else P())
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(walk, state)


def pp_param_specs(model, params):
    """PartitionSpec pytree for the DiT params: the scanned ``blocks``
    subtree shards its leading (depth) axis over ``pipe``; everything else
    replicates. Shapes the in_specs of the shard_map AND (via
    ``pp_param_shardings``) the recommended device_put placement."""
    del model

    def walk(tree, under_blocks):
        if isinstance(tree, dict):
            return {k: walk(v, under_blocks or k == "blocks")
                    for k, v in tree.items()}
        return P(PIPE_AXIS) if under_blocks else P()

    return walk(params, False)


def pp_param_shardings(model, params, mesh: Mesh):
    """NamedSharding pytree matching ``pp_param_specs`` — place params with
    this to get 1/S per-device block-parameter memory."""
    return jax.tree_util.tree_map(
        lambda s: NamedSharding(mesh, s), pp_param_specs(model, params))


def make_pp_apply(model, mesh: Mesh, *, data_axis: str = DATA_AXIS,
                  pipe_axis: str = PIPE_AXIS, has_labels: bool = True,
                  num_microbatches: Optional[int] = None, train: bool = False,
                  num_chunks: int = 1):
    """Wrap a scanned DiT into apply(params, t, x[, y]) over GLOBAL arrays
    with the block stack pipelined over ``mesh[pipe_axis]``.

    x: (N, H, W, C) latents sharded P(data) (replicated over pipe); params
    laid out per ``pp_param_shardings``. N/dp must divide into the
    microbatch count (default: the stage count S). Jit the result or call
    it inside an outer jit (e.g. as the train step's model_apply).

    ``num_chunks`` > 1 selects the interleaved virtual-stage schedule
    (core/pipeline.py::pipeline_blocks_interleaved — bubble /= num_chunks):
    the blocks' depth axis must then be pre-permuted with
    ``interleave_block_params(params, S, num_chunks)`` before placement.
    """
    from flax import linen as nn

    from lfm_tpu.nn.dit import FinalLayer, _ScanBlock
    from lfm_tpu.nn.layers import (LabelEmbedder, PatchEmbed, TimestepEmbedder,
                                   get_2d_sincos_pos_embed)

    assert model.scan_blocks and model.sp_axis is None, (
        "pipeline parallelism needs the scanned, non-sequence-parallel DiT")
    n_stages = mesh.shape[pipe_axis]
    assert model.depth % (n_stages * num_chunks) == 0, (
        f"depth {model.depth} not divisible by {n_stages} pipeline stages "
        f"x {num_chunks} chunks")
    assert not (train and model.label_dropout > 0), (
        "label dropout under pp would need per-stage rng plumbing; train the "
        "CFG-dropout recipe with dp/fsdp/tp instead")
    local_depth = model.depth // n_stages
    chunk_depth = local_depth // num_chunks

    stage = nn.scan(
        _ScanBlock,
        variable_axes={"params": 0},
        split_rngs={"params": True},
        in_axes=nn.broadcast,
        length=chunk_depth,
        unroll=model.scan_unroll,
        metadata_params={nn.meta.PARTITION_NAME: None},
    )(model.hidden_size, model.num_heads, model.mlp_ratio, dtype=model.dtype,
      use_flash=model.use_flash, remat=model.remat,
      remat_policy=model.remat_policy)

    def apply_stage(block_p, x_mb, c_mb):
        out, _ = stage.apply({"params": block_p}, x_mb, c_mb)
        return out

    g = model.img_resolution // model.patch_size

    def local_apply(embed_p, block_p, t, x, y):
        # per-shard body has single-device semantics: enable the Pallas
        # attention dispatch inside the shard (train.py:110-117 pattern)
        from lfm_tpu.kernels.flash_attention import assume_local_devices

        with assume_local_devices():
            n = x.shape[0]
            t = jnp.broadcast_to(jnp.asarray(t, jnp.float32).reshape(-1), (n,))
            if y is None:
                y = jnp.full((n,), model.null_label, jnp.int32)
            # embedders: replicated params, redundant per-stage compute
            # (mirrors dit.py:227-247 exactly — parity pinned in test_pp.py)
            tok = PatchEmbed(model.patch_size, model.hidden_size,
                             dtype=model.dtype).apply(
                {"params": embed_p["x_embedder"]}, x.astype(model.dtype))
            pos = get_2d_sincos_pos_embed(model.hidden_size, g)
            tok = tok + pos[None].astype(model.dtype)
            t_emb = TimestepEmbedder(model.hidden_size, dtype=model.dtype).apply(
                {"params": embed_p["t_embedder"]}, t)
            y_emb = LabelEmbedder(model.num_classes, model.hidden_size,
                                  model.label_dropout, dtype=model.dtype).apply(
                {"params": embed_p["y_embedder"]}, y, train)
            c = t_emb + y_emb

            if num_chunks > 1:
                chunks = jax.tree_util.tree_map(
                    lambda p: p.reshape(num_chunks, chunk_depth,
                                        *p.shape[1:]), block_p)
                tok = pipeline_blocks_interleaved(
                    apply_stage, chunks, tok, c, pipe_axis, num_chunks,
                    num_microbatches)
            else:
                tok = pipeline_blocks(apply_stage, block_p, tok, c,
                                      pipe_axis, num_microbatches)

            out = FinalLayer(model.hidden_size, model.patch_size,
                             model.out_channels, dtype=model.dtype).apply(
                {"params": embed_p["final_layer"]}, tok, c)
            return model._unpatchify(out).astype(jnp.float32)

    def split(params):
        inner = params["params"]
        embed_p = {k: v for k, v in inner.items() if k != "blocks"}
        return embed_p, inner["blocks"]

    dspec = P(data_axis)
    mapped = shard_map(
        local_apply, mesh=mesh,
        in_specs=(P(), P(pipe_axis), dspec, dspec,
                  dspec if has_labels else P()),
        out_specs=dspec,
        check_vma=False,
    )

    if has_labels:
        def apply_pp(params, t, x, y, rngs=None):
            del rngs
            embed_p, block_p = split(params)
            return mapped(embed_p, block_p, t, x, y)
    else:
        def apply_pp(params, t, x, rngs=None):
            del rngs
            embed_p, block_p = split(params)
            return mapped(embed_p, block_p, t, x, None)

    return apply_pp
