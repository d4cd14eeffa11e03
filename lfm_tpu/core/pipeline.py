"""GPipe-style pipeline parallelism over a mesh axis (collective permute).

Beyond-reference scaling path (the reference is single-GPU per replica,
ddp_utils.py:17-30 — it has no pipeline engine): the repeated-block stack of
a network (DiT's ``nn.scan`` blocks, dit.py:249-264) is split into
contiguous stages over a ``pipe`` mesh axis; microbatches of the local batch
flow through the stages, hopping one ICI neighbour per tick via
``lax.ppermute``. This is the TPU-native form of pipeline parallelism: one
SPMD program, no per-stage processes, no send/recv — the schedule is a
``lax.scan`` whose carried state is the in-flight activation.

Schedule: plain GPipe fill-drain with M microbatches over S stages in
M + S - 1 ticks; the bubble fraction is (S-1)/(M+S-1). Within one tick every
stage applies its local blocks to its in-flight microbatch (stages still in
the fill/drain bubble compute on garbage that is never read — branch-free,
which is what keeps the whole schedule one fused XLA while-body).

Differentiable end-to-end: ppermute's transpose is the reverse-ring
ppermute, dynamic slicing transposes to scatter-adds, and the final psum
broadcast transposes to a pick — so ``jax.grad`` through a pipelined forward
yields exactly the stage-local parameter gradients (pinned against the
unsharded model in tests/test_pp.py).

Call INSIDE ``shard_map`` with the pipe axis mapped to ``axis_name`` and the
stage parameters sharded on their leading (block/depth) axis.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["pipeline_blocks", "pipeline_blocks_interleaved"]


def pipeline_blocks(
    apply_stage: Callable,
    stage_params,
    x: jnp.ndarray,
    c: jnp.ndarray,
    axis_name: str,
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Run a block stack pipelined over ``axis_name``.

    apply_stage(stage_params, x_mb, c_mb) -> x_mb applies THIS stage's
    contiguous slice of blocks (e.g. an ``nn.scan`` of depth/S blocks whose
    parameters arrived sharded on the leading axis). x: (B, T, D) tokens,
    c: (B, ...) per-sample conditioning — both replicated over the pipe
    axis. Returns the full (B, T, D) output, replicated over the pipe axis
    (psum broadcast from the last stage).

    ``num_microbatches`` defaults to the stage count S (bubble fraction
    (S-1)/(2S-1) ≈ 1/2); raise it toward B for a smaller bubble at the cost
    of smaller per-tick matmuls.
    """
    size = lax.psum(1, axis_name)  # static: the pipe axis size
    sidx = lax.axis_index(axis_name)
    m = int(num_microbatches) if num_microbatches else int(size)
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible by {m} microbatches"

    xs = x.reshape(m, b // m, *x.shape[1:])
    cs = c.reshape(m, b // m, *c.shape[1:])

    # forward ring: stage i hands its activation to stage i+1; the wrap to
    # stage 0 carries drain-phase garbage that injection overwrites
    perm = [(i, (i + 1) % size) for i in range(size)]

    def tick(carry, t):
        state, outs = carry
        # stage 0 injects microbatch t (clipped re-injection past M is
        # garbage that is never written to outs)
        inject = lax.dynamic_index_in_dim(
            xs, jnp.clip(t, 0, m - 1), axis=0, keepdims=False)
        state = jnp.where(sidx == 0, inject, state)
        # stage s processes microbatch t - s at tick t
        c_mb = lax.dynamic_index_in_dim(
            cs, jnp.clip(t - sidx, 0, m - 1), axis=0, keepdims=False)
        state = apply_stage(stage_params, state, c_mb)
        # the last stage finished microbatch t-(S-1); write it. Ticks still
        # in the fill bubble write garbage into slot 0, which tick S-1 then
        # overwrites with the real microbatch 0 — so the write needs no
        # predicate. Other stages' buffers are masked out of the psum below.
        outs = lax.dynamic_update_index_in_dim(
            outs, state.astype(outs.dtype),
            jnp.clip(t - (size - 1), 0, m - 1), axis=0)
        state = lax.ppermute(state, axis_name, perm)
        return (state, outs), None

    state0 = jnp.zeros_like(xs[0])
    outs0 = jnp.zeros_like(xs)
    (_, outs), _ = lax.scan(
        tick, (state0, outs0), jnp.arange(m + size - 1))

    # broadcast the last stage's completed buffer to every stage (transpose:
    # each stage's output cotangent flows back only into the last stage)
    outs = lax.psum(
        jnp.where(sidx == size - 1, outs, jnp.zeros_like(outs)), axis_name)
    return outs.reshape(b, *x.shape[1:])


def pipeline_blocks_interleaved(
    apply_chunk: Callable,
    chunk_params,
    x: jnp.ndarray,
    c: jnp.ndarray,
    axis_name: str,
    num_chunks: int,
    num_microbatches: Optional[int] = None,
) -> jnp.ndarray:
    """Interleaved (Megatron-style virtual-stage) pipeline over ``axis_name``.

    Each device hosts ``num_chunks`` (=v) NON-contiguous slices of the block
    stack: device d runs virtual stages d, S+d, …, (v-1)S+d, so an
    activation circulates the same ``ppermute`` ring v times — every wrap
    from the last device to device 0 promotes it to its next chunk. The
    fill/drain bubble shrinks from (S-1)/(M+S-1) ticks of FULL-stage work
    (GPipe, ``pipeline_blocks``) to (S-1)/(vM+S-1) ticks of 1/v-stage work —
    the same (S-1)-chunk bubble amortized over v× more compute ticks —
    WITHOUT shrinking the per-block matmul the way raising M does (the
    round-4 measured failure mode of microbatch scaling: M=16 inverts).

    Schedule consistency: device 0 injects fresh microbatches exactly at the
    ticks (t mod vS < S) when the activation wrapping in from the last
    device has just finished its FINAL chunk — so injection never displaces
    a live loop-back, and the whole schedule stays one branch-free
    ``lax.scan`` of vM + S - 1 ticks.

    ``apply_chunk(one_chunk_params, x_mb, c_mb)`` applies one chunk's blocks
    (depth/(S·v) of them). ``chunk_params`` leaves carry a leading LOCAL
    chunk axis of size v, laid out so chunk k on this device holds global
    virtual stage k·S + d — see ``sample/pp.py::interleave_block_params``.
    ``num_microbatches`` (default S) must be a multiple of the stage count:
    microbatches are injected in groups of S.
    """
    size = lax.psum(1, axis_name)
    sidx = lax.axis_index(axis_name)
    v = int(num_chunks)
    assert v >= 1
    if v == 1:
        return pipeline_blocks(
            lambda p, xb, cb: apply_chunk(
                jax.tree_util.tree_map(lambda l: l[0], p), xb, cb),
            chunk_params, x, c, axis_name, num_microbatches)
    m = int(num_microbatches) if num_microbatches else int(size)
    b = x.shape[0]
    assert b % m == 0, f"batch {b} not divisible by {m} microbatches"
    assert m % size == 0, (
        f"interleaved schedule injects in groups of {size} stages; "
        f"microbatches {m} must be a multiple")
    vs = v * size

    xs = x.reshape(m, b // m, *x.shape[1:])
    cs = c.reshape(m, b // m, *c.shape[1:])
    perm = [(i, (i + 1) % size) for i in range(size)]

    def tick(carry, t):
        state, outs = carry
        # device 0: fresh injection for the first S ticks of each vS-tick
        # group; the other (v-1)S ticks it promotes the loop-back it was
        # handed (which is never final-chunk at those ticks — see docstring)
        u0 = t % vs
        mb_in = jnp.clip((t // vs) * size + u0, 0, m - 1)
        inject = lax.dynamic_index_in_dim(xs, mb_in, axis=0, keepdims=False)
        state = jnp.where((sidx == 0) & (u0 < size), inject, state)
        # device d at tick t works tick u = (t - d) mod vS of group
        # g = (t - d) // vS: chunk k = u // S of microbatch gS + (u mod S)
        u = jnp.mod(t - sidx, vs)
        g = (t - sidx) // vs
        k = u // size
        mb = jnp.clip(g * size + jnp.mod(u, size), 0, m - 1)
        c_mb = lax.dynamic_index_in_dim(cs, mb, axis=0, keepdims=False)
        p_k = jax.tree_util.tree_map(
            lambda p: lax.dynamic_index_in_dim(p, k, axis=0, keepdims=False),
            chunk_params)
        state = apply_chunk(p_k, state, c_mb)
        # only the last device's FINAL-chunk completions are real outputs;
        # everything else (intermediate chunks, fill garbage) writes to the
        # trash slot m — branch-free, nothing to mask afterwards
        is_final = (sidx == size - 1) & (k == v - 1) & (g >= 0)
        outs = lax.dynamic_update_index_in_dim(
            outs, state.astype(outs.dtype), jnp.where(is_final, mb, m),
            axis=0)
        state = lax.ppermute(state, axis_name, perm)
        return (state, outs), None

    state0 = jnp.zeros_like(xs[0])
    outs0 = jnp.zeros((m + 1,) + xs.shape[1:], xs.dtype)  # slot m = trash
    (_, outs), _ = lax.scan(
        tick, (state0, outs0), jnp.arange(v * m + size - 1))

    outs = lax.psum(
        jnp.where(sidx == size - 1, outs, jnp.zeros_like(outs)), axis_name)
    return outs[:m].reshape(b, *x.shape[1:])
