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

__all__ = ["pipeline_blocks"]


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
