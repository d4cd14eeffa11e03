"""Sequence-parallel model evaluation: shard the token/row axis over a mesh.

Beyond-reference scaling path (the reference is single-GPU per sample,
test_flow_latent.py:161-194): latents whose attention footprint exceeds one
chip — e.g. DiT at 512^2-pixel f8 latents is T=16k tokens, O(T^2) attention —
run with the image's ROW axis sharded over the mesh's ``seq`` axis. All
token-local compute (patchify, adaLN, MLP, final layer, unpatchify) stays
on-shard; only attention communicates, as a ``lax.ppermute`` ring
(core/ring.py). The parameter tree is identical to the unsharded model, so
converted reference checkpoints load unchanged.
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from lfm_tpu.core.sharding import DATA_AXIS, SEQ_AXIS

__all__ = ["make_sp_apply", "make_spatial_sp_apply", "sp_data_sharding"]


def sp_data_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for (N, H, W, C) latents: batch over data, rows over seq."""
    return NamedSharding(mesh, P(DATA_AXIS, SEQ_AXIS, None, None))


def make_sp_apply(model, mesh: Mesh, *, data_axis: str = DATA_AXIS,
                  seq_axis: str = SEQ_AXIS, has_labels: bool = True):
    """Wrap ``model.apply`` (a DiT built with ``sp_axis=seq_axis``) into a
    function of GLOBAL arrays: apply(params, t, x[, y]) with x (N, H, W, C)
    sharded ``P(data, seq)`` and params/t replicated-per-shard as needed.

    H must divide into mesh.shape[seq_axis] row-shards that align to the
    patch size. Jit the result (or call inside an outer jit); XLA lowers the
    ring's ppermute onto ICI neighbours.
    """
    assert getattr(model, "sp_axis", None) == seq_axis, (
        f"model.sp_axis={getattr(model, 'sp_axis', None)!r} != {seq_axis!r}: "
        "build the model with sp_axis=seq_axis"
    )

    def local_apply(params, t, x, y):
        return model.apply(params, t, x, y)

    specs_in = (
        P(),                                 # params: replicated
        P(data_axis),                        # t: (N,) batch-sharded
        P(data_axis, seq_axis, None, None),  # x: rows over seq
        P(data_axis) if has_labels else P(),
    )
    mapped = shard_map(
        local_apply, mesh=mesh, in_specs=specs_in,
        out_specs=P(data_axis, seq_axis, None, None),
        check_vma=False,
    )
    if has_labels:
        return mapped

    def apply_no_labels(params, t, x):
        return mapped(params, t, x, None)

    return apply_no_labels


def make_spatial_sp_apply(model, mesh: Mesh, *, data_axis: str = DATA_AXIS,
                          seq_axis: str = SEQ_AXIS, has_labels: bool = True):
    """GSPMD spatial partitioning for conv UNets (ADM/EDM families).

    The reference's real memory-pressure workloads are the 512/1024px ADM
    configs (reference bash_scripts/run.sh:96-118, trained bf16 multi-GPU);
    their activation memory is dominated by the early high-resolution conv
    levels, not attention. A shard_map ring (the DiT path above) would need
    hand-written halo exchanges for every 3x3 conv, so instead the latent's
    ROW axis is annotated with a sharding constraint and the whole forward
    runs under the outer jit's GSPMD partitioner: XLA inserts the conv halo
    exchanges, GroupNorm cross-shard reductions, and attention collectives
    itself, and per-device activation memory drops by ~the seq-axis size.
    Parameters are replicated (identical tree — converted reference
    checkpoints load unchanged).

    Returns apply(params, t, x[, y]) for use INSIDE jit over ``mesh``
    (sample.build_velocity wires it when ``sp_mesh`` is set and the model is
    not a DiT). Exact — the partitioned program computes the same math, so
    outputs match the single-device forward to f32 reduction order
    (tests/test_sp_adm.py asserts dp x sp parity on the CPU mesh).
    """
    xs = NamedSharding(mesh, P(data_axis, seq_axis, None, None))

    def apply(params, t, x, y=None):
        x = jax.lax.with_sharding_constraint(x, xs)
        out = model.apply(params, t, x, y)
        return jax.lax.with_sharding_constraint(out, xs)

    if has_labels:
        return apply

    def apply_no_labels(params, t, x):
        return apply(params, t, x, None)

    return apply_no_labels
