"""Device-mesh and sharding helpers.

TPU-native replacement for the reference's NCCL process-group layer
(reference ddp_utils.py:17-30, test_flow_latent_ddp.py:26-35): instead of one
process per GPU with explicit broadcast/all-reduce, we build a
``jax.sharding.Mesh`` and annotate shardings; XLA inserts the collectives
over ICI/DCN. Parameters are replicated by construction (no broadcast), and
gradient sync is a ``pmean``/sharding-induced all-reduce inside the jitted
train step.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
FSDP_AXIS = "fsdp"
PIPE_AXIS = "pipe"
TENSOR_AXIS = "tensor"
SEQ_AXIS = "seq"


def make_mesh(
    dp: int = -1,
    fsdp: int = 1,
    tp: int = 1,
    sp: int = 1,
    pp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a (data, fsdp, pipe, tensor, seq) mesh. dp=-1 consumes all
    remaining devices. pp partitions the block/depth axis for pipeline
    parallelism (core/pipeline.py); sp partitions the token/row axis for
    sequence parallelism (core/ring.py ring attention). tp/sp are innermost
    so the chattiest collectives ride adjacent ICI links; pipe sits between
    fsdp and tensor so each stage's ppermute neighbour is one hop away."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp == -1:
        assert n % (fsdp * pp * tp * sp) == 0, (
            f"{n} devices not divisible by fsdp*pp*tp*sp={fsdp * pp * tp * sp}")
        dp = n // (fsdp * pp * tp * sp)
    assert dp * fsdp * pp * tp * sp == n, (
        f"mesh {dp}x{fsdp}x{pp}x{tp}x{sp} != {n} devices")
    arr = np.asarray(devices).reshape(dp, fsdp, pp, tp, sp)
    return Mesh(arr, (DATA_AXIS, FSDP_AXIS, PIPE_AXIS, TENSOR_AXIS, SEQ_AXIS))


def data_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; replicate the rest."""
    spec = P(DATA_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def put_global(x, sharding: NamedSharding):
    """``device_put`` that also works when ``sharding`` spans NON-ADDRESSABLE
    devices (a mesh over multiple processes): ``device_put`` can only place
    onto this process's devices, so in the multi-process case each process
    contributes just its addressable shards of the full host value via
    ``make_array_from_callback``. Requires every process to hold the SAME
    full host value ``x`` (the single-controller SPMD contract — the
    reference instead scatters per-rank tensors over NCCL,
    ddp_utils.py:17-30)."""
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    xnp = np.asarray(x)
    return jax.make_array_from_callback(xnp.shape, sharding, lambda s: xnp[s])


def put_tree(tree, sharding: NamedSharding):
    """``put_global`` over a pytree (one sharding for every leaf)."""
    return jax.tree_util.tree_map(lambda x: put_global(x, sharding), tree)


def shard_batch(mesh: Mesh, batch):
    """Place a host-side batch pytree onto the mesh, batch-dim sharded.
    Multi-process safe: every process must hold the identical full batch
    (deterministic loaders guarantee this); each keeps only its shards."""
    def put(x):
        return put_global(x, data_sharding(mesh, np.ndim(x)))
    return jax.tree_util.tree_map(put, batch)


def local_batch_size(mesh: Mesh, global_batch: int) -> int:
    dp = mesh.shape[DATA_AXIS]
    assert global_batch % dp == 0, f"global batch {global_batch} % dp {dp} != 0"
    return global_batch // dp


def process_sample_shard(n_sample: int, batch_size: int, rank: int, world_size: int):
    """Split the FID sample-index space like the reference's interleaved DDP
    loop (reference test_flow_latent.py:248-272): rounds n_sample up to a
    multiple of the global batch and yields (start, global_batch) steps."""
    global_batch = batch_size * world_size
    total = int(math.ceil(n_sample / global_batch) * global_batch)
    steps = total // global_batch
    return total, steps
