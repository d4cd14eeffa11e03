"""Multi-host initialization (reference ddp_utils.py:17-30 equivalent).

The reference spawns one NCCL process per GPU with MASTER_ADDR/PORT
rendezvous. On TPU pods the runtime provides coordination:
``jax.distributed.initialize()`` (no-arg on Cloud TPU) joins the slice, and
single-controller-per-host JAX sees every chip through ``jax.devices()``.
There is no broadcast step — parameters are replicated by construction when
``device_put`` with a replicated NamedSharding runs on each host — and no
barrier API is needed: any cross-host collective (or ``sync_hosts``) is one.
"""

from __future__ import annotations

from typing import Optional

import jax

# jax.distributed.initialize() must run BEFORE any JAX device operation, so
# the idempotence guard must NOT query jax (jax.process_count() initializes
# the local backend and dooms the real initialize). Track with a module flag
# plus jax.distributed's own client state.
_initialized = False


def _already_initialized() -> bool:
    if _initialized:
        return True
    try:  # jax keeps the distributed client in jax._src.distributed
        from jax._src import distributed as _dist

        return getattr(_dist.global_state, "client", None) is not None
    except Exception:
        return False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job. On Cloud TPU all arguments come from the
    runtime; pass them explicitly for manual (e.g. DCN multi-slice) setups.
    Safe to call when already initialized or single-host.

    Single-host runs (num_processes==1, or no coordinator discoverable in a
    non-TPU environment) skip distributed init entirely — that is the
    supported single-process mode, mirroring the reference's world_size==1
    "debug mode" (test_flow_latent.py:426-429)."""
    global _initialized
    if _already_initialized():
        return
    if num_processes == 1:
        _initialized = True  # explicit single-host: nothing to join
        return
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
        _initialized = True
    except (RuntimeError, ValueError) as e:
        # Only swallow the specific benign cases: already initialized, or
        # no TPU/coordinator environment to auto-discover (single-host dev).
        # ValueError covers jax versions where failed auto-discovery raises
        # e.g. "coordinator_address should be defined".
        msg = str(e).lower()
        if "already initialized" in msg:
            _initialized = True
            return
        if coordinator_address is None and (
            "coordinator" in msg or "could not be found" in msg
            or "unable to detect" in msg or "requires" in msg
        ):
            return  # single-host fallback: auto-discovery has nothing to find
        raise


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """rank-0 gate for logging/checkpointing (the reference's
    ``accelerator.is_main_process`` / rank==0 checks)."""
    return jax.process_index() == 0


def _collective_sum(val: float) -> float:
    """Sum a per-process host scalar across every device: the one shared
    primitive under ``sync_hosts`` and ``any_process_flag``.

    Multi-host correct: each process materializes only its ADDRESSABLE
    shards (``make_array_from_callback``; a plain ``device_put`` onto a
    global mesh would try to write non-addressable devices), the sum runs
    under jit with a replicated out-sharding so every process can read the
    scalar, and the device->host SCALAR TRANSFER is the synchronization
    point — ``block_until_ready`` does NOT wait on the axon-tunnel TPU
    platform (see CLAUDE.md environment rules), so we ``float()`` the
    reduction instead. Validated by the real 2-process rendezvous test
    (tests/test_multihost.py::test_real_two_process_rendezvous)."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("d",))
    sharding = NamedSharding(mesh, P("d"))
    v = np.float32(val)
    x = jax.make_array_from_callback(
        (len(devices),), sharding,
        lambda idx: np.full((1,), v, np.float32))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    return float(total)  # scalar transfer == the real barrier


def sync_hosts() -> float:
    """Barrier across hosts (reference dist.barrier,
    test_flow_latent.py:275): a tiny all-device sum whose scalar result is
    transferred to the host (see ``_collective_sum``). Returns the sum
    (== device count)."""
    return _collective_sum(1.0)


def any_process_flag(flag: bool) -> bool:
    """Collective OR of a per-process host flag (True iff ANY process set
    it). Single-process: returns the flag unchanged, no device work.

    The preemption use case: SIGTERM lands at different step boundaries per
    host, so a rank acting on its LOCAL flag enters the collective Orbax
    save while the others enter the next step's cross-process grad
    all-reduce — mismatched collectives deadlock the pod. Every rank calls
    this at the same program point and all act (or none do) on the agreed
    value (``_collective_sum`` of the 0/1 flag)."""
    if jax.process_count() == 1:
        return bool(flag)
    return _collective_sum(1.0 if flag else 0.0) > 0.0


def data_shard() -> tuple:
    """(rank, world) for DataLoader host sharding."""
    return jax.process_index(), jax.process_count()
