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


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """Join the multi-host job. On Cloud TPU all arguments come from the
    runtime; pass them explicitly for manual (e.g. DCN multi-slice) setups.
    Safe to call when already initialized or single-host."""
    if jax.process_count() > 1:
        return  # already initialized
    try:
        if coordinator_address is None:
            jax.distributed.initialize()
        else:
            jax.distributed.initialize(coordinator_address, num_processes, process_id)
    except (RuntimeError, ValueError):
        pass  # single-host / already initialized


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """rank-0 gate for logging/checkpointing (the reference's
    ``accelerator.is_main_process`` / rank==0 checks)."""
    return jax.process_index() == 0


def sync_hosts() -> None:
    """Barrier across hosts (reference dist.barrier,
    test_flow_latent.py:275): a tiny psum over all devices blocks until
    every host contributes."""
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devices = np.asarray(jax.devices())
    mesh = Mesh(devices, ("d",))
    x = jax.device_put(jnp.ones((len(devices),)), NamedSharding(mesh, P("d")))
    jnp.sum(x).block_until_ready()


def data_shard() -> tuple:
    """(rank, world) for DataLoader host sharding."""
    return jax.process_index(), jax.process_count()
