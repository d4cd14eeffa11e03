"""Worker for the REAL 2-process jax.distributed rendezvous test
(tests/test_multihost.py::test_real_two_process_rendezvous).

Run as: python tests/multihost_worker.py <coordinator> <num_procs> <pid>

Each process joins the coordinator (reference ddp_utils.py:17-30 —
MASTER_ADDR/PORT + init_process_group), then the pair executes a genuine
cross-process collective: a jit global sum over a mesh spanning both
processes' CPU devices, plus the library's own ``sync_hosts`` barrier.
Prints machine-checkable lines the parent asserts on.
"""

import os
import sys

# The sandbox's sitecustomize imports jax at interpreter start, so env-var
# platform selection is too late — use the config API (same recipe as
# tests/conftest.py; setting JAX_PLATFORMS=cpu in the env does NOT work
# here and the axon backend would grab the process).
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)  # 2 local => 4 global devices

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
    from lfm_tpu.core import multihost

    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()
    assert multihost.process_index() == pid
    assert multihost.is_main_process() == (pid == 0)

    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    devs = np.asarray(jax.devices())  # global device list, both processes
    mesh = Mesh(devs, ("d",))
    sh = NamedSharding(mesh, P("d"))

    # Each process contributes (pid+1) on its local shard; the global sum
    # 2*1 + 2*2 = 6 is only computable with real cross-process comms.
    x = jax.make_array_from_callback(
        (len(devs),), sh, lambda idx: np.full((1,), pid + 1, np.float32))
    total = jax.jit(jnp.sum, out_shardings=NamedSharding(mesh, P()))(x)
    print(f"GSUM {float(total)}", flush=True)

    bar = multihost.sync_hosts()
    print(f"SYNC {bar}", flush=True)

    # collective preemption decision (ADVICE r4): a flag set on ONE rank
    # must be seen by ALL ranks (or none) at the same program point
    one = multihost.any_process_flag(pid == 0)   # only rank 0 raises it
    none = multihost.any_process_flag(False)
    print(f"FLAG {one} {none}", flush=True)

    rank, world = multihost.data_shard()
    print(f"SHARD {rank}/{world}", flush=True)
    print("WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
