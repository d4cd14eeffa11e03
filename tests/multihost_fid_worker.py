"""Worker for the REAL 2-process sharded-FID test
(tests/test_multihost.py::test_real_two_process_sharded_fid).

Run as: python tests/multihost_fid_worker.py <coordinator> <num_procs> <pid> <out.npy>

Each process joins the coordinator, builds the SAME tiny model/VAE/inception
from fixed seeds (so no checkpoint file is needed), and runs the sharded FID
generator over ONE global mesh spanning both processes' CPU devices — the
reference's multi-node FID path (test_flow_latent.py:401-429,
test_flow_latent_ddp.py:128-153) executed with genuine cross-process
placement + activation allgather. Dumps the gathered activations to
``out.npy``; the parent asserts both processes produced the identical set,
equal to a single-process run on the same-size mesh.
"""

import os
import sys

# Env-var platform selection is too late here (sitecustomize imports jax at
# interpreter start) — use the config API, same recipe as tests/conftest.py.
os.environ.pop("JAX_PLATFORMS", None)

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 4)  # 4 local => 8 global devices
jax.config.update("jax_default_matmul_precision", "float32")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coord, nproc, pid, out = (sys.argv[1], int(sys.argv[2]), int(sys.argv[3]),
                              sys.argv[4])
    from lfm_tpu.core import multihost

    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from tests.sharded_fid_fixture import build_fixture, run_fixture

    fix = build_fixture()
    acts = run_fixture(fix)  # global mesh over all 8 devices
    np.save(out, acts)
    print("FID_WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
