"""Worker for the REAL 2-process training test
(tests/test_multihost.py::test_real_two_process_training).

Run as: python tests/multihost_train_worker.py <coordinator> <num_procs> <pid> <out.npy> <exp_dir>

Each process joins the coordinator and runs the SAME tiny training loop over
ONE global mesh spanning both processes' CPU devices — the reference's DDP
trainer (train_flow_latent.py:339-429) executed with genuine cross-process
gradient all-reduce, callback-based batch placement, and rank-0-gated
checkpoints. Dumps the final EMA params to ``out.npy``; the parent asserts
both processes converged to the identical state, equal to a single-process
run on the same-size mesh, and that only rank 0 wrote checkpoints.
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
    coord, nproc, pid, out, exp_dir = (sys.argv[1], int(sys.argv[2]),
                                       int(sys.argv[3]), sys.argv[4],
                                       sys.argv[5])
    from lfm_tpu.core import multihost

    multihost.initialize(coord, nproc, pid)
    assert jax.process_count() == nproc, jax.process_count()

    import numpy as np

    from tests.multihost_train_fixture import run_train

    flat = run_train(exp_dir)  # global mesh over all 8 devices
    np.save(out, flat)
    print("TRAIN_WORKER_OK", flush=True)


if __name__ == "__main__":
    main()
