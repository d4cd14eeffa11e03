"""Test configuration: run everything on a virtual 8-device CPU mesh.

This is the JAX-native replacement for a "fake NCCL backend" (SURVEY.md §4):
multi-chip sharding logic is validated on host CPU with
``--xla_force_host_platform_device_count=8`` before it ever touches real ICI.
Must run before jax is imported anywhere.
"""

import os

# The sandbox pins JAX_PLATFORMS=axon (the TPU tunnel); drop it so the config
# override below wins and tests run hermetically on host CPU.
os.environ.pop("JAX_PLATFORMS", None)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_default_matmul_precision", "float32")

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# The heaviest end-to-end modules get an automatic `slow` marker so iteration
# can use `pytest -m "not slow"` (the full suite is ~20 min on this 1-core
# host; the fast subset is a few minutes).
_SLOW_MODULES = {
    "tests.test_cli_loop", "tests.test_conditional", "tests.test_downstream_eval",
    "tests.test_downstream_loops", "tests.test_sharded_fid",
    "tests.test_train_sample", "tests.test_partition", "tests.test_presets_build",
    # round 3: keep `-m "not slow"` under ~8 min on this 1-core host
    # (VERDICT r2 item 9) — these six measured 47-154 s per file.
    "tests.test_runbook", "tests.test_convert_optimizer", "tests.test_dit_fused",
    "tests.test_fid", "tests.test_preemption", "tests.test_perceptual",
}


def pytest_collection_modifyitems(config, items):
    short_names = {m.split(".")[-1] for m in _SLOW_MODULES}
    for item in items:
        name = item.module.__name__
        if name in _SLOW_MODULES or name.split(".")[-1] in short_names:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def mesh8():
    from lfm_tpu.core.sharding import make_mesh

    return make_mesh(dp=8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
