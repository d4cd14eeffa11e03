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


@pytest.fixture(scope="session")
def mesh8():
    from lfm_tpu.core.sharding import make_mesh

    return make_mesh(dp=8)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
