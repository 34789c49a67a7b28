"""Test harness: run everything on a virtual 8-device CPU mesh.

Sharding/multi-chip paths are validated on host CPU devices
(xla_force_host_platform_device_count); the real-TPU benchmark path is
exercised separately by bench.py.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: the shell presets axon (tunneled TPU)
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container's sitecustomize imports jax and registers the tunneled-TPU
# backend before pytest starts, so the env vars above may be read too late;
# override through the live config as well.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert jax.devices()[0].platform == "cpu", jax.devices()

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture(scope="session")
def iiwa():
    import jax.numpy as jnp
    from mpcgpu_tpu.models.robot import iiwa14

    return iiwa14(dtype=jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)


@pytest.fixture(scope="session")
def fixtures_dir():
    from pathlib import Path

    return Path(__file__).resolve().parent / "fixtures"


@pytest.fixture(scope="session")
def traj_0_0(fixtures_dir):
    xu = np.loadtxt(fixtures_dir / "0_0_traj.csv", delimiter=",")
    ee = np.loadtxt(fixtures_dir / "0_0_eepos.traj", delimiter=",")
    return xu.astype(np.float32), ee.astype(np.float32)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Free compiled executables between test modules.

    A full-suite run accumulates dozens of large interpreter-mode Pallas
    programs; past ~50 tests the XLA CPU compiler has twice segfaulted
    inside backend_compile_and_load on a compile that passes in
    isolation (round-2 logs).  Dropping the jit/executable caches per
    module keeps the process state small; cache misses re-compile, which
    only costs time.
    """
    yield
    jax.clear_caches()
