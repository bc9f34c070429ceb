"""Test fixtures: force CPU with 8 virtual devices so multi-chip sharding
paths are exercised without TPU hardware.

The container presets JAX_PLATFORMS=axon and a sitecustomize that
initializes the TPU backend at interpreter start, so env vars alone are too
late — we must flip the platform via jax.config before any backend use.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

REFERENCE_EXAMPLES = pathlib.Path("/root/reference/examples")


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Bound the per-process XLA executable cache: a full single-process run
    accumulates hundreds of compiled programs (8 virtual devices each) and
    eventually segfaults in backend_compile_and_load. Dropping the caches at
    module teardown keeps each worker's footprint flat."""
    yield
    jax.clear_caches()


@pytest.fixture
def afiro_path():
    p = REFERENCE_EXAMPLES / "modified_afiro.mps"
    if not p.exists():
        pytest.skip("reference sample data not available")
    return str(p)


@pytest.fixture
def hello_path():
    p = REFERENCE_EXAMPLES / "hello.mps"
    if not p.exists():
        pytest.skip("reference sample data not available")
    return str(p)
