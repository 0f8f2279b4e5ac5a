"""Test config: run everything on a virtual 8-device CPU mesh.

The ambient environment injects a TPU PJRT plugin (via sitecustomize on
PYTHONPATH) that overrides JAX_PLATFORMS, so the env var alone does not
stick; ``jax.config.update`` after import does. Real-TPU checks live
behind TAT_TPU_TESTS=1 (the driver benches on hardware separately); the
default test run must be hermetic and fast.
"""

import os

# XLA_FLAGS must be in place before the first backend initialization.
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

if os.environ.get("TAT_TPU_TESTS") != "1":
    jax.config.update("jax_platforms", "cpu")
else:
    # hardware run: the persistent compile cache is load-bearing.
    # (f32-parity tests that need HIGHEST matmul precision scope it
    # per-test — a global override would validate the fast tier under
    # a precision config production never uses.)
    from thingino_accel_tpu.utils.cache import enable_compile_cache
    enable_compile_cache()

import numpy as np
import pytest


REFERENCE_MODELS = "/root/reference/models"


FIXTURES = os.path.join(os.path.dirname(__file__), "..", "models",
                        "fixtures")


def reference_model(name: str) -> str:
    path = os.path.join(REFERENCE_MODELS, name)
    if os.path.exists(path):
        return path
    # committed fixtures stand in for the small bundled files so the
    # suite runs hermetically when the reference tree is absent
    fallback = os.path.join(FIXTURES, name)
    if os.path.exists(fallback):
        return fallback
    pytest.skip(f"reference model {name} not available")


@pytest.fixture
def highest_precision():
    """f32 torch-parity tests: TPU default matmuls run bf16 passes;
    scope HIGHEST matmul precision to these tests only."""
    with jax.default_matmul_precision("highest"):
        yield


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(scope="session")
def cpu_devices():
    return jax.devices()
