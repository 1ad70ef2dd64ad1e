"""Test configuration: force an 8-device virtual CPU mesh before jax loads."""

import os

# tests run on the CPU backend: keep the persistent compile cache TPU-only
# (cached CPU executables may carry mismatched machine features)
os.environ.setdefault("SLN_TPU_COMPILATION_CACHE", "0")

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8").strip()

import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
# The installed TPU plugin ("axon") ignores the JAX_PLATFORMS env var; the
# config update below is what actually forces the CPU backend for tests.
jax.config.update("jax_platforms", "cpu")
# Full-precision matmuls for numerical parity tests (JAX's default CPU
# matmul precision uses reduced-precision accumulation).
jax.config.update("jax_default_matmul_precision", "highest")

import pytest  # noqa: E402


REFERENCE_PATH = "/root/reference"


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference PyTorch modules as numerical oracles.

    The reference code is never copied into this repo; tests import it
    read-only to verify numerical parity of the re-implementation.
    """
    if not os.path.isdir(REFERENCE_PATH):
        pytest.skip("reference repo not available")
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    import importlib
    graph = importlib.import_module("models.graph")
    vae = importlib.import_module("models.Sg2ScVAE_model")
    return {"graph": graph, "vae": vae}
