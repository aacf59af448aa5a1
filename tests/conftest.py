"""Test session setup: CPU backend, 8 virtual devices, float64 enabled.

Must run before jax is imported anywhere. Multi-chip sharding tests use the
8-device virtual CPU mesh (the reference offers no distributed pattern to
follow, SURVEY.md section 4); float64 is enabled so parity gates against the
float64 NumPy reference can use tight tolerances.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The axon TPU plugin in this image overrides JAX_PLATFORMS at import time;
# force the CPU backend explicitly (tests must not touch the real chip).
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import pytest  # noqa: E402

REFERENCE_DIR = "/root/reference/TensorNetwork"


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_DIR)


@pytest.fixture(scope="session")
def reference_modules():
    """Import the reference implementation as a test oracle (read-only)."""
    if not reference_available():
        pytest.skip("reference implementation not available")
    if REFERENCE_DIR not in sys.path:
        sys.path.insert(0, REFERENCE_DIR)
    import Network_class  # noqa: F401
    import Tensor_class  # noqa: F401
    import custom_linalg_tools  # noqa: F401

    return {
        "Network": Network_class,
        "Tensor": Tensor_class,
        "linalg": custom_linalg_tools,
    }
