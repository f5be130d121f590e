"""Test env: CPU backend with 8 virtual devices for mesh/pjit tests.

Must run before jax initializes (standard JAX fake-backend trick,
SURVEY.md §4d).
"""

import os

# Force CPU: the dev box exposes one real TPU chip via a slow tunnel
# (JAX_PLATFORMS=axon); unit tests always run on the virtual-device CPU
# backend.  Set THEATERGEN_TEST_PLATFORM to override.
os.environ["JAX_PLATFORMS"] = os.environ.get("THEATERGEN_TEST_PLATFORM", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()
