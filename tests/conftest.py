"""Test env: CPU backend with 8 virtual devices for mesh/pjit tests.

Must run before jax initializes (standard JAX fake-backend trick,
SURVEY.md §4d).
"""

import os

# Force CPU: the dev box exposes one real TPU chip via a slow tunnel
# (JAX_PLATFORMS=axon); unit tests always run on the virtual-device CPU
# backend.  Set THEATERGEN_TEST_PLATFORM to override.
_platform = os.environ.get("THEATERGEN_TEST_PLATFORM", "cpu")
os.environ["JAX_PLATFORMS"] = _platform
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon sitecustomize's register() overrides jax's platform CONFIG (not
# just the env), and merely *initializing* the axon backend blocks until
# the single TPU chip is free — so a concurrently running TPU job would
# hang the whole test session.  Override at the config level too.
if _platform == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
