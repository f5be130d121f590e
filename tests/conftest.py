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


# Two-tier suite (full run is ~1h of CPU compiles): files whose tests are
# dominated by multi-minute e2e orchestrator turns or torch-golden port
# parity get an automatic ``slow`` marker.  Fast tier for iteration:
#   python -m pytest tests/ -m "not slow"     (~5 min)
# CI / pre-commit on touched areas should still run the relevant slow
# files directly.
_SLOW_FILES = {
    "test_theater.py",
    "test_sdxl.py",
    "test_character_final.py",
    "test_cli.py",
    "test_guidance.py",
    "test_parallel.py",
    "test_gdino.py",
    "test_sam_hf.py",
    "test_torch_parity.py",
    "test_fullsize_golden.py",
    "test_inception.py",
    "test_txt2img.py",
    "test_serve.py",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    for item in items:
        if item.path is not None and item.path.name in _SLOW_FILES:
            item.add_marker(pytest.mark.slow)
