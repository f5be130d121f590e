"""Fast parameter materialization + persistent-compile-cache setup.

``flax.Module.init`` on the real chip compiles one giant program; through
the remote-compile tunnel that costs minutes.  For benchmarking and
weightless operation we instead ``jax.eval_shape`` the init (pure trace, no
device work) and materialize leaves host-side with seeded numpy, then
``device_put`` — ~20 s for the full SD1.5 stack instead of a giant compile.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def setup_compile_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (huge win through the
    axon remote-compile tunnel: recompiles become sub-second)."""
    path = path or os.environ.get(
        "THEATERGEN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def materialize_params(init_fn, *example_args, seed: int = 0,
                       dtype=None, scale: float = 0.02) -> Any:
    """eval_shape ``init_fn(*example_args)`` and fill leaves with seeded
    host RNG.  ``dtype`` overrides every leaf dtype (e.g. bf16 weights)."""
    shapes = jax.eval_shape(init_fn, *example_args)
    rng = np.random.RandomState(seed)

    def fill(leaf):
        if np.issubdtype(np.dtype(leaf.dtype), np.integer):
            return jax.device_put(np.zeros(leaf.shape, leaf.dtype))
        target = np.dtype(dtype) if dtype is not None else np.dtype(leaf.dtype)
        arr = (rng.standard_normal(leaf.shape).astype(np.float32) * scale)
        return jax.device_put(arr.astype(target))  # bf16 via ml_dtypes

    return jax.tree_util.tree_map(fill, shapes)
