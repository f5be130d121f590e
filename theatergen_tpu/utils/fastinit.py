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
    host RNG.  ``dtype`` overrides every float leaf dtype (e.g. bf16).

    All float leaves ship as ONE packed transfer and are sliced apart in a
    single jitted program — thousands of per-leaf ``device_put`` round
    trips over the remote tunnel cost minutes for SD-scale trees.
    """
    import jax.numpy as jnp

    shapes = jax.eval_shape(init_fn, *example_args)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    rng = np.random.RandomState(seed)

    float_meta = []          # (index, shape, target_dtype, offset, size)
    offset = 0
    out: list = [None] * len(leaves)
    for i, leaf in enumerate(leaves):
        if np.issubdtype(np.dtype(leaf.dtype), np.integer):
            out[i] = jax.device_put(np.zeros(leaf.shape, leaf.dtype))
            continue
        target = np.dtype(dtype) if dtype is not None else np.dtype(leaf.dtype)
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        float_meta.append((i, leaf.shape, target, offset, size))
        offset += size

    if float_meta:
        flat = (rng.standard_normal(offset).astype(np.float32) * scale)
        packed = jax.device_put(flat)

        def unpack(buf):
            pieces = []
            for _i, shape, target, off, size in float_meta:
                piece = jax.lax.dynamic_slice(buf, (off,), (size,))
                pieces.append(piece.reshape(shape).astype(jnp.dtype(target)))
            return tuple(pieces)

        pieces = jax.jit(unpack)(packed)
        for (i, *_), piece in zip(float_meta, pieces):
            out[i] = piece

    return jax.tree_util.tree_unflatten(treedef, out)
