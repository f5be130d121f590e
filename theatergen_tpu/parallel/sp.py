"""Sequence-parallel attention over a mesh axis.

SURVEY.md §5: SD1.5's 4096-token attention fits one chip, but SDXL's
highest-resolution blocks reach 16384 tokens — the flash kernel is
blockwise precisely so a ``sp`` mesh axis can shard the sequence.  This
module provides that axis:

- queries shard over ``sp`` (each device owns a contiguous Sq/n slice);
- keys/values are all-gathered over ICI (at 16384×bf16×(H·D) per layer
  this is MBs — cheap relative to the O(S²) attention FLOPs saved);
- each device runs the same attention kernel (Pallas flash when
  supported) on its slice, so outputs come back sharded like queries with
  no further collective.

This is the "all-gather KV" flavor of sequence parallelism — the right
regime for S ≲ 10⁵ where the KV gather is small next to S²·D compute
(ring attention only pays at much longer sequences).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
try:                                     # jax >= 0.8 top-level API
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs):
        # replication checking renamed check_rep -> check_vma in 0.8; the
        # all-gather-KV body is intentionally unreplicated, so it stays off
        return _shard_map(f, mesh=mesh, in_specs=in_specs,
                          out_specs=out_specs, check_vma=False)
except ImportError:                      # older jax
    from functools import partial as _partial

    from jax.experimental.shard_map import shard_map as _shard_map_old

    shard_map = _partial(_shard_map_old, check_rep=False)
from jax.sharding import Mesh, PartitionSpec as P


def sp_attention(
    q: jnp.ndarray,            # [B, Sq, H, D]
    k: jnp.ndarray,            # [B, Sk, H, D]
    v: jnp.ndarray,
    mesh: Mesh,
    axis: str = "dp",
    *,
    use_flash: bool = True,
) -> jnp.ndarray:
    """Attention with the query sequence sharded over ``mesh[axis]``.

    ``Sq`` must divide by the axis size.  Returns [B, Sq, H, D] sharded
    the same way as ``q``.
    """
    n = mesh.shape[axis]
    if q.shape[1] % n != 0:
        raise ValueError(f"Sq={q.shape[1]} not divisible by {axis}={n}")

    def local_attention(q_shard, k_shard, v_shard):
        # gather the full key/value sequence across the sp axis
        k_full = jax.lax.all_gather(k_shard, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_shard, axis, axis=1, tiled=True)
        from ..ops import attention as A

        out, _ = A.multi_head_attention(q_shard, k_full, v_full,
                                        use_flash=use_flash)
        return out

    spec = P(None, axis, None, None)
    return shard_map(
        local_attention, mesh=mesh,
        in_specs=(spec, spec, spec), out_specs=spec,
    )(q, k, v)


def sp_sharded(mesh: Mesh, x: jnp.ndarray, axis: str = "dp"):
    """Place a [B, S, H, D] tensor with S sharded over ``axis``."""
    from jax.sharding import NamedSharding

    return jax.device_put(x, NamedSharding(mesh, P(None, axis, None, None)))
