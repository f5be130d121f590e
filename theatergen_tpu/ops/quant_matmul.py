"""Pallas fused W8A8 matmul: in-kernel activation quantization.

The plain XLA W8A8 path (``ops/quant.QuantDense``) was measured
throughput-neutral end-to-end (+1.6%, BENCH_NOTES.md): the dynamic
activation quantization (absmax reduce + round/clip casts) costs separate
HBM passes that cancel the MXU's 2× int8 rate.  This kernel removes that
overhead by fusing the whole pipeline into one VMEM-resident pass:

- activations stream in as bf16 and are quantized **in-register** with
  per-row (per-token) dynamic scales — finer than QuantDense's per-tensor
  scale, so accuracy improves too;
- the int8×int8→int32 dot runs on the MXU at the doubled rate;
- dequantization (row scale × static per-output-channel weight scale)
  happens in the epilogue before the single bf16 output write.

Grid ``(M/bm, N/bn)`` with N innermost; the quantized activation block and
its scales live in VMEM scratch, computed once per row block (``n == 0``)
and reused across N tiles.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_M_BLOCK = 512
DEFAULT_N_BLOCK = 2048

# set True (tests) to run through the Pallas interpreter on CPU
INTERPRET = False


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _qmm_kernel(x_ref, wq_ref, wscale_ref, o_ref, xq_ref, s_ref):
    n_idx = pl.program_id(1)

    @pl.when(n_idx == 0)
    def _quantize():
        x = x_ref[...].astype(jnp.float32)            # [bm, K]
        amax = jnp.max(jnp.abs(x), axis=1, keepdims=True)
        s = jnp.maximum(amax / 127.0, 1e-8)           # [bm, 1]
        xq_ref[...] = jnp.clip(
            jnp.round(x / s), -127, 127).astype(jnp.int8)
        s_ref[...] = jnp.broadcast_to(s, s_ref.shape)

    acc = jax.lax.dot_general(
        xq_ref[...], wq_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scale = s_ref[...][:, :1] * wscale_ref[...][None, :]   # [bm, bn]
    o_ref[...] = (acc.astype(jnp.float32) * scale).astype(o_ref.dtype)


def quant_matmul(
    x: jnp.ndarray,           # [..., K] bf16/fp32
    w_q: jnp.ndarray,         # [K, N] int8
    w_scale: jnp.ndarray,     # [N] fp32 per-output-channel
    *,
    m_block: int = DEFAULT_M_BLOCK,
    n_block: int = DEFAULT_N_BLOCK,
    out_dtype=None,
) -> jnp.ndarray:
    """Fused dynamic-per-row-A8 × static-per-channel-W8 matmul → [..., N]."""
    out_dtype = out_dtype or x.dtype
    k, n = w_q.shape
    lead = x.shape[:-1]
    m = 1
    for d in lead:
        m *= d
    x2 = x.reshape(m, k)

    bm = min(m_block, _round_up(m, 8))
    bn = min(n_block, _round_up(n, LANE))
    m_p = _round_up(m, bm)
    n_p = _round_up(n, bn)
    if m_p != m:
        x2 = jnp.pad(x2, ((0, m_p - m), (0, 0)))
    wq = w_q if n_p == n else jnp.pad(w_q, ((0, 0), (0, n_p - n)))
    ws = w_scale.astype(jnp.float32)
    if n_p != n:
        ws = jnp.pad(ws, (0, n_p - n))

    grid = (m_p // bm, n_p // bn)
    out = pl.pallas_call(
        _qmm_kernel,
        out_shape=jax.ShapeDtypeStruct((m_p, n_p), out_dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, bn), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bn,), lambda i, j: (j,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bm, k), jnp.int8),        # quantized activations
            pltpu.VMEM((bm, LANE), jnp.float32),  # per-row scales
        ],
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m_p * n_p * k,
            bytes_accessed=m_p * k * 2 + k * n_p + m_p * n_p * 2,
            transcendentals=0,
        ),
    )(x2, wq, ws)
    return out[:m, :n].reshape(*lead, n)


def reference_quant_matmul(x, w_q, w_scale):
    """Per-row-quantized reference (same numerics, plain XLA) for tests."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.maximum(amax / 127.0, 1e-8)
    xq = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, w_q, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32)
    return (acc.astype(jnp.float32) * s
            * w_scale.astype(jnp.float32)).astype(x.dtype)
