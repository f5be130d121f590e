"""Fused GEGLU → down-projection Pallas kernel (the transformer FF tail).

The r4c itemization traced both models' single biggest per-op gap to the
FF second projections (``ff/net_2``): XLA fuses the GEGLU gate multiply
*into* the dot's input, so the fusion streams BOTH GEGLU halves
(``[M, 2K]``) from HBM while interleaving VPU gelu work between MXU
tiles — measured ~60 TF/s + ~245 GB/s, ~30% of either peak (SDXL-1024:
0.44 ms vs a 0.14 ms floor, ×~45 instances ≈ 13 ms/step; SD1.5-512:
the five 38 TF/s ``add_add_fusion`` = 2.2 ms/step).

This kernel does the same fusion properly pipelined: per (m, n, k) grid
cell it loads the value/gate tiles (two views of the same ``[M, 2K]``
array), computes ``value · gelu(gate)`` on the VPU in f32, and
immediately MXU-dots the bf16 product against the weight tile into an
f32 accumulator — one HBM read of the halves, no materialized product,
Mosaic double-buffers tiles across sequential grid steps.

Reference semantics: diffusers ``GEGLU`` (value half first, exact/erf
gelu) followed by ``nn.Dense`` — ``models/layers.py:GEGLU/FeedForward``,
reference fork ``models/attention.py`` FeedForward.  Bias is NOT fused
(the caller adds it; XLA folds that into the residual add).

Differentiable via ``custom_vjp`` (backward recomputes through the XLA
reference) — latent guidance takes ``jax.grad`` through UNets running
this kernel, like ``flash_attention_packed``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# default OFF until chip-validated (fused-GN lesson: opaque kernels must
# win END-TO-END, not in isolation)
FUSED = os.environ.get("THEATERGEN_FUSED_GEGLU", "0") == "1"

INTERPRET = False

_LANE = 128
_SUBLANE = 8
# same raised scoped-VMEM budget as the flash kernels: big blocks are
# what buy the one-pass traffic (physical VMEM is 128M)
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 80 * 1024 * 1024


def _plan(m: int, k: int, n: int) -> tuple[int, int, int]:
    """(bm, bk, bn) minimizing HBM traffic under the VMEM budget.

    bn = N always (single n step → the GEGLU halves stream exactly
    once); bm as large as fits (weights re-read once per m block); bk
    sized so the double-buffered half tiles stay modest.  Returns
    (0, 0, 0) if nothing fits."""
    if n > 2048:
        return 0, 0, 0
    for bm in (8192, 4096, 2048, 1024, 512, 256, 128):
        if bm > m or m % bm:
            continue
        for bk in (1024, 512, 256, 128):
            if bk > k or k % bk:
                continue
            vmem = (2 * (bm * bk * 2) * 2      # v,g tiles, double-buffered
                    + (bk * n * 2) * 2         # w tile, double-buffered
                    + bm * n * 4               # f32 accumulator scratch
                    + bm * n * 2 * 2)          # out tile (+headroom)
            if vmem <= _VMEM_BUDGET:
                return bm, bk, n
    return 0, 0, 0


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def supported(m: int, k: int, n: int, dtype) -> bool:
    """Gate: runs on TPU (or the interpreter) and the [M, K, N] problem
    blocks cleanly on Mosaic's (8, 128) grid."""
    if dtype != jnp.bfloat16 and not INTERPRET:
        return False
    if not (_on_tpu() or INTERPRET):
        return False
    return _plan(m, k, n)[0] > 0


def _erf(x: jnp.ndarray) -> jnp.ndarray:
    """f32 erf for the kernel body — Mosaic has no erf primitive
    (NotImplementedError on lowering, r4e).  Abramowitz & Stegun 7.1.26:
    max abs error 1.5e-7, two decades below bf16 resolution, so outputs
    match the XLA exact-gelu path after bf16 rounding."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (0.254829592 + t * (-0.284496736 + t * (
        1.421413741 + t * (-1.453152027 + t * 1.061405429))))
    return s * (1.0 - poly * jnp.exp(-ax * ax))


def _kernel(v_ref, g_ref, w_ref, o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(2) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    gate = g_ref[...].astype(jnp.float32)
    # exact-erf gelu — matches nn.gelu(approximate=False) in the XLA path
    act = 0.5 * gate * (1.0 + _erf(gate * (2.0 ** -0.5)))
    h = (v_ref[...].astype(jnp.float32) * act).astype(v_ref.dtype)
    acc_ref[...] += jax.lax.dot(h, w_ref[...],
                                preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(2) == nk - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _geglu_matmul_2d(hg: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """[M, 2K] × [K, N] → [M, N] with the gelu-gate folded in."""
    m, k2 = hg.shape
    k, n = w.shape
    assert k2 == 2 * k, (hg.shape, w.shape)
    bm, bk, bn = _plan(m, k, n)
    assert bm and bk and bn, (m, k, n)
    nk = k // bk
    grid = (m // bm, n // bn, nk)
    return pl.pallas_call(
        functools.partial(_kernel, nk=nk),
        out_shape=jax.ShapeDtypeStruct((m, n), hg.dtype),
        grid=grid,
        in_specs=[
            # value and gate: two block views of the same [M, 2K] array
            pl.BlockSpec((bm, bk), lambda i, j, kk: (i, kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bm, bk), lambda i, j, kk, NK=nk: (i, NK + kk),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, bn), lambda i, j, kk: (kk, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, bn), lambda i, j, kk: (i, j),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((bm, bn), jnp.float32)],
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * m * k * n,
            bytes_accessed=m * 2 * k * 2 + k * n * 2 + m * n * 2,
            transcendentals=m * k,
        ),
    )(hg, hg, w)


def _reference(hg: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """XLA path with identical semantics (backward + fallback)."""
    k = w.shape[0]
    value, gate = hg[..., :k], hg[..., k:]
    h = (value.astype(jnp.float32)
         * jax.nn.gelu(gate.astype(jnp.float32), approximate=False)
         ).astype(hg.dtype)
    return jnp.einsum("...k,kn->...n", h, w)


@jax.custom_vjp
def geglu_matmul(hg: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """``value·gelu(gate) @ w`` over ``hg = [..., M, 2K]``, ``w = [K, N]``.

    The leading dims of ``hg`` are flattened into M for the kernel.
    """
    lead = hg.shape[:-2]
    m = 1
    for d in lead:
        m *= d
    hg2 = hg.reshape(m * hg.shape[-2], hg.shape[-1])
    out = _geglu_matmul_2d(hg2, w)
    return out.reshape(*lead, hg.shape[-2], w.shape[1])


def _fwd(hg, w):
    return geglu_matmul(hg, w), (hg, w)


def _bwd(res, g):
    hg, w = res
    _, vjp = jax.vjp(_reference, hg, w)
    return vjp(g)


geglu_matmul.defvjp(_fwd, _bwd)
