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

# default ON: chip-validated end-to-end r4f (v2 traffic-minimizing
# planner) — SDXL-1024 0.2978 vs 0.2882 control (+3.3%), SD1.5-512
# headline 1.4615 vs 1.4254 (+2.5%), both 0.1% spread
FUSED = os.environ.get("THEATERGEN_FUSED_GEGLU", "1") == "1"

INTERPRET = False

_LANE = 128
_SUBLANE = 8
# same raised scoped-VMEM budget as the flash kernels: big blocks are
# what buy the one-pass traffic (physical VMEM is 128M)
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 80 * 1024 * 1024


# planner A/B (r4k, confirmed r5a): "v2" = traffic-minimizing
# whole-N/max-M blocks (the r4f default), "v3" = pipeline-depth planner.
# v2 puts the whole M in one block at the big shapes (e.g. SDXL 64²:
# bm=8192, bk=512 → a 5-cell grid), leaving Mosaic's DMA/compute
# pipeline almost no steps to overlap across — the same failure mode
# the r4h2 full-FF sweep measured (small-bk/lean budgets beat big
# blocks at every shape).  v3 instead requires ≥16 grid cells (while
# keeping the halves' per-row DMA segments ≥ 512 B via bk ≥ 256 when
# possible) so warmup/cooldown amortize; the weight re-reads this costs
# are negligible (the w matrices are ~3-13 MB vs 84 MB of activation
# halves).  Chip A/B (r4k logs, data/bench_logs/): SDXL 0.3031 (v3) vs
# 0.2976 (v2) img/s, SD1.5 tie (1.5305 vs 1.5299) → default v3.
GEGLU_PLAN = os.environ.get("THEATERGEN_GEGLU_PLAN", "v3")

# explicit block override for sweeps: "bm,bk" forces that block at every
# shape it legally fits (divides M/K, multiple of 8, inside the VMEM
# budget) — shapes it doesn't fit fall back to the active planner.
_BLOCK_ENV = os.environ.get("THEATERGEN_GEGLU_BLOCK", "")

_MIN_CELLS = 16

# chip-validated block picks that beat the planners at specific shapes
# (r5c sweep + end-to-end A/B, data/bench_logs/r5c_geglu_sweep.log /
# r5c_sdxl_block2048x256.log): at SDXL's d=1280 shape the finer-k
# (2048, 256) block pipelines better than v3's (512, 1024) — 0.346 vs
# 0.354 ms isolated, +0.8% SDXL end-to-end (0.3054 vs 0.3031).  v3's
# pick at the d=640 shape was tied-optimal (0.449 ms) and stays.
# Shape-key caveat: SD1.5 batch-4 CFG at its 16² level produces the SAME
# (2048, 5120, 1280) problem (a THEATERGEN_FUSED_FF=0 triage rerun is
# the only SD1.5 path that reaches this kernel there) — r5f chip A/B of
# that exact config validates/updates the entry for both programs.
# THEATERGEN_GEGLU_MEASURED=0 disables the table (pure planner —
# sweeps and triage); THEATERGEN_GEGLU_BLOCK / GEGLU_PLAN=v2 override.
_MEASURED_BLOCKS = {
    (2048, 5120, 1280): (2048, 256),
}
MEASURED_ENABLE = os.environ.get("THEATERGEN_GEGLU_MEASURED", "1") == "1"


def _forced_block(m: int, k: int, n: int):
    if not _BLOCK_ENV:
        return None
    try:
        bm, bk = (int(v) for v in _BLOCK_ENV.split(","))
    except ValueError:
        raise ValueError(
            f"THEATERGEN_GEGLU_BLOCK={_BLOCK_ENV!r}: expected 'bm,bk'")
    if (bm <= 0 or bk <= 0 or bm % 8 or bk % 128
            or bm > m or m % bm or bk > k or k % bk):
        return None
    vmem = (2 * (bm * bk * 2) * 2 + (bk * n * 2) * 2
            + bm * n * 4 + bm * n * 2 * 2)
    if vmem > _VMEM_BUDGET:
        return None
    return bm, bk, n


def _plan_v3(m: int, k: int, n: int) -> tuple[int, int, int]:
    best = (0, 0, 0)
    for bk in (1024, 512, 256, 128):
        if bk > k or k % bk:
            continue
        for bm in (2048, 1024, 512, 256, 128):
            if bm > m or m % bm:
                continue
            vmem = (2 * (bm * bk * 2) * 2
                    + (bk * n * 2) * 2
                    + bm * n * 4
                    + bm * n * 2 * 2)
            if vmem > _VMEM_BUDGET // 2:
                continue
            if not best[0]:
                best = (bm, bk, n)
            if (m // bm) * (k // bk) >= _MIN_CELLS:
                return bm, bk, n
    return best


def _plan(m: int, k: int, n: int) -> tuple[int, int, int]:
    """(bm, bk, bn) minimizing HBM traffic under the VMEM budget.

    bn = N always (single n step → the GEGLU halves stream exactly
    once); bm as large as fits (weights re-read once per m block); bk
    sized so the double-buffered half tiles stay modest.  Returns
    (0, 0, 0) if nothing fits."""
    if n > 2048:
        return 0, 0, 0
    forced = _forced_block(m, k, n)
    if forced is not None:
        return forced
    if (MEASURED_ENABLE and GEGLU_PLAN == "v3"
            and (m, k, n) in _MEASURED_BLOCKS):
        bm, bk = _MEASURED_BLOCKS[(m, k, n)]
        return bm, bk, n
    if GEGLU_PLAN == "v3":
        plan = _plan_v3(m, k, n)
        if plan[0]:
            return plan
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


# ---------------------------------------------------------------------------
# Full-FF fusion (r4g): up-projection + GEGLU gate + down-projection in
# ONE kernel.  The r4f profile showed the band split ~evenly between the
# up-proj XLA fusions (70 ops, 21.3 ms, 176 TF/s — fast but writing the
# [M, 8d] proj output to HBM, 167.8 MB at SDXL's 64² level) and the v2
# down kernel (18.7 ms, HBM-bound re-reading it).  Streaming the inner
# dimension in k blocks keeps the intermediate entirely in VMEM: per-
# instance floors become 0.41 ms MXU / ≤0.09 ms HBM — purely MXU-bound.
# THEATERGEN_FUSED_FF: "1" = every supported shape, "0" = never,
# "auto" (default) = per model family via ``UNetConfig.fused_ff``
# (SD1.5 True, SDXL False).  Chip A/Bs r4i/r4j: fusing every instance
# wins SD1.5 (1.5292 vs 1.4615 headline, +4.6%) but loses SDXL
# (0.2873/0.2845 vs the 0.2978 v2-geglu split) — and the preference is
# monotonic per model, not per shape: a min-M row gate at 16384/8192
# gave SD1.5 only 1.4828/1.5098, i.e. even the (8192,640) and
# (2048,1280) instances that LOSE inside the SDXL program (and lose
# 6-15% isolated, r4h2) win inside SD1.5's.  The discriminator is the
# surrounding program, so the gate is the model config, not the shape.

_FF_ENV = os.environ.get("THEATERGEN_FUSED_FF", "auto")
if _FF_ENV not in ("0", "1", "auto"):
    # a typo like 'true'/'on' must not silently run as the auto control
    # arm of an A/B (ADVICE r4)
    raise ValueError(
        f"THEATERGEN_FUSED_FF={_FF_ENV!r}: expected '0', '1', or 'auto'")
FUSED_FULL = _FF_ENV != "0"
FF_FORCE = _FF_ENV == "1"

# The full-FF kernel's VMEM appetite is a *system* tradeoff, not just a
# kernel one: the r4g profile showed 70 big-VMEM pallas calls starve
# XLA's prefetch scheduler around them (conv band +15 ms/step on SDXL,
# async-dma 0.39→0.09 ms) even though the kernel band itself was fine.
# Default 48: the r4h2 isolated sweep had lean-budget/small-bk fastest
# at every shape (finer DMA/compute pipelining), and the r4i end-to-end
# SD1.5 win (1.5292) was measured at 48M.
FF_VMEM_MB = int(os.environ.get("THEATERGEN_FF_VMEM_MB", "48"))


def _ff_budget() -> tuple[int, int]:
    limit = FF_VMEM_MB * 1024 * 1024
    return limit, int(limit * 5 / 6)


def _plan_full(m: int, d: int, k: int) -> tuple[int, int]:
    """(bm, bk) for the full-FF kernel: bm maximal (weights re-read once
    per m block), then bk maximal (fewer k steps) under the VMEM budget.
    ``k`` is the inner (GEGLU half) width.  Returns (0, 0) if no fit."""
    _, budget = _ff_budget()
    for bm in (4096, 2048, 1024, 512, 256, 128):
        if bm > m or m % bm:
            continue
        # bk is the LAST dim of the w1 tiles → must be a 128-multiple
        # (Mosaic lane constraint; bk=320 was rejected at lowering, r4h)
        for bk in (2048, 1280, 1024, 640, 512, 256, 128):
            if bk > k or k % bk:
                continue
            vmem = (bm * d * 2                 # x tile (constant over k)
                    + 2 * (d * bk * 2) * 2     # w1 value/gate tiles, dbl-buf
                    + (bk * d * 2) * 2         # w2 tile, double-buffered
                    + 2 * 2 * (bm * bk * 4)    # u, g pipeline scratch pairs
                    + bm * bk * 2              # h (bf16 product)
                    + bm * d * 4               # f32 accumulator scratch
                    + bm * d * 2 * 2)          # out tile (+headroom)
            if vmem <= budget:
                return bm, bk
    return 0, 0


def ff_supported(m: int, d: int, k: int, dtype) -> bool:
    if dtype != jnp.bfloat16 and not INTERPRET:
        return False
    if not (_on_tpu() or INTERPRET):
        return False
    return _plan_full(m, d, k)[0] > 0


def _erf_fast(x: jnp.ndarray) -> jnp.ndarray:
    """A&S 7.1.25 3-term erf (max abs err 2.5e-5 ≪ bf16 rounding) with a
    base-2 exponential — ~25% fewer VPU ops than the 7.1.26 5-term used
    by the down-only kernel.  The FF band is MXU/VPU-serialization
    bound, so VPU op count is on the critical path."""
    s = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.47047 * ax)
    poly = t * (0.3480242 + t * (-0.0958798 + t * 0.7478556))
    return s * (1.0 - poly * jnp.exp2(ax * ax * -1.4426950408889634))


# pipeline A/B: 1 = two-stage software pipeline (drain step, double-
# buffered scratch), 0 = naive serial body.  Default 0: the r4h2
# isolated sweep shows the pipeline LOSES at every shape (the u/g
# scratch round-trips through VMEM cost more than the VPU band they
# hide) — Mosaic's own DMA pipelining across small-bk grid steps does
# the overlap better.
PIPELINE = os.environ.get("THEATERGEN_FF_PIPELINE", "0") == "1"


def _ff_kernel(x_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref, w2_ref,
               o_ref, acc_ref, u0, g0, u1, g1, *, nk: int):
    """Software-pipelined over the k grid dim (nk+1 steps): step k issues
    the u/g up-projection dots for chunk k (async on the MXU), then the
    VPU computes bias+gelu+gate on chunk k-1's dots (even/odd scratch
    pairs — STATIC parity branches; dynamic ``u_s[k % 2]`` indexing
    lowered to something catastrophic, 1.886 ms vs the 0.60 ms naive at
    SDXL's 64² shape) while the MXU crunches, and the down-dot for chunk
    k-1 accumulates.  The naive 1-stage version measured 0.2755 on SDXL
    (vs 0.2978 v2-geglu): the serial dot→gelu→dot chain leaves the MXU
    idle for the whole VPU band."""
    k = pl.program_id(1)
    even = k % 2 == 0

    def produce(u_s, g_s):
        x = x_ref[...]
        u_s[...] = jax.lax.dot(x, w1v_ref[...],
                               preferred_element_type=jnp.float32)
        g_s[...] = jax.lax.dot(x, w1g_ref[...],
                               preferred_element_type=jnp.float32)

    def consume(u_s, g_s):
        g = g_s[...] + b1g_ref[...]
        u = u_s[...] + b1v_ref[...]
        act = 0.5 * g * (1.0 + _erf_fast(g * (2.0 ** -0.5)))
        h = (u * act).astype(o_ref.dtype)
        acc_ref[...] += jax.lax.dot(h, w2_ref[...],
                                    preferred_element_type=jnp.float32)

    # stage A: issue this chunk's up-projection dots (MXU, async)
    @pl.when((k < nk) & even)
    def _produce_even():
        produce(u0, g0)

    @pl.when((k < nk) & ~even)
    def _produce_odd():
        produce(u1, g1)

    @pl.when(k == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    # stage B: consume the previous chunk (VPU gelu overlaps stage A);
    # k odd consumes the even pair and vice versa
    @pl.when((k > 0) & ~even)
    def _consume_even():
        consume(u0, g0)

    @pl.when((k > 0) & even)
    def _consume_odd():
        consume(u1, g1)

    @pl.when(k == nk)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _ff_kernel_naive(x_ref, w1v_ref, w1g_ref, b1v_ref, b1g_ref, w2_ref,
                     o_ref, acc_ref, *, nk: int):
    @pl.when(pl.program_id(1) == 0)
    def _zero():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    x = x_ref[...]
    u = jax.lax.dot(x, w1v_ref[...],
                    preferred_element_type=jnp.float32) + b1v_ref[...]
    g = jax.lax.dot(x, w1g_ref[...],
                    preferred_element_type=jnp.float32) + b1g_ref[...]
    act = 0.5 * g * (1.0 + _erf_fast(g * (2.0 ** -0.5)))
    h = (u * act).astype(x_ref.dtype)
    acc_ref[...] += jax.lax.dot(h, w2_ref[...],
                                preferred_element_type=jnp.float32)

    @pl.when(pl.program_id(1) == nk - 1)
    def _store():
        o_ref[...] = acc_ref[...].astype(o_ref.dtype)


def _ff_matmul_2d(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
                  w2: jnp.ndarray) -> jnp.ndarray:
    """[M, D] → GEGLU(x@w1 + b1) @ w2, inner dim streamed in VMEM.

    Numerics note (ADVICE r4): the fused kernel keeps the GEGLU
    intermediate (bias add + gate multiply) in f32, while the unfused /
    v2-geglu paths round the up-projection to bf16 before the gate.
    Fused-on vs fused-off outputs are therefore tolerance-equal, NOT
    bit-equal (fused is the more precise side); tests bound the drift.
    Relevant for reproducibility triage across SD1.5 (fused) vs
    THEATERGEN_FUSED_FF=0 reruns."""
    m, d = x.shape
    k = w2.shape[0]
    assert w1.shape == (d, 2 * k) and b1.shape == (2 * k,) \
        and w2.shape == (k, d), (x.shape, w1.shape, b1.shape, w2.shape)
    bm, bk = _plan_full(m, d, k)
    assert bm and bk, (m, d, k)
    nk = k // bk
    b1r = b1.reshape(1, 2 * k).astype(jnp.float32)

    if PIPELINE:
        grid = (m // bm, nk + 1)
        kernel = functools.partial(_ff_kernel, nk=nk)
        scratch = [pltpu.VMEM((bm, d), jnp.float32),
                   pltpu.VMEM((bm, bk), jnp.float32),
                   pltpu.VMEM((bm, bk), jnp.float32),
                   pltpu.VMEM((bm, bk), jnp.float32),
                   pltpu.VMEM((bm, bk), jnp.float32)]

        def _a(kk):  # stage-A chunk (clamped at the drain step)
            return jnp.minimum(kk, nk - 1)

        def _b(kk):  # stage-B chunk (clamped at step 0)
            return jnp.maximum(kk - 1, 0)
    else:
        grid = (m // bm, nk)
        kernel = functools.partial(_ff_kernel_naive, nk=nk)
        scratch = [pltpu.VMEM((bm, d), jnp.float32)]

        def _a(kk):
            return kk

        def _b(kk):
            return kk

    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((m, d), x.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((bm, d), lambda i, kk: (i, 0),
                         memory_space=pltpu.VMEM),
            # stage-A tiles: value/gate column blocks of w1
            pl.BlockSpec((d, bk), lambda i, kk: (0, _a(kk)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((d, bk), lambda i, kk, NK=nk: (0, NK + _a(kk)),
                         memory_space=pltpu.VMEM),
            # stage-B tiles: biases + w2
            pl.BlockSpec((1, bk), lambda i, kk: (0, _b(kk)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk), lambda i, kk, NK=nk: (0, NK + _b(kk)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((bk, d), lambda i, kk: (_b(kk), 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bm, d), lambda i, kk: (i, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=scratch,
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
            vmem_limit_bytes=_ff_budget()[0],
        ),
        cost_estimate=pl.CostEstimate(
            flops=6 * m * d * k,
            bytes_accessed=(m * d * 2 * 2 + d * 2 * k * 2 + k * d * 2),
            transcendentals=m * k,
        ),
    )(x, w1, w1, b1r, b1r, w2)


def _ff_reference(x, w1, b1, w2):
    """XLA path with identical semantics (backward + fallback)."""
    hg = (jnp.einsum("...d,dk->...k", x, w1).astype(jnp.float32)
          + b1.astype(jnp.float32))
    k = w2.shape[0]
    value, gate = hg[..., :k], hg[..., k:]
    h = (value * jax.nn.gelu(gate, approximate=False)).astype(x.dtype)
    return jnp.einsum("...k,kn->...n", h, w2)


@jax.custom_vjp
def ff_matmul(x: jnp.ndarray, w1: jnp.ndarray, b1: jnp.ndarray,
              w2: jnp.ndarray) -> jnp.ndarray:
    """Full transformer-FF fusion: ``GEGLU(x @ w1 + b1) @ w2`` with the
    ``[M, 2K]`` intermediate never leaving VMEM.  Leading dims of ``x``
    flatten into M.  The net_2 bias is NOT fused (caller adds it)."""
    lead = x.shape[:-2]
    m = 1
    for s in lead:
        m *= s
    x2 = x.reshape(m * x.shape[-2], x.shape[-1])
    out = _ff_matmul_2d(x2, w1, b1, w2)
    return out.reshape(*lead, x.shape[-2], x.shape[-1])


def _ff_fwd(x, w1, b1, w2):
    return ff_matmul(x, w1, b1, w2), (x, w1, b1, w2)


def _ff_bwd(res, g):
    x, w1, b1, w2 = res
    _, vjp = jax.vjp(_ff_reference, x, w1, b1, w2)
    return vjp(g)


ff_matmul.defvjp(_ff_fwd, _ff_bwd)


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
