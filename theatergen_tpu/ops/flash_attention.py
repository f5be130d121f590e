"""Pallas TPU flash attention for the diffusion self-attention shapes.

SD-style UNets at 512×512 run self-attention at sequence lengths 4096 /
1024 / 256 with head dims 40 / 80 / 160 (SDXL reaches 16384 tokens,
SURVEY.md §5).  Plain XLA attention materializes the ``[B, H, Sq, Sk]``
logits in HBM — hundreds of MB per layer at Sq=Sk=4096 — making the op
HBM-bound; measured on v5e this kernel is ~2.5× faster than
``jax.nn.dot_product_attention`` at the 4096-token layers.

Design (canonical online-softmax tiling; see the JAX pallas ops guide):
- grid ``(batch*heads, q_blocks, k_blocks)`` with the K axis innermost
  ("arbitrary" — a reduction); running max/sum/accumulator live in VMEM
  scratch across K tiles, so MXU matmuls and VPU softmax passes pipeline
  across iterations instead of serializing one giant logits tensor;
- base-2 softmax (``exp2`` is the VPU's native exponential) with the
  ``1/sqrt(d)`` scale folded into Q before the matmul, and the final
  ``1/l`` normalization applied to the [bq, d] output instead of the
  [bq, Sk] probabilities — the VPU passes over logits-sized tensors are a
  first-order cost at these shapes;
- head dims zero-padded to the 64-lane boundary outside the kernel
  (SD1.5's d=40; padding to 128 would waste 3.2× MXU work on QK^T).

Layout: inputs ``[B, S, H, D]`` (BSHD), internally ``[B*H, S, Dp]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

LANE = 128
# overridable for block-size sweeps through the end-to-end bench
DEFAULT_Q_BLOCK = int(os.environ.get("THEATERGEN_FLASH_BQ", "512"))
DEFAULT_K_BLOCK = int(os.environ.get("THEATERGEN_FLASH_BK", "4096"))
# Use the kernel only when the K length is large enough that HBM logits
# traffic dominates; below this XLA's fused path is fine.
MIN_KV_FOR_FLASH = 1024
MAX_KV_SEQ = 32768

LOG2E = 1.4426950408889634

# set True (tests) to run the kernel through the Pallas interpreter on CPU
INTERPRET = False

# BSHD-native kernel: index the [B, S, H, D] arrays directly with 4-D
# BlockSpecs instead of materializing transposed+padded [B*H, S, 64]
# copies of Q/K/V (and un-transposing O) around the pallas_call — six
# full HBM passes per layer saved. Opt-in until measured on chip.
# MEASURED (scripts/bench_flash_bshd.py): does not compile on real TPUs —
# Mosaic requires the last two block dims divisible by (8, 128) and the
# trailing (h=1, d=40) blocks violate it; any head-minor layout tiles
# 4-6.4× inflated in VMEM. Kept for the interpreter; superseded by the
# flat layout below.
BSHD_NATIVE = os.environ.get("THEATERGEN_FLASH_BSHD", "0") == "1"

# Flat-layout kernel: [B, S, H*Dp] in/out (heads side by side, each
# zero-padded to the 64/128-lane boundary), loops heads over lane slices
# inside VMEM.  Removes the six transpose+pad HBM passes of the
# copy-based path — measured 1.4 ms of the 6.6 ms L0 call
# (scripts/bench_flash_parts.py).  Needs the whole K in one block (plain
# softmax, no online state), so it is bounded by scoped VMEM:
# 2·Sk·F·2B (K+V) + bq·Sk·4B (f32 logits) + 3·bq·F — the adaptive
# q-block below keeps it under budget for every SD1.5/SDXL self-attn
# shape with Sk ≤ 4096; longer sequences fall back to the copy-based
# online kernel.
# default ON: chip-validated 2026-08-18 (probe3: max abs err 0.0000 vs
# the online kernel at every supported shape; headline bench 1.41 img/s
# flat vs 1.31 copy-based).  Unsupported shapes (Sk > 4096, e.g. SDXL
# 16k) fall back to the online copy-based kernel automatically.
FLAT = os.environ.get("THEATERGEN_FLASH_FLAT", "1") == "1"
# Packed-projection path: the attention projections themselves emit the
# flat [B, S, H*Dp] layout (pad + softmax scale + base-2 conversion all
# folded into the projection *weights* — layers.CrossAttention), so the
# six per-layer HBM passes the flat kernel still pays (three jnp.pad
# copies in, one slice-back out, plus reshapes) disappear entirely.
# Exact math: pad lanes of q/k/v are zero columns of the packed weights,
# and the out-projection reads the kernel's (exactly zero) pad lanes
# through zero rows.  Default ON: chip-validated 2026-08-19 (same-session
# A/B through the driver path, 0.1% spread: packed 1.4283 img/s vs
# 1.4084 flat-only — BENCH_NOTES.md round 3c).
PACKED = os.environ.get("THEATERGEN_FLASH_PACKED", "1") == "1"
# Online-softmax variant of the flat kernel for Sk beyond the whole-K
# VMEM budget (SDXL's 16384-token blocks, SURVEY §5): same copy-free
# [B, S, H*Dp] layout, K axis blocked with per-head running max/sum/acc
# scratch — the copy-based kernel's six HBM transpose/pad passes
# disappear at 16k exactly as the flat kernel removed them at ≤4096.
# Default ON: chip-validated 2026-08-19 (bench_flash_flat16k on v5e,
# pads included, exact match vs the copy-based kernel: 17.70 vs
# 19.23 ms at 16k/h8/d40, 34.65 vs 37.51 at SDXL-16k, 8.19 vs 8.92 at
# 8k — ~8% at every shape; the auto (bq=256, bk=4096) picker matched
# the measured-best block pair everywhere).  BENCH_NOTES round 3c.
FLAT_ONLINE = os.environ.get("THEATERGEN_FLASH_FLAT16K", "1") == "1"
# Preferred q block for the flat kernels (0 = auto ladder).  The r4b
# isolated sweep at SDXL's 32×32 shape (b2 s1024 h20 d64) ordered
# bq1024 < bq512 < bq256; end-to-end A/B through the SDXL bench decides.
FLAT_BQ = int(os.environ.get("THEATERGEN_FLAT_BQ", "0"))
# The compiler's default scoped-vmem reservation is 16M, far below the
# 128M physical VMEM; the flat kernel raises its own limit and budgets
# against that (whole-K blocks are what buy the copy-free layout).
_VMEM_LIMIT = 96 * 1024 * 1024
_VMEM_BUDGET = 80 * 1024 * 1024


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_dim(d: int) -> int:
    """Pad the head dim to a Mosaic-friendly lane width: 64 for small heads
    (SD1.5's d=40), otherwise the next 128 multiple."""
    return 64 if d <= 64 else _round_up(d, 128)


def supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Whether the flash kernel applies to these BSHD shapes."""
    sq, sk = q.shape[1], k.shape[1]
    return (
        sk >= MIN_KV_FOR_FLASH
        and sk <= MAX_KV_SEQ
        and sk % 512 == 0
        and q.ndim == 4
        and k.ndim == 4
    )


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """One (bh, q_block, k_block) cell with online-softmax scratch."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]                      # [bq, d] (pre-scaled by sqrt(d)·log2e)
    k = k_ref[0]                      # [bk, d]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )                                 # [bq, bk] base-2 logits

    m_prev = m_ref[...]               # [bq, LANE]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)          # [bq, 1]
    m_next = jnp.maximum(m_prev, m_curr)                # [bq, LANE]
    alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])     # [bq, 1]
    p = jnp.exp2(s - m_next[:, :1])                     # [bq, bk]
    l_curr = jnp.sum(p, axis=1, keepdims=True)
    l_next = alpha * l_prev[:, :1] + l_curr
    m_ref[...] = jnp.broadcast_to(m_next[:, :1], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == nk - 1)
    def _store():
        l_fin = l_ref[...][:, :1]
        inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)


def _attn_kernel_bshd(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
    """Same online-softmax cell as :func:`_attn_kernel`, reading
    ``(1, bq, 1, d)`` / ``(1, bk, 1, d)`` blocks of the BSHD arrays (the
    head axis is blocked at 1; Mosaic masks the un-aligned ``d`` lanes)."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0, :, 0, :]             # [bq, d] (pre-scaled)
    k = k_ref[0, :, 0, :]             # [bk, d]
    v = v_ref[0, :, 0, :]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )

    m_prev = m_ref[...]
    l_prev = l_ref[...]
    m_curr = jnp.max(s, axis=1, keepdims=True)
    m_next = jnp.maximum(m_prev, m_curr)
    alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
    p = jnp.exp2(s - m_next[:, :1])
    l_curr = jnp.sum(p, axis=1, keepdims=True)
    l_next = alpha * l_prev[:, :1] + l_curr
    m_ref[...] = jnp.broadcast_to(m_next[:, :1], m_ref.shape)
    l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)

    acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32
    )

    @pl.when(k_idx == nk - 1)
    def _store():
        l_fin = l_ref[...][:, :1]
        inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
        o_ref[0, :, 0, :] = (acc_ref[...] * inv).astype(o_ref.dtype)


def _flat_q_block(sq: int, sk: int, f: int, itemsize: int = 2) -> int:
    """Largest q block keeping the flat kernel inside scoped VMEM.

    Calibrated against the compiler's scoped-vmem accounting (probe3:
    bq=256 at Sk=4096/F=512 allocates 17M, bq=128 16.5M): K+V blocks,
    the f32 logits held twice across the software-pipelined head loop
    (s and p), the bf16 p copy fed to the MXU, and double-buffered
    q/out blocks, plus ~2M fixed."""
    kv = 2 * sk * f * itemsize
    # 256 first: the probe3 chip sweep measured bq256 fastest at every
    # supported shape (L0 4.42 vs 5.11@512, L1 1.43, sdxl-4k 2.25 ms) —
    # bq512's larger logits buffer starves the double-buffered pipeline.
    # FLAT_BQ (THEATERGEN_FLAT_BQ) forces a preferred block for
    # end-to-end A/Bs (falls back to the default ladder if it doesn't
    # fit the shape or the VMEM budget).
    # only honor FLAT_BQ when it is a positive multiple of the TPU
    # sublane count — a 12 or 100 that happens to divide sq would pass
    # here and die later at Mosaic lowering instead of falling back
    # (ADVICE r4)
    prefs = ((FLAT_BQ, 256, 512, 128)
             if FLAT_BQ > 0 and FLAT_BQ % 8 == 0 else (256, 512, 128))
    for bq in prefs:
        if bq > sq or sq % bq != 0:
            continue
        est = (kv + 2 * bq * sk * 4 + bq * sk * itemsize
               + 4 * bq * f * itemsize + 2 * 1024 * 1024)
        if est <= _VMEM_BUDGET:
            return bq
    return 0


def flat_supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq != sk or sk > 4096:
        return False
    return _flat_q_block(sq, sk, h * _pad_head_dim(d),
                         q.dtype.itemsize) > 0


def _attn_kernel_flat(q_ref, k_ref, v_ref, o_ref, *, h: int, dp: int):
    """Whole-K softmax per (batch, q_block) cell; heads are 64/128-lane
    slices of the flat feature axis, processed one at a time so only a
    single [bq, Sk] logits buffer is ever live."""
    for hh in range(h):
        sl = slice(hh * dp, (hh + 1) * dp)
        q = q_ref[0, :, sl]                       # [bq, dp] (pre-scaled)
        k = k_ref[0, :, sl]                       # [sk, dp]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [bq, sk] base-2 logits
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot(p.astype(v.dtype), v,
                          preferred_element_type=jnp.float32)
        inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, :, sl] = (acc * inv).astype(o_ref.dtype)


def _flat_call(
    qf: jnp.ndarray, kf: jnp.ndarray, vf: jnp.ndarray, h: int, dp: int,
) -> jnp.ndarray:
    """Run the flat kernel over pre-packed [B, S, H*Dp] tensors (q already
    scaled by d^-0.5·log2e, pad lanes zero)."""
    b, sq, f = qf.shape
    sk = kf.shape[1]
    bq = _flat_q_block(sq, sk, f, qf.dtype.itemsize)
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat, h=h, dp=dp),
        out_shape=jax.ShapeDtypeStruct((b, sq, f), qf.dtype),
        grid=(b, sq // bq),
        in_specs=[
            pl.BlockSpec((1, bq, f), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, f), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, f), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM),
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * sk * dp,
            bytes_accessed=b * sq * f * 2 * 2 + 2 * b * sk * f * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)


def _flat_wrap(call_fn, q, k, v):
    """Shared pack/scale/unpack contract around the flat kernels: one
    fused lane-pad per input (no transposes), flat [B, S, H*Dp] blocks
    through ``call_fn``, slice back.  The packed-projection path folds
    this same contract into the projection weights — keep all three in
    sync."""
    b, sq, h, d = q.shape
    dp = _pad_head_dim(d)
    f = h * dp

    q = q * jnp.asarray(d ** -0.5 * LOG2E, q.dtype)

    def flat(x):
        return jnp.pad(
            x, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(
            x.shape[0], x.shape[1], f)

    out = call_fn(flat(q), flat(k), flat(v), h, dp)
    return out.reshape(b, sq, h, dp)[..., :d]


def _flash_attention_flat(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
) -> jnp.ndarray:
    """Copy-free whole-K path (Sk ≤ 4096)."""
    return _flat_wrap(_flat_call, q, k, v)


def _flat_online_blocks(
    sq: int, sk: int, h: int, dp: int, itemsize: int = 2
) -> tuple:
    """(bq, bk) for the online flat kernel, or (0, 0) when no block pair
    fits scoped VMEM.  Budget: double-buffered K/V and q/out blocks, the
    f32 logits held twice across the pipelined head loop plus the bf16
    copy fed to the MXU, per-head running max/sum lanes and the f32
    accumulator, ~2M fixed (same calibration as :func:`_flat_q_block`)."""
    f = h * dp
    for bk in (4096, 2048, 1024, 512):
        if bk > sk or sk % bk != 0:
            continue
        for bq in (256, 512, 128):
            if bq > sq or sq % bq != 0:
                continue
            est = (2 * 2 * bk * f * itemsize      # K, V (double-buffered)
                   + 2 * 2 * bq * f * itemsize    # q, out (double-buffered)
                   + 2 * bq * bk * 4 + bq * bk * itemsize   # s, p, p→bf16
                   + 2 * h * bq * LANE * 4        # running max/sum
                   + bq * f * 4                   # accumulator
                   + 2 * 1024 * 1024)
            if est <= _VMEM_BUDGET:
                return bq, bk
    return 0, 0


def flat_online_supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Self-attention shapes past the whole-K flat budget (Sk > 4096)
    that the online flat kernel can still tile copy-free."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    if sq != sk or sk <= 4096 or sk > MAX_KV_SEQ:
        return False
    return _flat_online_blocks(sq, sk, h, _pad_head_dim(d),
                               q.dtype.itemsize) != (0, 0)


def _attn_kernel_flat_online(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref,
                             acc_ref, *, h: int, dp: int):
    """Online-softmax cell over flat [B, S, H*Dp] blocks: grid
    (batch, q_blocks, k_blocks) with the K axis innermost; heads are lane
    slices with their own running max/sum/accumulator scratch rows."""
    k_idx = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(k_idx == 0)
    def _init():
        m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[...] = jnp.zeros_like(l_ref)
        acc_ref[...] = jnp.zeros_like(acc_ref)

    for hh in range(h):
        sl = slice(hh * dp, (hh + 1) * dp)
        q = q_ref[0, :, sl]                       # [bq, dp] (pre-scaled)
        k = k_ref[0, :, sl]                       # [bk, dp]
        v = v_ref[0, :, sl]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [bq, bk] base-2 logits
        m_prev = m_ref[hh]                        # [bq, LANE]
        l_prev = l_ref[hh]
        m_curr = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev[:, :1], m_curr)
        alpha = jnp.exp2(m_prev[:, :1] - m_next)
        p = jnp.exp2(s - m_next)
        l_next = alpha * l_prev[:, :1] + jnp.sum(p, axis=1, keepdims=True)
        m_ref[hh] = jnp.broadcast_to(m_next, m_prev.shape)
        l_ref[hh] = jnp.broadcast_to(l_next, l_prev.shape)
        acc_ref[hh] = acc_ref[hh] * alpha + jax.lax.dot(
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    @pl.when(k_idx == nk - 1)
    def _store():
        for hh in range(h):
            sl = slice(hh * dp, (hh + 1) * dp)
            l_fin = l_ref[hh][:, :1]
            inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
            o_ref[0, :, sl] = (acc_ref[hh] * inv).astype(o_ref.dtype)


def _flat_online_call(
    qf: jnp.ndarray, kf: jnp.ndarray, vf: jnp.ndarray, h: int, dp: int,
    bq: int | None = None, bk: int | None = None,
) -> jnp.ndarray:
    """Run the online flat kernel over pre-packed [B, S, H*Dp] tensors
    (same contract as :func:`_flat_call`; explicit bq/bk for sweeps —
    either may be given alone, the other comes from the auto budget)."""
    b, sq, f = qf.shape
    sk = kf.shape[1]
    auto_bq, auto_bk = _flat_online_blocks(sq, sk, h, dp, qf.dtype.itemsize)
    bq = auto_bq if bq is None else bq
    bk = auto_bk if bk is None else bk
    if not (bq and bk):
        raise ValueError(
            f"no (bq, bk) fits the VMEM budget for flat-online at "
            f"sq={sq} sk={sk} h={h} dp={dp} — gate with "
            f"flat_online_supported() first")
    return pl.pallas_call(
        functools.partial(_attn_kernel_flat_online, h=h, dp=dp),
        out_shape=jax.ShapeDtypeStruct((b, sq, f), qf.dtype),
        grid=(b, sq // bq, sk // bk),
        in_specs=[
            pl.BlockSpec((1, bq, f), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, f), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, f), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, f), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((h, bq, LANE), jnp.float32),   # running max
            pltpu.VMEM((h, bq, LANE), jnp.float32),   # running sum
            pltpu.VMEM((h, bq, dp), jnp.float32),     # output accumulator
        ],
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * sk * dp,
            bytes_accessed=b * sq * f * 2 * 2 + 2 * b * sk * f * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)


def _flash_attention_flat_online(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
) -> jnp.ndarray:
    """Copy-free path for Sk > 4096 (the 16k counterpart of
    :func:`_flash_attention_flat`)."""
    return _flat_wrap(_flat_online_call, q, k, v)


def packed_supported(sq: int, heads: int, head_dim: int,
                     itemsize: int = 2) -> bool:
    """Whether the packed-projection self-attention path applies (same
    shape rules as the flat kernel, stated on metadata — the packed path
    builds the [B, S, H*Dp] tensors directly, so there are no BSHD arrays
    to inspect)."""
    if sq < MIN_KV_FOR_FLASH or sq > 4096 or sq % 512 != 0:
        return False
    return _flat_q_block(sq, sq, heads * _pad_head_dim(head_dim),
                         itemsize) > 0


def _packed_reference(qf, kf, vf, heads: int):
    """XLA reference over packed tensors (backward path).  q is pre-scaled
    by d^-0.5·log2e, so base-e softmax needs logits·ln2 (= /log2e); pad
    lanes of k are zero so they never influence logits, pad lanes of v are
    zero so output pad lanes stay exactly zero — gradients w.r.t. pad
    lanes vanish identically, matching the zero pad columns of the packed
    projection weights."""
    b, s, f = qf.shape
    dp = f // heads
    shape = (b, s, heads, dp)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk",
        qf.reshape(shape).astype(jnp.float32) * (1.0 / LOG2E),
        kf.reshape(shape).astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1)
    out = jnp.einsum("bhqk,bkhd->bqhd", p.astype(vf.dtype),
                     vf.reshape(shape))
    return out.reshape(b, s, f)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention_packed(
    qf: jnp.ndarray, kf: jnp.ndarray, vf: jnp.ndarray,
    heads: int, head_dim: int,
) -> jnp.ndarray:
    """Self-attention over pre-packed flat [B, S, H*Dp] tensors → same.

    Contract (enforced by the packed projections in
    ``models.layers.CrossAttention``): heads are lane slices of width
    ``Dp = _pad_head_dim(head_dim)``; pad lanes of all three inputs are
    zero; q is pre-scaled by ``head_dim**-0.5 * log2(e)``.  Output pad
    lanes are exactly zero.  Requires ``packed_supported``.

    Differentiable via ``custom_vjp`` (backward recomputes through the
    XLA path) — latent guidance takes ``jax.grad`` through UNets whose
    self-attention runs this kernel.
    """
    dp = _pad_head_dim(head_dim)
    assert qf.shape[-1] == heads * dp, (qf.shape, heads, dp)
    return _flat_call(qf, kf, vf, heads, dp)


def _packed_fwd(qf, kf, vf, heads, head_dim):
    dp = _pad_head_dim(head_dim)
    assert qf.shape[-1] == heads * dp, (qf.shape, heads, dp)
    out = _flat_call(qf, kf, vf, heads, dp)
    return out, (qf, kf, vf)


def _packed_bwd(heads, head_dim, residuals, g):
    qf, kf, vf = residuals
    _, vjp = jax.vjp(
        lambda a, b, c: _packed_reference(a, b, c, heads), qf, kf, vf)
    return vjp(g)


flash_attention_packed.defvjp(_packed_fwd, _packed_bwd)


def _flash_attention_bshd(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    q_block: int, k_block: int,
) -> jnp.ndarray:
    """BSHD-native path: no transpose/pad copies around the kernel."""
    b, sq, h, d = q.shape
    sk = k.shape[1]
    bq = min(q_block, sq)
    bk = min(k_block, sk)
    while sk % bk != 0:
        bk -= LANE

    q = q * jnp.asarray(d ** -0.5 * LOG2E, q.dtype)

    grid = (b * h, sq // bq, sk // bk)
    return pl.pallas_call(
        _attn_kernel_bshd,
        out_shape=jax.ShapeDtypeStruct((b, sq, h, d), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, 1, d),
                         lambda i, j, kk, H=h: (i // H, j, i % H, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, d),
                         lambda i, j, kk, H=h: (i // H, kk, i % H, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, 1, d),
                         lambda i, j, kk, H=h: (i // H, kk, i % H, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, 1, d),
                               lambda i, j, kk, H=h: (i // H, j, i % H, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, LANE), jnp.float32),
            pltpu.VMEM((bq, d), jnp.float32),   # native d; Mosaic pads tiles
        ],
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * sq * sk * d,
            bytes_accessed=(b * h) * (sq * d * 2 + 2 * sk * d * 2),
            transcendentals=(b * h) * sq * sk,
        ),
    )(q, k, v)


def _flash_attention_impl(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    q_block: int, k_block: int,
) -> jnp.ndarray:
    if q_block % LANE != 0 or k_block % LANE != 0:
        raise ValueError(
            f"q_block and k_block must be multiples of {LANE}; got "
            f"({q_block}, {k_block})")
    if BSHD_NATIVE and q.shape[1] % min(q_block, q.shape[1]) == 0:
        return _flash_attention_bshd(q, k, v, q_block, k_block)
    if FLAT and flat_supported(q, k):
        return _flash_attention_flat(q, k, v)
    if FLAT_ONLINE and flat_online_supported(q, k):
        return _flash_attention_flat_online(q, k, v)
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dp = _pad_head_dim(d)
    bq = min(q_block, _round_up(sq, LANE))
    # K blocks must tile sk exactly or trailing keys would be dropped; sk is
    # a 512-multiple (supported()), so a 128-multiple divisor always exists
    # (worst case bk = 128).
    bk = min(k_block, sk)
    while sk % bk != 0:
        bk -= LANE
    sq_p = _round_up(sq, bq)

    # fold softmax scale (and the base-2 conversion) into q
    q = q * jnp.asarray(d ** -0.5 * LOG2E, q.dtype)

    qr = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, sq, d)
    qr = jnp.pad(qr, ((0, 0), (0, sq_p - sq), (0, dp - d)))
    kr = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, sk, d)
    kr = jnp.pad(kr, ((0, 0), (0, 0), (0, dp - d)))
    vr = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, sk, d)
    vr = jnp.pad(vr, ((0, 0), (0, 0), (0, dp - d)))

    grid = (b * h, sq_p // bq, sk // bk)
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bk, dp), lambda i, j, kk: (i, kk, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bq, dp), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((bq, LANE), jnp.float32),   # running max
            pltpu.VMEM((bq, LANE), jnp.float32),   # running sum
            pltpu.VMEM((bq, dp), jnp.float32),     # output accumulator
        ],
        interpret=INTERPRET,
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * sq_p * sk * dp,
            bytes_accessed=(b * h) * (sq_p * dp * 2 + 2 * sk * dp * 2),
            transcendentals=(b * h) * sq_p * sk,
        ),
    )(qr, kr, vr)
    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    q_block: int = DEFAULT_Q_BLOCK, k_block: int = DEFAULT_K_BLOCK,
) -> jnp.ndarray:
    """Attention over BSHD tensors; returns [B, Sq, H, D].

    Requires ``supported(q, k)``; Sq is padded to the Q-block size, head
    dim padded to the lane width.

    Differentiable via ``custom_vjp``: the backward recomputes attention
    through the XLA path (Pallas kernels have no automatic VJP) — required
    because both the latent-guidance energy and the trainer take
    ``jax.grad`` through UNets whose self-attention runs this kernel.
    """
    return _flash_attention_impl(q, k, v, q_block, k_block)


def _reference_attention(q, k, v):
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * (d ** -0.5),
        k.astype(jnp.float32))
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bhqk,bkhd->bqhd", p.astype(v.dtype), v)


def _flash_fwd(q, k, v, q_block, k_block):
    return _flash_attention_impl(q, k, v, q_block, k_block), (q, k, v)


def _flash_bwd(q_block, k_block, residuals, g):
    q, k, v = residuals
    _, vjp = jax.vjp(_reference_attention, q, k, v)
    return vjp(g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
