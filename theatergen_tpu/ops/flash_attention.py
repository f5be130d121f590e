"""Pallas TPU flash attention for the diffusion self-attention shapes.

SD-style UNets at 512×512 run self-attention at sequence lengths 4096 / 1024
/ 256 / 64 with head dims 40 / 80 / 160 (SDXL reaches 16384 tokens,
SURVEY.md §5).  Plain XLA attention materializes the ``[B, H, Sq, Sk]``
logits in HBM — ~1 GB per layer at Sq=Sk=4096 — making the op HBM-bound.
This kernel keeps the whole K/V for one (batch, head) resident in VMEM
(4096×128×bf16 = 1 MB) and streams Q blocks through it, so logits never
leave VMEM: one softmax, two MXU matmuls, no online-softmax bookkeeping
needed at these lengths.

Head dims are zero-padded to the 128-lane boundary outside the kernel; the
padding contributes nothing to QK^T and pads V columns with zeros that are
sliced off, and costs no extra MXU time versus what XLA would pay for the
same sub-128 contraction.

Layout: inputs ``[B, S, H, D]`` (BSHD), internally ``[B*H, S, Dp]``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128
DEFAULT_Q_BLOCK = 256
# Use the kernel only when the K length is large enough that HBM logits
# traffic dominates; below this XLA's fused path is fine.
MIN_KV_FOR_FLASH = 1024
# K/V for one (batch, head) must fit VMEM comfortably.
MAX_KV_SEQ = 32768


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _pad_head_dim(d: int) -> int:
    """Pad the head dim to a Mosaic-friendly lane width: 64 for small heads
    (SD1.5's d=40 — padding to 128 would waste 3.2× MXU work on QK^T),
    otherwise the next 128 multiple."""
    return 64 if d <= 64 else _round_up(d, 128)


def supported(q: jnp.ndarray, k: jnp.ndarray) -> bool:
    """Whether the flash kernel applies to these BSHD shapes."""
    sq, sk = q.shape[1], k.shape[1]
    return (
        sk >= MIN_KV_FOR_FLASH
        and sk <= MAX_KV_SEQ
        and sk % LANE == 0
        and q.ndim == 4
        and k.ndim == 4
    )


LOG2E = 1.4426950408889634


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float):
    q = q_ref[0]  # [bq, d]
    k = k_ref[0]  # [S, d]
    v = v_ref[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    # softmax in base 2: exp(x) == exp2(x * log2 e); exp2 is the VPU's
    # native exponential, and at 4096² logits per block the transcendental
    # throughput is a first-order cost
    logits = logits * (scale * LOG2E)
    m = jnp.max(logits, axis=-1, keepdims=True)
    p = jnp.exp2(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    p = (p / denom).astype(v.dtype)
    o_ref[0] = jnp.dot(p, v, preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("q_block",))
def flash_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, q_block: int = DEFAULT_Q_BLOCK
) -> jnp.ndarray:
    """Attention over BSHD tensors; returns [B, Sq, H, D].

    Requires ``supported(q, k)``; Sq is padded to the Q-block size, head dim
    padded to the lane width.
    """
    b, sq, h, d = q.shape
    sk = k.shape[1]
    dp = _pad_head_dim(d)
    bq = min(q_block, _round_up(sq, LANE))
    sq_p = _round_up(sq, bq)

    qr = jnp.transpose(q, (0, 2, 1, 3)).reshape(b * h, sq, d)
    qr = jnp.pad(qr, ((0, 0), (0, sq_p - sq), (0, dp - d)))
    kr = jnp.transpose(k, (0, 2, 1, 3)).reshape(b * h, sk, d)
    kr = jnp.pad(kr, ((0, 0), (0, 0), (0, dp - d)))
    vr = jnp.transpose(v, (0, 2, 1, 3)).reshape(b * h, sk, d)
    vr = jnp.pad(vr, ((0, 0), (0, 0), (0, dp - d)))

    grid = (b * h, sq_p // bq)
    out = pl.pallas_call(
        functools.partial(_attn_kernel, scale=d ** -0.5),
        out_shape=jax.ShapeDtypeStruct((b * h, sq_p, dp), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, sk, dp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, bq, dp), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        # both grid dims are embarrassingly parallel (no cross-program
        # reduction) → the Mosaic scheduler may split them across the two
        # v5e megacores
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * (b * h) * sq_p * sk * dp,
            bytes_accessed=(b * h) * (sq_p * dp * 2 + 2 * sk * dp * 2),
            transcendentals=(b * h) * sq_p * sk,
        ),
    )(qr, kr, vr)
    out = out[:, :sq, :d].reshape(b, h, sq, d)
    return jnp.transpose(out, (0, 2, 1, 3))
