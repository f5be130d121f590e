"""Sweep flat-kernel q-block sizes at the two SDXL-1024 self-attention
shapes (VERDICT r3 next-#1: "tune the flat/flat16k block pair at SDXL's
4096/1024 shapes").

SDXL-1024 CFG step shapes (config.sdxl_config):
  level 1: B=2, S=4096, h=10, d=64  (64x64 maps, 640 ch, 2 layers x2)
  level 2 + mid: B=2, S=1024, h=20, d=64  (32x32 maps, 1280 ch, 30 layers)

The auto picker (_flat_q_block) prefers bq=256 — calibrated on SD1.5
shapes (probe3).  This sweeps bq at the SDXL shapes through the packed
flat kernel exactly as the UNet invokes it, plus the XLA fused SDPA as
control.  20 back-to-back invocations per variant inside one jitted
program (summed outputs force sequencing) to amortize tunnel dispatch.

Usage: python scripts/bench_flash_sdxl.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from theatergen_tpu.utils.fastinit import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp

    from theatergen_tpu.ops import flash_attention as fa

    reps = 20
    shapes = [
        ("sdxl-4k (64x64, h10 d64)", 2, 4096, 10, 64),
        ("sdxl-1k (32x32, h20 d64)", 2, 1024, 20, 64),
    ]
    if jax.default_backend() == "cpu":   # CI smoke: interpreter, tiny
        fa.INTERPRET = True
        reps = 1
        shapes = [("smoke (h2 d64)", 1, 1024, 2, 64)]

    import numpy as np

    for label, b, s, h, d in shapes:
        dp = fa._pad_head_dim(d)
        f = h * dp
        # pre-scaled q per the packed contract (d^-0.5·log2e folded in);
        # without it the softmax is pathologically sharp and bf16
        # correctness comparison is meaningless (r4b lesson)
        qf = jax.random.normal(
            jax.random.key(0), (b, s, f), jnp.bfloat16
        ) * jnp.bfloat16(d ** -0.5 * fa.LOG2E)
        kf = jax.random.normal(jax.random.key(1), (b, s, f), jnp.bfloat16)
        vf = jax.random.normal(jax.random.key(2), (b, s, f), jnp.bfloat16)
        auto_bq = fa._flat_q_block(s, s, f, 2)
        print(f"\n=== {label}: auto bq={auto_bq} ===")

        def timed(fn, tag):
            @jax.jit
            def many(q, k, v):
                acc = jnp.zeros((), jnp.float32)
                out = None
                for i in range(reps):
                    out = fn(q + acc.astype(q.dtype), k, v)
                    acc = acc + out[0, 0, 0].astype(jnp.float32)
                return acc, out

            try:
                r = many(qf, kf, vf)
                np.asarray(r[0])   # forced host fetch — the only honest
                # sync through the axon tunnel (BENCH_NOTES round 1)
            except Exception as e:
                print(f"  {tag:>16}: FAILED {type(e).__name__}: {e}")
                return None
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(many(qf, kf, vf)[0])
                best = min(best, (time.perf_counter() - t0) / reps)
            print(f"  {tag:>16}: {best * 1e3:8.3f} ms/call")
            return r[1]

        ref = None
        for bq in (128, 256, 512, 1024):
            if bq > s or s % bq:
                continue
            out = timed(
                lambda q, k, v, _bq=bq: _flat_call_bq(
                    fa, q, k, v, h, dp, _bq),
                f"flat bq={bq}")
            if bq == auto_bq:
                ref = out

        # XLA fused attention control (same packed contract)
        def xla_ref(q, k, v):
            return fa._packed_reference(q, k, v, h).astype(q.dtype)

        out = timed(xla_ref, "xla fused")
        if ref is not None and out is not None:
            err = float(jnp.max(jnp.abs(
                ref.astype(jnp.float32) - out.astype(jnp.float32))))
            print(f"  max |flat - xla| = {err:.4f}")


def _flat_call_bq(fa, qf, kf, vf, h, dp, bq):
    """_flat_call with an explicit q block (bypasses the auto picker)."""
    import functools

    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, sq, f = qf.shape
    sk = kf.shape[1]
    return pl.pallas_call(
        functools.partial(fa._attn_kernel_flat, h=h, dp=dp),
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
        interpret=fa.INTERPRET,
        compiler_params=None if fa.INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
            vmem_limit_bytes=fa._VMEM_LIMIT,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * sq * sk * dp,
            bytes_accessed=b * sq * f * 2 * 2 + 2 * b * sk * f * 2,
            transcendentals=b * h * sq * sk,
        ),
    )(qf, kf, vf)


if __name__ == "__main__":
    main()
