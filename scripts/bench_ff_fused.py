"""Isolated microbench of the full-FF fused kernel (ops/geglu_matmul.py
ff_matmul) vs the XLA reference, across VMEM budgets and both SDXL FF
shape families.

Chains N kernel applications through a data dependency (x_{i+1} =
x_i + eps * ff(x_i)) inside one jit, so tunnel timing can't early-return
(the round-1/r4c artifact), and fetches a dependent scalar.

Usage (chip):  python scripts/bench_ff_fused.py
Env: THEATERGEN_FF_VMEM_MB is swept internally (module reload).
"""

import importlib
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from theatergen_tpu.utils.fastinit import setup_compile_cache

setup_compile_cache()

SHAPES = [  # (M, d, inner-half K): SDXL 64^2 and 32^2 levels, B1 CFG
    (8192, 640, 2560),
    (2048, 1280, 5120),
]
# CHAIN must swamp the axon tunnel's ~40 ms per-call round trip: with
# CHAIN=20 every config measured "2.0 ms/instance" including the XLA
# reference that runs 0.30 ms in-model (r4h2) — pure overhead/20.
CHAIN = 200
TRIALS = 3


def time_chain(fn, x, args):
    def chained(x0, *a):
        def body(c, _):
            y = fn(c, *a)
            return c + (y * jnp.bfloat16(1e-3)).astype(c.dtype), ()
        out, _ = jax.lax.scan(body, x0, None, length=CHAIN)
        return jnp.sum(out[:1, :1])

    jitted = jax.jit(chained)
    s = jitted(x, *args)
    float(s)  # force full execution (dependent fetch)
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(jitted(x, *args))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    import theatergen_tpu.ops.geglu_matmul as gg

    for (m, d, k) in SHAPES:
        ks = jax.random.split(jax.random.key(0), 4)
        x = jax.random.normal(ks[0], (m, d), jnp.bfloat16)
        w1 = jax.random.normal(ks[1], (d, 2 * k), jnp.bfloat16) * 0.05
        b1 = jax.random.normal(ks[2], (2 * k,), jnp.float32) * 0.1
        w2 = jax.random.normal(ks[3], (k, d), jnp.bfloat16) * 0.05
        mxu_floor_ms = 6 * m * d * k / 197e12 * 1e3

        t_ref = time_chain(gg._ff_reference, x, (w1, b1, w2)) * 1e3
        print(f"--- ({m},{d},{k})  MXU floor {mxu_floor_ms:.3f} ms | "
              f"XLA ref {t_ref:.3f} ms", flush=True)

        for pipe, budgets in ((1, (96, 48)), (0, (96, 48))):
            for mb in budgets:
                os.environ["THEATERGEN_FF_VMEM_MB"] = str(mb)
                os.environ["THEATERGEN_FF_PIPELINE"] = str(pipe)
                importlib.reload(gg)
                bm, bk = gg._plan_full(m, d, k)
                if not bm:
                    print(f"  pipe={pipe} vmem {mb:3d}M: no plan", flush=True)
                    continue
                t = time_chain(gg.ff_matmul, x, (w1, b1, w2)) * 1e3
                print(f"  pipe={pipe} vmem {mb:3d}M (bm={bm}, bk={bk}): "
                      f"{t:.3f} ms ({mxu_floor_ms / t * 100:.0f}% MXU)",
                      flush=True)
        for v in ("THEATERGEN_FF_VMEM_MB", "THEATERGEN_FF_PIPELINE"):
            os.environ.pop(v, None)
        importlib.reload(gg)


if __name__ == "__main__":
    main()
