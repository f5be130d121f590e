"""Block-tuning sweep of the fused GEGLU→net_2 kernel at the SDXL
shapes (VERDICT r4 next-#3: the band runs at ~52% of its 9.7 ms floor;
v3 takes ~a third of the gap — this sweeps (bm, bk) beyond the two
planners to see if any block beats v3's pick per shape).

Chains kernel applications through a data dependency inside one jit
(the bench_ff_fused.py recipe) so tunnel timing can't early-return.

Usage (chip):  python scripts/bench_geglu_sweep.py
"""

from __future__ import annotations

import importlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theatergen_tpu.utils.fastinit import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp

# the SDXL-1024 B1-CFG geglu→net_2 shapes: (M, K=inner half, N=d).
# 64² level (d=640, 2 layers x 2 blocks) and 32² level (d=1280, 10x2).
SHAPES = [
    (8192, 2560, 640),
    (2048, 5120, 1280),
]
# candidate blocks per shape: the two planners' picks plus a grid around
# them (bm x bk); illegal combos skip inside the kernel's validator.
BLOCKS = [
    (8192, 512), (4096, 512), (2048, 512), (1024, 512), (512, 512),
    (2048, 1024), (1024, 1024), (512, 1024), (256, 1024),
    (2048, 256), (1024, 256), (512, 256),
]
CHAIN = 200
TRIALS = 3


def time_chain(fn, x, w):
    def chained(x0, ww):
        def body(c, _):
            y = fn(c, ww)
            # fold the [M, N] output back into the [M, 2K] input's slice
            c = c.at[:, : y.shape[1]].add((y * jnp.bfloat16(1e-3))
                                          .astype(c.dtype))
            return c, ()
        out, _ = jax.lax.scan(body, x0, None, length=CHAIN)
        return jnp.sum(out[:1, :1].astype(jnp.float32))

    jitted = jax.jit(chained)
    s = jitted(x, w)
    float(s)                               # dependent fetch
    best = float("inf")
    for _ in range(TRIALS):
        t0 = time.perf_counter()
        float(jitted(x, w))
        best = min(best, time.perf_counter() - t0)
    return best / CHAIN


def main():
    results = {}
    for (m, k, n) in SHAPES:
        x = jax.random.normal(jax.random.key(0), (m, 2 * k),
                              jnp.bfloat16) * 0.02
        w = jax.random.normal(jax.random.key(1), (k, n),
                              jnp.bfloat16) * 0.02
        rows = []
        for plan, block in ([("v2", None), ("v3", None)]
                            + [("forced", b) for b in BLOCKS]):
            os.environ["THEATERGEN_GEGLU_PLAN"] = (
                plan if plan != "forced" else "v3")
            os.environ["THEATERGEN_GEGLU_BLOCK"] = (
                f"{block[0]},{block[1]}" if block else "")
            # planner rows must time the PLANNER's organic pick, not the
            # chip-validated override the sweep exists to re-validate
            os.environ["THEATERGEN_GEGLU_MEASURED"] = "0"
            import theatergen_tpu.ops.geglu_matmul as gg

            gg = importlib.reload(gg)
            got = gg._plan(m, k, n)
            if not got[0]:
                continue
            if block and (got[0], got[1]) != block:
                continue                    # validator rejected: skip
            label = f"{plan}:{got[0]}x{got[1]}"
            if any(r[0].endswith(f":{got[0]}x{got[1]}") for r in rows):
                continue                    # same block already timed
            dt = time_chain(gg._geglu_matmul_2d, x, w)
            rows.append((label, dt))
            print(f"[{m}x{k}->{n}] {label}: {dt*1e3:.3f} ms", flush=True)
        rows.sort(key=lambda r: r[1])
        results[f"{m}x{k}->{n}"] = [
            {"plan": lbl, "ms": round(dt * 1e3, 3)} for lbl, dt in rows]
    os.environ["THEATERGEN_GEGLU_BLOCK"] = ""
    print(json.dumps(results))


if __name__ == "__main__":
    main()
