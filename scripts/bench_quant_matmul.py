"""On-device W8A8 matmul benchmark at SD1.5 UNet shapes.

Compares bf16 XLA dot, XLA W8A8 (QuantDense numerics: quant/dequant as
separate XLA ops), and the fused Pallas kernel.  Timing uses a scan with
a sequential carry + forced host fetch (the axon tunnel's
block_until_ready returns early)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from theatergen_tpu.utils.fastinit import setup_compile_cache

    setup_compile_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.ops import quant_matmul as QM
    from theatergen_tpu.ops.quant import quantize_weight

    reps = 20
    # (M, K, N): GEGLU in/out and attention projections at batch-8 CFG
    shapes = [
        (32768, 320, 2560), (32768, 1280, 320), (32768, 320, 320),
        (8192, 640, 5120), (8192, 2560, 640),
        (2048, 1280, 10240), (2048, 5120, 1280), (2048, 1280, 1280),
    ]

    def bench(name, fn, x):
        @jax.jit
        def many(x):
            def body(carry, _):
                out = fn(carry)
                # fold output back into the carry so reps can't be CSE'd
                upd = out[:, :x.shape[1]] if out.shape[1] >= x.shape[1] \
                    else jnp.pad(out, ((0, 0), (0, x.shape[1] - out.shape[1])))
                return x + upd.astype(x.dtype) * jnp.bfloat16(1e-3), None

            carry, _ = jax.lax.scan(body, x, None, length=reps)
            return carry

        try:
            np.asarray(many(x)[0, 0])
        except Exception as e:
            print(f"  {name:24s} FAILED: {str(e)[:100]}")
            return None
        t0 = time.perf_counter()
        np.asarray(many(x)[0, 0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        return dt

    for m, k, n in shapes:
        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(m, k).astype(np.float32) * 0.5,
                        jnp.bfloat16)
        w = rng.randn(k, n).astype(np.float32) * 0.05
        wq, ws = quantize_weight(w)
        wq, ws = jnp.asarray(wq), jnp.asarray(ws)
        wb = jnp.asarray(w, jnp.bfloat16)

        tf = 2 * m * k * n / 1e12
        r_bf16 = bench("bf16", lambda xx: xx @ wb, x)
        r_xla8 = bench("xla-w8a8", lambda xx: QM.reference_quant_matmul(
            xx, wq, ws), x)
        r_fused = bench("pallas-fused-w8a8", lambda xx: QM.quant_matmul(
            xx, wq, ws), x)
        line = f"M{m:6d} K{k:5d} N{n:6d}:"
        for nm, r in [("bf16", r_bf16), ("xla8", r_xla8),
                      ("fused8", r_fused)]:
            if r:
                line += f"  {nm} {r:7.3f}ms ({tf / (r / 1e3):5.0f} T/s)"
            else:
                line += f"  {nm}    FAIL"
        print(line, flush=True)


if __name__ == "__main__":
    main()
