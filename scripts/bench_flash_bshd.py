"""BSHD-native vs copy-based flash kernel on the TPU, at the SD1.5/SDXL
hot shapes.

The copy-based path materializes transposed+padded [B*H, S, 64] copies of
Q/K/V and un-transposes O around the pallas_call (six HBM passes); the
BSHD-native kernel indexes the [B, S, H, D] arrays directly with 4-D
BlockSpecs.  One jitted scan per variant (20 sequential reps) + a forced
fetch, per the axon-tunnel timing rules (BENCH_NOTES.md).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from theatergen_tpu.utils.fastinit import setup_compile_cache

    setup_compile_cache()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.ops import flash_attention as fa

    reps = 20

    def bench(name, fn, q, k, v):
        @jax.jit
        def many(q, k, v):
            def body(carry, _):
                out = fn(carry, k, v)
                return q + out * jnp.bfloat16(1e-3), out

            carry, _ = jax.lax.scan(body, q, None, length=reps)
            return carry

        try:
            np.asarray(many(q, k, v)[0, 0, 0])
        except Exception as e:
            print(f"{name:44s} FAILED: {str(e)[:120]}")
            return None
        t0 = time.perf_counter()
        np.asarray(many(q, k, v)[0, 0, 0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:44s} {dt:7.3f} ms/call")
        return dt

    # (label, b, s, h, d, bq, bk): SD1.5 level-0 self-attn (CFG batch),
    # SDXL 1024px level-1 (16384 tokens), SD1.5 level-1
    cases = [
        ("sd15 L0  b8 s4096 h8 d40", 8, 4096, 8, 40, 512, 4096),
        ("sd15 L0  b8 s4096 h8 d40 bk2048", 8, 4096, 8, 40, 512, 2048),
        ("sdxl L1  b2 s16384 h10 d64", 2, 16384, 10, 64, 512, 4096),
        ("sd15 L1  b8 s1024 h8 d80", 8, 1024, 8, 80, 512, 1024),
    ]
    for label, b, s, h, d, bq, bk in cases:
        q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)
        copy = bench(f"{label} copy-based",
                     functools.partial(fa._flash_attention_impl,
                                       q_block=bq, k_block=bk), q, k, v)
        bshd = bench(f"{label} BSHD-native",
                     functools.partial(fa._flash_attention_bshd,
                                       q_block=bq, k_block=bk), q, k, v)
        if copy and bshd:
            print(f"{label}: BSHD is {copy / bshd:.2f}x")


if __name__ == "__main__":
    main()
