"""Sweep flash-attention block sizes at the SD1.5 hot shape on the TPU.

One jitted program per variant runs the kernel 20× back-to-back (summed
outputs force sequencing), so the axon tunnel's per-dispatch overhead
amortizes away; prints ms per kernel invocation.
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

    from theatergen_tpu.ops.flash_attention import flash_attention

    b, s, h, d = 8, 4096, 8, 40
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)
    reps = 20

    def bench(name, fn):
        @jax.jit
        def many(q, k, v):
            # genuine sequential dependency so CSE can't collapse the reps
            def body(carry, _):
                out = fn(carry, k, v)
                return q + out * jnp.bfloat16(1e-3), out

            carry, outs = jax.lax.scan(body, q, None, length=reps)
            return carry

        import numpy as np

        try:
            np.asarray(many(q, k, v)[0, 0, 0])
        except Exception as e:
            print(f"{name:34s} FAILED: {str(e)[:120]}")
            return None
        # block_until_ready through the axon tunnel returns before the
        # remote execution finishes; force a data fetch to time honestly
        t0 = time.perf_counter()
        np.asarray(many(q, k, v)[0, 0, 0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:34s} {dt:7.3f} ms/call")
        return dt

    bench("xla dot_product_attention", lambda q, k, v:
          jax.nn.dot_product_attention(q, k, v))
    for bq, bk in [(512, 4096), (256, 4096), (1024, 4096),
                   (512, 2048), (512, 1024), (256, 1024),
                   (1024, 2048), (2048, 4096)]:
        bench(f"flash bq={bq} bk={bk}",
              functools.partial(flash_attention, q_block=bq, k_block=bk))


if __name__ == "__main__":
    main()
