"""Chip probe for the online flat kernel (Sk > 4096, the SDXL 16k route).

Correctness vs the copy-based online kernel at the SDXL 16k shape, then a
(bq, bk) sweep of ``_flat_online_call`` against the copy-based production
route — the decision data for VERDICT r2 next-#6 (extend the flat kernel
past 4096 vs close the item).  Timing protocol as bench_flash_probe3.py:
one jitted program with a sequential scan carry + forced host fetch
(tunnel: ``block_until_ready`` returns early, dispatch ~1.6 ms).
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

    # the copy-based baseline below must NOT be redirected by env flags —
    # _flash_attention_impl is gate-dispatched, so pin every gate off and
    # call the flat-online path explicitly where it is the subject
    fa.FLAT = False
    fa.FLAT_ONLINE = False
    fa.BSHD_NATIVE = False

    reps = 20

    def bench(name, fn, *args):
        @jax.jit
        def many(*a):
            def body(carry, _):
                out = fn(carry, *a[1:])
                return carry + out * jnp.asarray(1e-3, carry.dtype), None

            carry, _ = jax.lax.scan(body, a[0], None, length=reps)
            return carry

        try:
            np.asarray(many(*args).ravel()[0])
        except Exception as e:
            print(f"{name:44s} FAILED: {str(e)[:110]}", flush=True)
            return None
        t0 = time.perf_counter()
        np.asarray(many(*args).ravel()[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:44s} {dt:7.3f} ms/call", flush=True)
        return dt

    cases = [
        ("sdxl-16k b2 s16384 h10 d64", 2, 16384, 10, 64),
        ("sdxl-16k-cfg b4 s16384 h10 d64", 4, 16384, 10, 64),
        ("8k b4 s8192 h8 d64", 4, 8192, 8, 64),
    ]
    for label, b, s, h, d in cases:
        print(f"== {label} ==", flush=True)
        dp = fa._pad_head_dim(d)
        q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)

        assert fa.flat_online_supported(q, k), (label, "gate rejected")
        bq0, bk0 = fa._flat_online_blocks(s, s, h, dp)
        print(f"auto blocks: bq={bq0} bk={bk0}", flush=True)

        @jax.jit
        def check(q, k, v):
            ref = fa._flash_attention_impl(q, k, v, 512, 4096)  # copy-based
            got = fa._flash_attention_flat_online(q, k, v)
            return jnp.max(jnp.abs((got - ref).astype(jnp.float32)))

        try:
            err = float(check(q, k, v))
            print(f"flat-online vs copy-online max abs err: {err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"correctness FAILED: {str(e)[:110]}", flush=True)
            continue

        def flat(x):
            return (x if dp == d else jnp.pad(
                x, ((0, 0), (0, 0), (0, 0), (0, dp - d)))).reshape(
                b, s, h * dp)

        qf = flat(q * jnp.asarray(d ** -0.5 * fa.LOG2E, q.dtype))
        kf, vf = flat(k), flat(v)
        # oversized pairs fail the VMEM compile and print FAILED — that is
        # itself sweep data (the budget calibration in _flat_online_blocks)
        for bq in (128, 256, 512):
            for bk in (1024, 2048, 4096):
                bench(f"flat-online@bq{bq}/bk{bk}", functools.partial(
                    fa._flat_online_call, h=h, dp=dp, bq=bq, bk=bk),
                    qf, kf, vf)
        bench("prod-route copy-based (pads incl)", functools.partial(
            fa._flash_attention_impl, q_block=512, k_block=4096), q, k, v)
        bench("prod-route flat-online (pads incl)",
              fa._flash_attention_flat_online, q, k, v)


if __name__ == "__main__":
    main()
