"""Flat-layout flash kernel prototype: [B, S, H*Dp] in/out, zero copies.

The copy-based call pays ~1.4 ms/call at L0 in transpose+pad passes
(bench_flash_parts.py).  If the QKV projections emit the per-head-padded
flat layout directly (zero weight columns — free), a kernel that blocks
``(1, bq, H*Dp)`` tiles perfectly (H*Dp is a 128-multiple at every SD
shape) and loops heads over 64-lane slices inside VMEM, eliminating all
six HBM passes.  Requires sk == k_block (single K block: no online
state); VMEM bounds this to sk ≤ 4096, F = H*Dp ≤ 640 — exactly the
SD1.5 L0/L1 and SDXL-4096 shapes.  Probes bq and logits dtype.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    os.environ["THEATERGEN_FLASH_FLAT"] = "1"   # before the fa import

    from theatergen_tpu.utils.fastinit import setup_compile_cache

    setup_compile_cache()

    import functools

    import jax
    import jax.numpy as jnp
    import numpy as np
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from theatergen_tpu.ops import flash_attention as fa

    reps = 20
    LOG2E = fa.LOG2E

    def flat_kernel(q_ref, k_ref, v_ref, o_ref, *, h, dp, bf16_logits):
        pet = jnp.bfloat16 if bf16_logits else jnp.float32
        for hh in range(h):
            sl = slice(hh * dp, (hh + 1) * dp)
            q = q_ref[0, :, sl]                        # [bq, dp]
            k = k_ref[0, :, sl]                        # [sk, dp]
            v = v_ref[0, :, sl]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())), preferred_element_type=pet)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True).astype(jnp.float32)
            acc = jax.lax.dot(p.astype(v.dtype), v,
                              preferred_element_type=jnp.float32)
            inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
            o_ref[0, :, sl] = (acc * inv).astype(o_ref.dtype)

    def call_flat(qf, kf, vf, h, dp, d_true, bq, bf16_logits=False):
        b, sq, f = qf.shape
        sk = kf.shape[1]
        qf = qf * jnp.asarray(d_true ** -0.5 * LOG2E, qf.dtype)
        grid = (b, sq // bq)
        return pl.pallas_call(
            functools.partial(flat_kernel, h=h, dp=dp,
                              bf16_logits=bf16_logits),
            out_shape=jax.ShapeDtypeStruct((b, sq, f), qf.dtype),
            grid=grid,
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
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
                vmem_limit_bytes=fa._VMEM_LIMIT,
            ),
        )(qf, kf, vf)

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
            print(f"{name:40s} FAILED: {str(e)[:110]}", flush=True)
            return None
        t0 = time.perf_counter()
        np.asarray(many(*args).ravel()[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:40s} {dt:7.3f} ms/call", flush=True)
        return dt

    cases = [
        ("sd15-L0 b8 s4096 h8 d40", 8, 4096, 8, 40),
        ("sd15-L1 b8 s1024 h8 d80", 8, 1024, 8, 80),
        ("sdxl-4k b2 s4096 h10 d64", 2, 4096, 10, 64),
        ("sdxl-16k b2 s16384 h10 d64", 2, 16384, 10, 64),
    ]
    for label, b, s, h, d in cases:
        print(f"== {label} ==", flush=True)
        dp = fa._pad_head_dim(d)
        q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)

        def flat(x):
            return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - d))
                           ).reshape(b, s, h * dp)
        qf, kf, vf = flat(q), flat(k), flat(v)

        # correctness vs the copy-based online kernel (one jitted program:
        # eager ops each pay a remote compile through the tunnel)
        bq0 = fa._flat_q_block(s, s, h * dp)
        fa.FLAT = False

        @jax.jit
        def check(q, k, v, qf, kf, vf):
            ref = fa._flash_attention_impl(q, k, v, 512, 4096)
            got = call_flat(qf, kf, vf, h, dp, d, bq0).reshape(b, s, h, dp)
            return jnp.max(jnp.abs((got[..., :d] - ref
                                    ).astype(jnp.float32)))

        try:
            err = float(check(q, k, v, qf, kf, vf))
            print(f"flat-vs-online (bq{bq0}) max abs err: {err:.4f}",
                  flush=True)
        except Exception as e:
            print(f"flat correctness (bq{bq0}) FAILED: {str(e)[:110]}",
                  flush=True)
        fa.FLAT = True

        for bq in (128, 256, 512):
            if bq > s:
                continue
            bench(f"flat@bq{bq}", functools.partial(
                call_flat, h=h, dp=dp, d_true=d, bq=bq), qf, kf, vf)
        # and the production route end-to-end (pads + kernel + slice when
        # flat applies; the copy-based path otherwise, e.g. 16k)
        with_flat = "flat" if fa.flat_supported(q, k) else "copy"
        bench(f"prod-route [{with_flat}] (pads incl)", functools.partial(
            fa._flash_attention_impl, q_block=512, k_block=4096), q, k, v)


if __name__ == "__main__":
    main()
