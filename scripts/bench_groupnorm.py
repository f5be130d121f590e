"""Isolated GroupNorm micro-benchmark on the TPU.

Compares flax nn.GroupNorm (lane-masked per-group reductions: SD1.5's
32 groups × 10 channels land in the minor dim) against a matmul-stats
variant (per-group sums via a [C, G] indicator matrix → MXU/lane-friendly)
at the SD1.5 UNet activation shapes.
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20):
    """One jitted scan-carry program + forced fetch (per BENCH_NOTES the
    tunnel's ~1.6 ms dispatch overhead swamps sub-ms per-dispatch timing)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    @jax.jit
    def many(x):
        def body(carry, _):
            out = fn(carry, *args[1:])
            return carry + out * jnp.asarray(1e-3, carry.dtype), None
        carry, _ = jax.lax.scan(body, x, None, length=iters)
        return carry

    np.asarray(many(args[0]).ravel()[0])   # compile + warm
    t0 = time.perf_counter()
    np.asarray(many(args[0]).ravel()[0])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from theatergen_tpu.utils.fastinit import setup_compile_cache

    setup_compile_cache()

    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    import numpy as np

    shapes = [
        (8, 64, 64, 320),
        (8, 32, 32, 640),
        (8, 16, 16, 1280),
        (8, 8, 8, 1280),
    ]
    groups = 32

    for shape in shapes:
        b, h, w, c = shape
        x = jax.device_put(jax.random.normal(
            jax.random.key(0), shape, jnp.bfloat16))
        scale = jnp.ones((c,), jnp.bfloat16)
        bias = jnp.zeros((c,), jnp.bfloat16)

        gn = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32)
        params = gn.init(jax.random.key(1), x.astype(jnp.float32))["params"]

        @jax.jit
        def flax_gn(x, params=params, gn=gn):
            out = gn.apply({"params": params}, x.astype(jnp.float32))
            return nn.silu(out).astype(x.dtype)

        # indicator matrix: [C, G] one-hot of each channel's group
        ind = np.zeros((c, groups), np.float32)
        for ch in range(c):
            ind[ch, ch // (c // groups)] = 1.0
        ind_j = jnp.asarray(ind)
        n_per_group = (c // groups) * h * w

        @jax.jit
        def matmul_gn(x, scale=scale, bias=bias):
            xf = x.astype(jnp.float32).reshape(b, h * w, c)
            s1 = jnp.einsum("bnc,cg->bg", xf, ind_j)
            s2 = jnp.einsum("bnc,cg->bg", xf * xf, ind_j)
            mean = s1 / n_per_group
            var = s2 / n_per_group - mean * mean
            inv = jax.lax.rsqrt(var + 1e-5)
            # broadcast per-group stats back to channels
            mean_c = jnp.einsum("bg,cg->bc", mean, ind_j)
            inv_c = jnp.einsum("bg,cg->bc", inv, ind_j)
            out = (xf - mean_c[:, None]) * inv_c[:, None]
            out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
            return nn.silu(out).reshape(shape).astype(x.dtype)

        from theatergen_tpu.ops import groupnorm as gn_ops

        @jax.jit
        def fused(x, scale=scale, bias=bias):
            return gn_ops.fused_group_norm(x, scale, bias,
                                           num_groups=groups, act="silu")

        fused_ok = gn_ops.supported(shape, x.dtype, groups)
        t_flax = timeit(flax_gn, x)
        t_mm = timeit(matmul_gn, x)
        t_fused = timeit(fused, x) if fused_ok else float("nan")
        gb = np.prod(shape) * 2 * 2 / 1e9   # read + write bf16
        fused_col = (f"{t_fused:7.3f} ms | speedup {t_flax / t_fused:5.2f}x"
                     if fused_ok else
                     f"   n/a (unsupported) | mm speedup "
                     f"{t_flax / t_mm:5.2f}x")
        print(f"{shape}: flax {t_flax:7.3f} ms | matmul-stats {t_mm:7.3f} ms"
              f" | bw-bound ~{gb / 0.819:6.3f} ms"
              f" | fused-pallas {fused_col}")

        # numerics check
        a = flax_gn(x)
        bb = matmul_gn(x)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - bb.astype(jnp.float32))))
        line = f"    max |diff| matmul = {err:.5f}"
        if fused_ok:
            cc = fused(x)
            err_f = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                          - cc.astype(jnp.float32))))
            line += f"  fused = {err_f:.5f}"
        print(line)


if __name__ == "__main__":
    main()
