"""Decompose the flash-attention call into measurable parts on the TPU.

The L0 self-attention call (b8 s4096 h8 d40) measures 5.75 ms against a
~1.4 ms MXU floor (275 GFLOP padded / ~200 TFLOP/s bf16), so ~75% of the
call is NOT matmul.  Candidate costs: the transpose+pad copies around the
pallas_call, and the VPU softmax passes (max, exp2, sum, bf16 cast) over
the [bq, Sk] logits.  Each variant below isolates one term:

  full        — the production call (copies + kernel)
  kernel      — pallas_call only, inputs pre-transposed/padded [B*H,S,64]
  mxu-sum     — sum(p) ridden on the MXU via a ones-column in V
  no-max      — max pass + rescale removed (UNSAFE numerics: probe only)
  no-exp2     — exp2 replaced by identity   (WRONG result:   probe only)
  dots-only   — QK^T and PV matmuls only    (MXU floor)
  xla         — jax.nn.dot_product_attention reference

One jitted scan (20 reps) + forced fetch per variant, per the axon-tunnel
timing rules in BENCH_NOTES.md.
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
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from theatergen_tpu.ops import flash_attention as fa

    reps = 20

    def make_kernel(mode):
        def kern(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref):
            k_idx = pl.program_id(2)
            nk = pl.num_programs(2)

            @pl.when(k_idx == 0)
            def _init():
                m_ref[...] = jnp.full_like(m_ref, -jnp.inf)
                l_ref[...] = jnp.zeros_like(l_ref)
                acc_ref[...] = jnp.zeros_like(acc_ref)

            q = q_ref[0]
            k = k_ref[0]
            v = v_ref[0]
            s = jax.lax.dot_general(
                q, k, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

            if mode == "dots-only":
                acc_ref[...] += jax.lax.dot(
                    s.astype(v.dtype), v, preferred_element_type=jnp.float32)
                @pl.when(k_idx == nk - 1)
                def _store0():
                    o_ref[0] = acc_ref[...].astype(o_ref.dtype)
                return

            if mode == "no-max":
                p = jnp.exp2(s) if mode != "no-exp2" else s
                l_curr = jnp.sum(p, axis=1, keepdims=True)
                l_ref[...] += jnp.broadcast_to(l_curr, l_ref.shape)
                acc_ref[...] += jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                @pl.when(k_idx == nk - 1)
                def _store1():
                    l_fin = l_ref[...][:, :1]
                    inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
                    o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)
                return

            if mode == "no-exp2":
                m_prev = m_ref[...]
                m_curr = jnp.max(s, axis=1, keepdims=True)
                m_next = jnp.maximum(m_prev, m_curr)
                p = s - m_next[:, :1]          # identity instead of exp2
                l_curr = jnp.sum(p, axis=1, keepdims=True)
                m_ref[...] = jnp.broadcast_to(m_next[:, :1], m_ref.shape)
                l_ref[...] += jnp.broadcast_to(l_curr, l_ref.shape)
                acc_ref[...] += jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                @pl.when(k_idx == nk - 1)
                def _store2():
                    l_fin = l_ref[...][:, :1]
                    inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
                    o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)
                return

            # full online softmax; mode == "mxu-sum" rides sum(p) on the
            # PV matmul via a ones-column (v[..., -1] preset to 1, its
            # true values zero-padded), so the VPU sum pass disappears.
            m_prev = m_ref[...]
            l_prev = l_ref[...]
            m_curr = jnp.max(s, axis=1, keepdims=True)
            m_next = jnp.maximum(m_prev, m_curr)
            alpha = jnp.exp2(m_prev[:, :1] - m_next[:, :1])
            p = jnp.exp2(s - m_next[:, :1])
            m_ref[...] = jnp.broadcast_to(m_next[:, :1], m_ref.shape)
            if mode == "mxu-sum":
                acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
                    p.astype(v.dtype), v, preferred_element_type=jnp.float32)
                @pl.when(k_idx == nk - 1)
                def _store3():
                    l_fin = acc_ref[...][:, -1:]     # the ones-column
                    inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
                    o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)
                return
            l_curr = jnp.sum(p, axis=1, keepdims=True)
            l_next = alpha * l_prev[:, :1] + l_curr
            l_ref[...] = jnp.broadcast_to(l_next, l_ref.shape)
            acc_ref[...] = acc_ref[...] * alpha + jax.lax.dot(
                p.astype(v.dtype), v, preferred_element_type=jnp.float32)

            @pl.when(k_idx == nk - 1)
            def _store4():
                l_fin = l_ref[...][:, :1]
                inv = jnp.where(l_fin == 0.0, 1.0, 1.0 / l_fin)
                o_ref[0] = (acc_ref[...] * inv).astype(o_ref.dtype)

        return kern

    LOG2E = fa.LOG2E

    def call_kernel(qr, kr, vr, mode, bq, bk, d_true):
        bh, sq, dp = qr.shape
        sk = kr.shape[1]
        qr = qr * jnp.asarray(d_true ** -0.5 * LOG2E, qr.dtype)
        if mode == "mxu-sum":
            vr = vr.at[:, :, -1].set(jnp.asarray(1.0, vr.dtype))
        grid = (bh, sq // bq, sk // bk)
        return pl.pallas_call(
            make_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((bh, sq, dp), qr.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, bq, dp), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, dp), lambda i, j, kk: (i, kk, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bk, dp), lambda i, j, kk: (i, kk, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, bq, dp), lambda i, j, kk: (i, j, 0),
                                   memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((bq, fa.LANE), jnp.float32),
                pltpu.VMEM((bq, fa.LANE), jnp.float32),
                pltpu.VMEM((bq, dp), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qr, kr, vr)

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
            print(f"{name:34s} FAILED: {str(e)[:110]}", flush=True)
            return None
        t0 = time.perf_counter()
        np.asarray(many(*args).ravel()[0])
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(f"{name:34s} {dt:7.3f} ms/call", flush=True)
        return dt

    def xla_attn(q, k, v):
        return jax.nn.dot_product_attention(q, k, v)

    cases = [
        ("sd15-L0 b8 s4096 h8 d40", 8, 4096, 8, 40, 512, 4096),
        ("sd15-L1 b8 s1024 h8 d80", 8, 1024, 8, 80, 512, 1024),
        ("sdxl-L1 b2 s16384 h10 d64", 2, 16384, 10, 64, 512, 4096),
    ]
    for label, b, s, h, d, bq, bk in cases:
        print(f"== {label} ==", flush=True)
        q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.bfloat16)
        k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.bfloat16)
        v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.bfloat16)
        bench("full (prod)", functools.partial(
            fa._flash_attention_impl, q_block=bq, k_block=bk), q, k, v)

        dp = fa._pad_head_dim(d)
        def prep(x):
            xr = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * h, s, d)
            return jnp.pad(xr, ((0, 0), (0, 0), (0, dp - d)))
        qr, kr, vr = prep(q), prep(k), prep(v)
        for mode in ("kernel", "mxu-sum", "no-max", "no-exp2", "dots-only"):
            bench(mode, functools.partial(
                call_kernel, mode=mode, bq=bq, bk=bk, d_true=d), qr, kr, vr)
        bench("xla dpa", xla_attn, q, k, v)


if __name__ == "__main__":
    main()
