"""Sweep denoise-throughput variants on the real chip.

Usage: python scripts/bench_sweep.py [--steps 5] — uses a short scan to
keep compile cost down; throughput extrapolates linearly in steps.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theatergen_tpu.utils.fastinit import materialize_params, setup_compile_cache

setup_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp

from theatergen_tpu.config import sd15_config
from theatergen_tpu.models.unet import UNet2DCondition
from theatergen_tpu.ops import scheduler as sched_ops
from theatergen_tpu.pipelines import sd


def run_variant(name: str, unet_cfg, batch: int, steps: int) -> float:
    cfg = sd15_config()
    unet = UNet2DCondition(unet_cfg)
    t0 = jnp.zeros((1,), jnp.int32)
    ctx = jax.random.normal(
        jax.random.key(1), (2 * batch, 77, 768), jnp.bfloat16
    )
    params = materialize_params(
        lambda: unet.init(
            jax.random.key(2), jnp.zeros((1, 64, 64, 4)), t0, ctx[:1]
        )["params"],
        dtype=jnp.bfloat16,
    )
    sched = sched_ops.make_schedule(cfg.scheduler, steps)
    lat0 = jax.random.normal(jax.random.key(0), (batch, 64, 64, 4))

    @jax.jit
    def run(p, lat, context):
        def unet_apply(x, t, c):
            return unet.apply({"params": p}, x,
                              jnp.broadcast_to(t[None], (x.shape[0],)), c)

        final, _ = sd.denoise(unet_apply, sched, lat, context, 7.5)
        return final

    c0 = time.perf_counter()
    run(params, lat0, ctx).block_until_ready()
    compile_s = time.perf_counter() - c0
    times = []
    for _ in range(3):
        s = time.perf_counter()
        run(params, lat0, ctx).block_until_ready()
        times.append(time.perf_counter() - s)
    step_ms = min(times) / steps * 1000
    ips_50 = batch / (min(times) / steps * 50)
    print(f"{name}: {step_ms:.1f} ms/step (batch {batch}) -> "
          f"{ips_50:.3f} img/s @50 steps  [compile {compile_s:.0f}s]",
          flush=True)
    return ips_50


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()
    base = sd15_config().unet

    variants = [
        ("flash  b4", base, 4),
        ("xla    b4", dataclasses.replace(base, flash_attention=False), 4),
        ("flash  b8", base, 8),
        ("flash  b1", base, 1),
        ("flash  b16", base, 16),
    ]
    for name, ucfg, batch in variants:
        try:
            run_variant(name, ucfg, batch, args.steps)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
