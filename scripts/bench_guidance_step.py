"""Per-step latent-guidance cost on chip (VERDICT r4 next-#4).

The latent-guidance loop (the reference's dormant
``latent_backward_guidance``, ``models/pipelines.py:62-128``) is opt-in
here since r5b (``--guidance``; measured 2.8x per dialogue).  This
measures its building blocks at the SD1.5 batch-1 character-pass shape
so the guided dialogue p50 has a per-step accounting next to it:

1. plain CFG denoise step (2x-batch UNet fwd) — the guided=False unit;
2. one guidance grad iteration (cond-only UNet fwd with attention
   capture + backward through ``jax.value_and_grad``);
3. a full ``guidance_update`` at the max_iter cap (the while_loop body
   runs ``max_iter[i]`` times when the loss never crosses the
   threshold — the worst case and, with random weights, the measured
   case).

With the default schedule (``GuidanceConfig.max_iter`` = 4x10 + 3x40,
``guidance_steps=25``) a 50-step pass adds up to
``10*4 + 15*3 = 85`` grad iterations on top of the 50 CFG steps.

Usage (chip):  python scripts/bench_guidance_step.py [--steps 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theatergen_tpu.utils.fastinit import setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _time(fn, *args, trials=5):
    np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]   # compile+warm
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        np.asarray(jax.tree.leaves(fn(*args))[0]).ravel()[:1]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config smoke (CPU plumbing check)")
    args = ap.parse_args()

    from theatergen_tpu.config import sd15_config, tiny_config
    from theatergen_tpu.ops import scheduler as sched_ops
    from theatergen_tpu.pipelines import sd
    from theatergen_tpu.pipelines.guidance import (
        GuidanceInputs, guidance_update, make_energy_fn,
    )
    from theatergen_tpu.utils.fastinit import fast_bundle

    cfg = tiny_config() if args.tiny else sd15_config()
    gcfg = cfg.guidance
    print("materializing params...", flush=True)
    if args.tiny:
        from theatergen_tpu.pipelines.bundle import init_bundle

        bundle = init_bundle(cfg, jax.random.key(0), with_ip=True,
                             with_vision=True)
    else:
        bundle = fast_bundle(cfg)
    unet = bundle.unet_ip
    params = bundle.unet_ip_params
    text_len = cfg.text.max_length
    ctx_len = text_len + cfg.ip_adapter.num_tokens
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    sched = sched_ops.make_sampler(cfg.scheduler, args.steps)

    lat = jax.random.normal(jax.random.key(0), (1, h, w, 4))
    ctx = jax.random.normal(
        jax.random.key(1), (2, ctx_len, cfg.unet.cross_attention_dim),
        jnp.bfloat16)
    k = cfg.pipeline.max_objects
    gin = GuidanceInputs(
        boxes=jnp.zeros((k, 4)).at[0].set(jnp.array([0.2, 0.2, 0.8, 0.8])),
        token_pos=jnp.zeros((k, 2), jnp.int32).at[0, 0].set(2),
        token_valid=jnp.zeros((k, 2), bool).at[0, 0].set(True),
        obj_valid=jnp.zeros((k,), bool).at[0].set(True),
        word_token=jnp.zeros((k,), jnp.int32).at[0].set(2),
    )

    def unet_apply(p, x, t, c, capture=False):
        kwargs = dict(ip_scale=jnp.float32(0.4))
        if capture:
            return unet.apply({"params": p}, x,
                              jnp.broadcast_to(t[None], (x.shape[0],)), c,
                              capture_keys=gcfg.attn_keys,
                              mutable=["attn"], **kwargs)
        return unet.apply({"params": p}, x,
                          jnp.broadcast_to(t[None], (x.shape[0],)), c,
                          **kwargs)

    # 1. plain CFG step (the guided=False unit of work)
    @jax.jit
    def cfg_step(p, lat, c):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        eps = unet_apply(p, lat_in, sched.timesteps[0], c)
        eps = sd.cfg_combine(eps.astype(jnp.float32), 7.5)
        return sched.step(eps, 0, lat)

    t_cfg = _time(cfg_step, params, lat, ctx)

    # 2. one grad iteration: value_and_grad of the capture energy.
    # The energy must bind the TRACED params arg, never the host tree —
    # a closure would bake the multi-GB tree into the executable as
    # constants (a second full HBM copy; the repo rule in
    # pipelines/character.py:118, flagged by the r5 code review).
    def make_energy(p):
        return make_energy_fn(
            lambda l, t, c: unet_apply(p, l, t, c, capture=True)[1]["attn"],
            gcfg, text_len, latent_hw=(h, w))

    @jax.jit
    def grad_iter(p, lat, c):
        energy = make_energy(p)

        def scaled(l):
            return energy(l, sched.timesteps[0], c, gin) * gcfg.loss_scale
        loss, g = jax.value_and_grad(scaled)(lat)
        return lat - 0.1 * g, loss

    t_grad = _time(grad_iter, params, lat, ctx[1:2])

    # 3. full guidance_update at step 0 (max_iter=4 cap; random weights
    # never cross the loss threshold, so the loop runs to the cap —
    # matching the per-iteration accounting above)
    @jax.jit
    def gupdate(p, lat, c):
        return guidance_update(make_energy(p), sched, gcfg, lat,
                               jnp.int32(0), c, gin)

    t_upd = _time(gupdate, params, lat, ctx[1:2])

    n_guided = min(gcfg.guidance_steps, args.steps)
    iters = sum(gcfg.max_iter[i] for i in range(n_guided))
    est = args.steps * t_cfg + iters * t_grad
    print(json.dumps({
        "metric": "SD1.5 512px guided-step cost accounting (batch-1 "
                  "character shape, IP ctx)",
        "cfg_step_ms": round(t_cfg * 1e3, 2),
        "grad_iter_ms": round(t_grad * 1e3, 2),
        "guidance_update_step0_ms": round(t_upd * 1e3, 2),
        "max_iter_step0": gcfg.max_iter[0],
        "guided_steps": n_guided,
        "worst_case_grad_iters_per_pass": iters,
        "est_pass_s_guided_worst": round(est, 2),
        "est_pass_s_unguided": round(args.steps * t_cfg, 2),
        "est_overhead_x": round(est / (args.steps * t_cfg), 2),
    }))


if __name__ == "__main__":
    main()
