"""Profile one UNet CFG denoise step on the TPU and print the per-op
time breakdown (top XLA ops by self time, grouped by category).

Writes a ``jax.profiler`` trace for one jitted single-step UNet program,
parses the trace protobuf/json, and aggregates device event durations —
the data behind BENCH_NOTES.md's per-step budget table.

Usage: ``python scripts/profile_step.py`` (TPU; one process at a time).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("THEATERGEN_BENCH_BATCH", "4"))
TRACE_DIR = os.environ.get("THEATERGEN_TRACE_DIR", "/tmp/tg_profile")


def main() -> None:
    from theatergen_tpu.utils.fastinit import (
        materialize_params, setup_compile_cache,
    )

    setup_compile_cache()

    import dataclasses

    import jax
    import jax.numpy as jnp

    from theatergen_tpu.config import sd15_config, sdxl_config
    from theatergen_tpu.models.unet import UNet2DCondition

    model = os.environ.get("THEATERGEN_BENCH_MODEL", "sd15")
    cfg = sdxl_config() if model == "sdxl" else sd15_config()
    ucfg = dataclasses.replace(cfg.unet, flash_attention=True)
    unet = UNet2DCondition(ucfg)
    hw = ucfg.sample_size
    lat = jax.device_put(jax.random.normal(
        jax.random.key(0), (2 * BATCH, hw, hw, 4)))
    t = jnp.full((2 * BATCH,), 500, jnp.int32)
    ctx = jax.random.normal(
        jax.random.key(1),
        (2 * BATCH, cfg.text.max_length, cfg.unet.cross_attention_dim),
        jnp.bfloat16)
    xl_kwargs = {}
    if ucfg.addition_embed_type == "text_time":
        pooled_dim = (ucfg.projection_class_embeddings_input_dim
                      - 6 * ucfg.addition_time_embed_dim)
        xl_kwargs = dict(
            pooled_text=jnp.zeros((2 * BATCH, pooled_dim), jnp.bfloat16),
            time_ids=jnp.tile(
                jnp.array([[1024, 1024, 0, 0, 1024, 1024]], jnp.bfloat16),
                (2 * BATCH, 1)))
    params = materialize_params(
        lambda: unet.init(jax.random.key(2), jnp.zeros((1, hw, hw, 4)),
                          t[:1], ctx[:1],
                          **{k: v[:1] for k, v in xl_kwargs.items()}
                          )["params"],
        dtype=jnp.bfloat16)

    @jax.jit
    def step(p, x, tt, c):
        return unet.apply({"params": p}, x, tt, c, **xl_kwargs)

    step(params, lat, t, ctx).block_until_ready()

    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(3):
            out = step(params, lat, t, ctx)
        out.block_until_ready()

    # ---- parse the chrome trace
    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace written; files:", os.listdir(TRACE_DIR))
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    # device-lane complete events only
    pids_device = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            name = ev.get("args", {}).get("name", "")
            if "TPU" in name or "/device:" in name or "XLA Op" in name:
                pids_device.add(ev["pid"])

    by_op = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        if pids_device and ev.get("pid") not in pids_device:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3   # us → ms
        if not name or dur <= 0:
            continue
        by_op[name] += dur
        total += dur

    def category(name: str) -> str:
        n = name.lower()
        if "flash" in n or "pallas" in n or "custom-call" in n:
            return "pallas/custom"
        if "conv" in n:
            return "conv"
        if "dot" in n or "gemm" in n or "matmul" in n:
            return "matmul"
        if "reduce" in n or "norm" in n:
            return "reduce/norm"
        if "fusion" in n:
            return "fusion(elementwise)"
        if "copy" in n or "transpose" in n or "reshape" in n or \
                "bitcast" in n:
            return "layout/copy"
        return "other"

    by_cat = collections.Counter()
    for name, dur in by_op.items():
        by_cat[category(name)] += dur

    print(f"\n=== device time over 3 steps: {total:.2f} ms "
          f"({total / 3:.2f} ms/step, batch {BATCH} CFG) ===")
    print("\n--- by category ---")
    for cat, dur in by_cat.most_common():
        print(f"{dur / 3:9.3f} ms/step  {100 * dur / total:5.1f}%  {cat}")
    print("\n--- top 30 ops ---")
    for name, dur in by_op.most_common(30):
        print(f"{dur / 3:9.3f} ms/step  {100 * dur / total:5.1f}%  "
              f"{name[:110]}")


if __name__ == "__main__":
    main()
