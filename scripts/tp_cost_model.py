"""Tensor-parallel cost model for the SDXL UNet step (VERDICT r3 next-#6).

The tp=SDXL story so far rests on a sharding-coverage number (85% of
params matched by the Megatron rules) with no latency estimate behind
it.  This script puts a number on it without multi-chip hardware:

1. compile the SDXL UNet CFG step under a ``(dp=1, tp=N)`` virtual CPU
   mesh (the partitioner emits the same SPMD program a real pod would
   run, ``xla_force_host_platform_device_count``);
2. read XLA's post-fusion per-device cost analysis (flops, bytes
   accessed) → per-device MXU and HBM floors;
3. parse every ``all-reduce`` in the optimized HLO for its payload bytes
   → ICI time at the v5e per-chip all-reduce bandwidth;
4. calibrate with the measured tp=1 efficiency (chip: 116 ms vs the
   73.8 ms HBM floor = 64%) and print estimated step time per tp.

Usage (CPU, ~minutes of compile per tp on the 1-CPU box):
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python scripts/tp_cost_model.py --tp 1 2 4
"""

from __future__ import annotations

import argparse
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0
# v5e ICI: 2D torus, 45 GB/s per link per direction, 2 links usable per
# ring axis -> ring all-reduce moves 2*(tp-1)/tp * bytes over ~90 GB/s
# aggregate per chip (scaling-book numbers for a v5e slice axis).
ICI_AXIS_GBPS = 90.0

def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tp", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--model", default="sdxl",
                    choices=["sd15", "sdxl", "tiny_xl"])
    ap.add_argument("--batch", type=int, default=2,
                    help="UNet batch (2 = CFG pair for bench batch 1)")
    ap.add_argument("--measured_tp1_ms", type=float, default=116.0,
                    help="measured tp=1 ms/step on chip (calibration)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from theatergen_tpu.config import (
        sd15_config, sdxl_config, tiny_xl_config,
    )
    from theatergen_tpu.models.unet import UNet2DCondition
    from theatergen_tpu.parallel import mesh as mesh_lib

    cfg = {"sd15": sd15_config, "sdxl": sdxl_config,
           "tiny_xl": tiny_xl_config}[args.model]()
    ucfg = cfg.unet
    unet = UNet2DCondition(ucfg)
    hw, b = ucfg.sample_size, args.batch
    lat = jnp.zeros((b, hw, hw, 4), jnp.bfloat16)
    t = jnp.zeros((b,), jnp.int32)
    ctx = jnp.zeros((b, cfg.text.max_length, ucfg.cross_attention_dim),
                    jnp.bfloat16)
    kw = {}
    if ucfg.addition_embed_type == "text_time":
        pooled = (ucfg.projection_class_embeddings_input_dim
                  - 6 * ucfg.addition_time_embed_dim)
        kw = dict(pooled_text=jnp.zeros((b, pooled), jnp.bfloat16),
                  time_ids=jnp.zeros((b, 6), jnp.bfloat16))

    pshapes = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), lat[:1], t[:1], ctx[:1],
                          **{k: v[:1] for k, v in kw.items()})["params"])
    params = jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16),
                          pshapes)
    pbytes = sum(math.prod(x.shape) * 2 for x in jax.tree.leaves(params))
    print(f"model={args.model} batch={b} params={pbytes/1e9:.2f} GB bf16\n")

    kw_keys = list(kw)
    kw_vals = tuple(kw[k] for k in kw_keys)

    def fwd(p, x, tt, c, kvals):
        return unet.apply({"params": p}, x, tt, c,
                          **dict(zip(kw_keys, kvals)))

    hbm_tp1 = None
    rows = []
    for tp in args.tp:
        if tp > len(jax.devices()):
            print(f"tp={tp}: not enough virtual devices, skip")
            continue
        mesh = mesh_lib.make_mesh(dp=1, tp=tp,
                                  devices=jax.devices()[:tp])
        pshard = mesh_lib.param_shardings(mesh, params)
        rep = NamedSharding(mesh, P())
        cov = mesh_lib.sharding_coverage(mesh, params)
        jitted = jax.jit(
            fwd,
            in_shardings=(pshard, rep, rep, rep,
                          tuple(rep for _ in kw_vals)),
            out_shardings=rep,
        )
        lowered = jitted.lower(params, lat, t, ctx, kw_vals)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        flops = float(ca.get("flops", float("nan")))
        by = float(ca.get("bytes accessed", float("nan")))
        stats = mesh_lib.collective_stats(compiled.as_text())
        n_ars = stats["all-reduce"]["count"]
        ar_total = stats["all-reduce"]["bytes"]
        mxu_ms = flops / PEAK_BF16_TFLOPS / 1e9
        hbm_ms = by / PEAK_HBM_GBPS / 1e6
        if tp == 1:
            hbm_tp1 = hbm_ms
        # ring all-reduce over the tp axis: 2*(tp-1)/tp of the payload
        # crosses each chip's ICI at the axis bandwidth
        ici_ms = (2 * (tp - 1) / tp * ar_total / ICI_AXIS_GBPS / 1e6
                  if tp > 1 else 0.0)
        rows.append((tp, flops, by, mxu_ms, hbm_ms, n_ars, ar_total,
                     ici_ms, cov["fraction"]))
        print(f"tp={tp}: per-device flops={flops/1e12:.3f} TFLOP, "
              f"bytes={by/1e9:.2f} GB, all-reduces={n_ars} "
              f"({ar_total/1e9:.3f} GB payload), "
              f"param shard coverage={100*cov['fraction']:.1f}%")

    eff = (hbm_tp1 / args.measured_tp1_ms) if hbm_tp1 else 1.0
    print(f"\ncalibration: measured tp=1 {args.measured_tp1_ms:.1f} ms vs "
          f"HBM floor {hbm_tp1:.1f} ms -> efficiency {100*eff:.0f}%")
    print(f"\n{'tp':>3} {'MXU ms':>8} {'HBM ms':>8} {'ICI ms':>8} "
          f"{'est step ms':>12} {'vs tp=1':>8}")
    base = None
    for (tp, _f, _b, mxu, hbm, _n, _ab, ici, _cov) in rows:
        # binding floor over efficiency, plus non-overlapped all-reduce
        est = max(mxu, hbm) / eff + ici
        if base is None:
            base = est
        print(f"{tp:>3} {mxu:>8.1f} {hbm:>8.1f} {ici:>8.1f} "
              f"{est:>12.1f} {base/est:>7.2f}x")


if __name__ == "__main__":
    main()
