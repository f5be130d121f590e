"""Analytic roofline for one UNet forward: FLOPs by op kind from the
lowered HLO, vs the chip's measured per-op profile.

Answers the round-3 SDXL question: is the measured 48.9 ms conv band /
44.2 ms elementwise band (profile, BENCH_NOTES "Round 3c: SDXL 1024px
per-op profile") near the hardware bound, or is there a lever?

Runs on CPU (lowering only by default — no compile, cheap on the 1-CPU
box).  ``--compile`` additionally compiles the module and reports XLA's
post-fusion "bytes accessed" estimate, the number the elementwise band
should be compared against 819 GB/s v5e HBM bandwidth.

Usage:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
    python scripts/roofline_unet.py --model sdxl --batch 2
"""

from __future__ import annotations

import argparse
import math
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e-1 peaks (public spec): bf16 MXU and HBM bandwidth
PEAK_BF16_TFLOPS = 197.0
PEAK_HBM_GBPS = 819.0

# lowered.as_text() is StableHLO MLIR: shapes appear as tensor<AxBx..xbf16>
_SHAPE = re.compile(r"tensor<((?:\d+x)*\d+)x(?:bf16|f32|f16|i32|i64|i8|i1)>")


def _dims(text: str) -> list[list[int]]:
    """All (non-scalar) tensor shapes appearing in one MLIR op line,
    operands first, result last (from the trailing type signature)."""
    return [[int(d) for d in m.split("x")] for m in _SHAPE.findall(text)]


def conv_flops(line: str) -> int:
    """FLOPs of one stablehlo.convolution: 2 * out_elems * Cin_per_group
    * prod(kernel spatial).  The kernel's input-feature dim is already
    Cin/groups in the IR, so grouped/depthwise convs need no division."""
    shapes = _dims(line)
    if len(shapes) < 3:
        return 0
    # type signature "(tensor<lhs>, tensor<rhs>) -> tensor<out>": the
    # regex yields [lhs, rhs, out] in order
    _lhs, rhs, out = shapes[-3], shapes[-2], shapes[-1]
    m = re.search(r"x\[([^\]]*)\]->", line)  # kernel spec, e.g. [0, 1, i, o]
    if not m:
        return 0
    spec = [s.strip() for s in m.group(1).split(",")]
    k_spatial = math.prod(rhs[i] for i, s in enumerate(spec) if s.isdigit())
    cin = rhs[spec.index("i")]
    return 2 * math.prod(out) * cin * k_spatial


def dot_flops(line: str) -> int:
    """FLOPs of one stablehlo.dot_general: 2 * out_elems * K (product of
    the lhs contracting dims)."""
    shapes = _dims(line)
    if len(shapes) < 2:
        return 0
    lhs, out = shapes[-3] if len(shapes) >= 3 else shapes[0], shapes[-1]
    m = re.search(r"contracting_dims = \[([\d, ]*)\] x", line)
    if not m:
        return 0
    k = math.prod(lhs[int(i)] for i in m.group(1).split(",") if i.strip())
    return 2 * math.prod(out) * k


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="sdxl", choices=["sd15", "sdxl"])
    ap.add_argument("--batch", type=int, default=2,
                    help="UNet batch (2 = CFG pair for bench batch 1)")
    ap.add_argument("--compile", action="store_true",
                    help="also compile (slow on 1 CPU) and report XLA's"
                         " post-fusion bytes-accessed estimate")
    ap.add_argument("--measured_ms", type=float, default=None,
                    help="measured ms/step on chip, for achieved-%% lines")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from theatergen_tpu.config import sd15_config, sdxl_config
    from theatergen_tpu.models.unet import UNet2DCondition

    cfg = sdxl_config() if args.model == "sdxl" else sd15_config()
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

    params = jax.eval_shape(
        lambda: unet.init(jax.random.key(0), lat[:1], t[:1], ctx[:1],
                          **{k: v[:1] for k, v in kw.items()})["params"])
    pbytes = sum(math.prod(x.shape) * 2 for x in jax.tree.leaves(params))

    def fwd(p, x, tt, c, **k):
        return unet.apply({"params": p}, x, tt, c, **k)

    lowered = jax.jit(fwd).lower(
        jax.tree.map(lambda s: jnp.zeros(s.shape, jnp.bfloat16), params),
        lat, t, ctx, **kw)
    text = lowered.as_text()
    conv = sum(conv_flops(l) for l in text.splitlines()
               if "stablehlo.convolution" in l)
    dot = sum(dot_flops(l) for l in text.splitlines()
              if "stablehlo.dot_general" in l)
    try:
        total = float(lowered.cost_analysis()["flops"])
    except Exception:
        total = float("nan")

    print(f"model={args.model} batch={b} latent={hw}x{hw} "
          f"params={pbytes/1e9:.2f} GB bf16")
    print(f"conv FLOPs:  {conv/1e12:.3f} TFLOP "
          f"-> MXU floor {conv/PEAK_BF16_TFLOPS/1e9:.2f} ms")
    print(f"dot  FLOPs:  {dot/1e12:.3f} TFLOP "
          f"-> MXU floor {dot/PEAK_BF16_TFLOPS/1e9:.2f} ms")
    print(f"HLO total:   {total/1e12:.3f} TFLOP (incl. elementwise)")
    print(f"param read floor: {pbytes/PEAK_HBM_GBPS/1e6:.2f} ms "
          f"(one full weight pass / step)")
    if args.measured_ms:
        floor = (conv + dot) / PEAK_BF16_TFLOPS / 1e9
        print(f"measured {args.measured_ms:.1f} ms/step -> "
              f"{100 * floor / args.measured_ms:.0f}% of pure-MXU floor")
    if args.compile:
        ca = lowered.compile().cost_analysis()
        by = ca.get("bytes accessed", float("nan"))
        print(f"post-fusion bytes accessed: {by/1e9:.2f} GB "
              f"-> HBM floor {by/PEAK_HBM_GBPS/1e6:.2f} ms")


if __name__ == "__main__":
    main()
