"""Profile one UNet CFG denoise step on the TPU and itemize the per-op
time against first-principles floors (VERDICT r3 next-#4: "itemize the
gap to the millisecond").

Three data sources, joined by HLO instruction name:

1. ``jax.profiler`` trace of the jitted single-step UNet program —
   device-lane ("XLA Ops" thread) event durations per op.  Earlier
   versions summed the "XLA Modules" lane too, which attributed half the
   device time to one opaque ``jit_step(...)`` entry; v2 filters lanes.
2. The compiled module's optimized HLO text — per-instruction output /
   operand shapes (→ HBM bytes) and the conv/dot subinstructions inside
   each fusion (→ MXU flops), so every op gets a compute floor
   (flops / peak-bf16) and a bandwidth floor (bytes / peak-HBM).
3. Analytic attention floors for the opaque Pallas calls (the kernel's
   flops are known: 4·B·H·Sq·Sk·Dpad, with the true-work variant at the
   unpadded head dim).

Output: per-class accounting table (measured ms vs binding floor vs
efficiency), complete per-op table, and a JSON dump for BENCH_NOTES.

Usage: ``python scripts/profile_step.py`` (TPU; one process at a time).
Env: THEATERGEN_BENCH_MODEL=sd15|sdxl, THEATERGEN_BENCH_BATCH,
THEATERGEN_PEAK_TFLOPS / THEATERGEN_PEAK_GBS (v5e defaults 197 / 819).
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

BATCH = int(os.environ.get("THEATERGEN_BENCH_BATCH", "4"))
TRACE_DIR = os.environ.get("THEATERGEN_TRACE_DIR", "/tmp/tg_profile")
PEAK_FLOPS = float(os.environ.get("THEATERGEN_PEAK_TFLOPS", "197")) * 1e12
PEAK_BYTES = float(os.environ.get("THEATERGEN_PEAK_GBS", "819")) * 1e9
N_STEPS = 3

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_TYPE_TOKEN = re.compile(r"([a-z0-9]+)\[([0-9,]*)\]")
# LHS type always ends with ], }, or ) right before "<opcode>("
_OPCODE = re.compile(r"[\]\})]\s+([a-z][a-z0-9\-]*)\(")
_NAME = re.compile(r"^\s*(?:ROOT\s+)?%?([^\s=]+)\s*=\s*(.*)$")
_COMP_HDR = re.compile(r"^(?:ENTRY\s+)?%?([\w\.\-]+)\s+\([^)]*\)\s*->")
_CALLS = re.compile(r"calls=%?([\w\.\-]+)")
_WINDOW = re.compile(r"window=\{size=([0-9x]+)")
_LHS_DILATE = re.compile(r"lhs_dilate=([0-9x]+)")
_DIM_LABELS = re.compile(r"dim_labels=([a-z0-9]+)_([a-z0-9]+)->")
_LHS_CONTRACT = re.compile(r"lhs_contracting_dims=\{([0-9,]+)\}")


def _shape_bytes(tokens) -> int:
    total = 0
    for dt, dims in tokens:
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES.get(dt, 4)
    return total


def _prod(dims: str) -> int:
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


class HloInfo:
    """Per-instruction shape/class/flops info parsed from optimized HLO
    text (name-joined with the profiler trace)."""

    def __init__(self, text: str):
        # name -> (dtype, dims-string) for operand-shape lookups
        self.shape: dict[str, tuple[str, str]] = {}
        # computation name -> {"ops": set, "flops": float}
        self.comp: dict[str, dict] = {}
        # top-level instruction name -> dict(opcode, out_bytes, operands,
        #   calls, flops_own)
        self.instr: dict[str, dict] = {}
        cur = None
        for line in text.splitlines():
            hdr = _COMP_HDR.match(line)
            if hdr and line.rstrip().endswith("{"):
                cur = hdr.group(1)
                self.comp[cur] = {"ops": set(), "flops": 0.0}
                continue
            m = _NAME.match(line)
            if not m or "=" not in line:
                continue
            name, rest = m.group(1), m.group(2)
            op_m = _OPCODE.search(rest)
            if not op_m:
                continue
            opcode = op_m.group(1)
            ty_part = rest[: op_m.start() + 1]
            tokens = _TYPE_TOKEN.findall(ty_part)
            if tokens:
                self.shape[name] = tokens[0]
            out_bytes = _shape_bytes(tokens)
            # flat operand list (no nested parens in operand position)
            rest_after = rest[op_m.end():]
            close = rest_after.find(")")
            operands = [
                o.strip().lstrip("%")
                for o in rest_after[:close].split(",") if o.strip()
            ] if close > 0 else []
            flops = 0.0
            if opcode == "convolution":
                flops = self._conv_flops(rest, tokens, operands)
            elif opcode == "dot":
                flops = self._dot_flops(rest, tokens, operands)
            if cur is not None:
                self.comp[cur]["ops"].add(opcode)
                self.comp[cur]["flops"] += flops
            d = {"opcode": opcode, "out_bytes": out_bytes,
                 "operands": operands, "flops": flops}
            cm = _CALLS.search(rest)
            if cm:
                d["calls"] = cm.group(1)
            self.instr[name] = d

    def _conv_flops(self, rest, out_tokens, operands) -> float:
        """2 · |out| · Cin · effective-window.

        effective-window uses ceil(size/lhs_dilate) per dim: XLA:TPU
        rewrites batched attention einsums as base-dilated convolutions
        (window=8x8 lhs_dilate=8x8), where only the non-inserted-zero
        taps execute — counting the full window overstates flops ~60×
        on those ops (measured: "3226 TF/s" phantoms in r4c)."""
        if not out_tokens or len(operands) < 2:
            return 0.0
        rhs = self.shape.get(operands[1])
        dl = _DIM_LABELS.search(rest)
        win = _WINDOW.search(rest)
        if not rhs or not dl or not win:
            return 0.0
        rhs_labels = dl.group(2)
        rhs_dims = [int(d) for d in rhs[1].split(",") if d]
        if "i" not in rhs_labels or len(rhs_dims) != len(rhs_labels):
            return 0.0
        in_ch = rhs_dims[rhs_labels.index("i")]
        sizes = [int(x) for x in win.group(1).split("x")]
        dil = _LHS_DILATE.search(rest)
        dils = ([int(x) for x in dil.group(1).split("x")]
                if dil else [1] * len(sizes))
        eff_window = 1
        for s, dd in zip(sizes, dils):
            eff_window *= -(-s // dd)   # ceil
        out_elems = _prod(out_tokens[0][1])
        return 2.0 * out_elems * in_ch * eff_window

    def _dot_flops(self, rest, out_tokens, operands) -> float:
        if not out_tokens or not operands:
            return 0.0
        lhs = self.shape.get(operands[0])
        lc = _LHS_CONTRACT.search(rest)
        if not lhs or not lc:
            return 0.0
        lhs_dims = [int(d) for d in lhs[1].split(",") if d]
        k = 1
        for i in lc.group(1).split(","):
            idx = int(i)
            if idx < len(lhs_dims):
                k *= lhs_dims[idx]
        return 2.0 * _prod(out_tokens[0][1]) * k

    def lookup(self, trace_name: str):
        """(class, flops, bytes) for a trace op name, or None."""
        d = self.instr.get(trace_name)
        if d is None:
            return None
        if d["opcode"] in ("parameter", "get-tuple-element", "tuple",
                           "constant", "bitcast", "after-all"):
            # nominal ops: no real execution, their "bytes" would inflate
            # the HBM floor (e.g. every weight parameter counted once)
            return "nominal", 0.0, 0.0
        if d["opcode"] in ("async-start", "async-done"):
            # overlapped DMA (weight-slice prefetches etc.) — the
            # consuming op's operand bytes already count this traffic
            return "async-dma", 0.0, 0.0
        flops = d["flops"]
        ops = {d["opcode"]}
        if "calls" in d and d["calls"] in self.comp:
            c = self.comp[d["calls"]]
            ops |= c["ops"]
            flops += c["flops"]
        in_bytes = sum(
            _shape_bytes([self.shape[o]])
            for o in d["operands"] if o in self.shape)
        total_bytes = d["out_bytes"] + in_bytes
        if "convolution" in ops:
            cls = "conv"
        elif "dot" in ops:
            cls = "dot-fusion"
        elif "custom-call" in ops:
            cls = "custom-call"
        elif d["opcode"] in ("copy", "transpose", "reshape", "bitcast",
                             "copy-start", "copy-done", "slice",
                             "dynamic-slice", "concatenate", "pad"):
            cls = "layout/copy"
        elif "reduce" in ops or "reduce-window" in ops:
            cls = "reduce/norm"
        elif d["opcode"] == "fusion":
            cls = "elementwise"
        else:
            cls = "other"
        return cls, flops, total_bytes


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

    def step(p, x, tt, c):
        return unet.apply({"params": p}, x, tt, c, **xl_kwargs)

    import shutil
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    os.makedirs(TRACE_DIR, exist_ok=True)

    compiled = jax.jit(step).lower(params, lat, t, ctx).compile()
    hlo_text = compiled.as_text()
    with gzip.open(os.path.join(TRACE_DIR, "hlo.txt.gz"), "wt") as f:
        f.write(hlo_text)   # offline parse iteration without the chip
    hlo = HloInfo(hlo_text)
    out = compiled(params, lat, t, ctx)
    jax.block_until_ready(out)

    with jax.profiler.trace(TRACE_DIR):
        for _ in range(N_STEPS):
            out = compiled(params, lat, t, ctx)
        jax.block_until_ready(out)

    # ---- parse the chrome trace, device "XLA Ops" lanes only
    paths = glob.glob(os.path.join(
        TRACE_DIR, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print("no trace written; files:", os.listdir(TRACE_DIR))
        return
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)

    pids_device = set()
    op_lanes = set()        # (pid, tid) of "XLA Ops" threads
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "M":
            continue
        args = ev.get("args", {})
        if ev.get("name") == "process_name":
            name = args.get("name", "")
            if "TPU" in name or "/device:" in name or "XLA Op" in name:
                pids_device.add(ev["pid"])
        elif ev.get("name") == "thread_name" and "XLA Ops" in args.get(
                "name", ""):
            op_lanes.add((ev["pid"], ev.get("tid")))

    by_op = collections.Counter()
    total = 0.0
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X":
            continue
        key = (ev.get("pid"), ev.get("tid"))
        if op_lanes:
            if key not in op_lanes:
                continue
        elif pids_device and ev.get("pid") not in pids_device:
            continue
        name = ev.get("name", "")
        dur = ev.get("dur", 0) / 1e3   # us → ms
        if not name or dur <= 0:
            continue
        if not op_lanes and name.startswith("jit_"):
            continue   # module-lane artifact when thread names are absent
        by_op[name] += dur
        total += dur

    # ---- join with HLO, classify, floor
    rows = []
    for name, dur in by_op.items():
        ms = dur / N_STEPS
        info = hlo.lookup(name)
        if info is None:
            # Pallas kernels keep their python scope name in the trace;
            # they are not HLO instructions, so classify by name.
            low = name.lower()
            if "attention" in low or "flash" in low:
                cls, flops, nbytes = "attention(pallas)", 0.0, 0.0
            elif "groupnorm" in low or "quant" in low:
                cls, flops, nbytes = "pallas(other)", 0.0, 0.0
            else:
                cls, flops, nbytes = "other", 0.0, 0.0
        else:
            cls, flops, nbytes = info
            if cls == "custom-call":
                cls = "attention(pallas)"
        rows.append({
            "name": name, "ms": ms, "class": cls,
            "flops": flops, "bytes": nbytes,
            "mxu_floor_ms": 1e3 * flops / PEAK_FLOPS,
            "hbm_floor_ms": 1e3 * nbytes / PEAK_BYTES,
        })
    rows.sort(key=lambda r: -r["ms"])

    per_step = total / N_STEPS
    print(f"\n=== device time: {per_step:.2f} ms/step over {N_STEPS} steps "
          f"(batch {BATCH} CFG, model {model}) ===")

    by_cls = collections.defaultdict(
        lambda: {"ms": 0.0, "flops": 0.0, "bytes": 0.0, "n": 0})
    for r in rows:
        c = by_cls[r["class"]]
        c["ms"] += r["ms"]
        c["flops"] += r["flops"]
        c["bytes"] += r["bytes"]
        c["n"] += 1

    print("\n--- accounting by class (per step; floors at "
          f"{PEAK_FLOPS / 1e12:.0f} TF/s bf16, {PEAK_BYTES / 1e9:.0f} GB/s "
          "HBM) ---")
    print(f"{'class':<18}{'ms':>8}{'#ops':>6}{'MXU-floor':>11}"
          f"{'HBM-floor':>11}{'binding':>9}{'eff%':>6}")
    tot_mxu = tot_hbm = 0.0
    for cls, c in sorted(by_cls.items(), key=lambda kv: -kv[1]["ms"]):
        mxu = 1e3 * c["flops"] / PEAK_FLOPS
        hbm = 1e3 * c["bytes"] / PEAK_BYTES
        tot_mxu += mxu
        tot_hbm += hbm
        floor = max(mxu, hbm)
        binding = ("MXU" if mxu >= hbm else "HBM") if floor > 0 else "?"
        eff = 100 * floor / c["ms"] if c["ms"] > 0 and floor > 0 else 0
        print(f"{cls:<18}{c['ms']:>8.2f}{c['n']:>6}{mxu:>11.2f}"
              f"{hbm:>11.2f}{binding:>9}{eff:>6.0f}")
    print(f"{'TOTAL':<18}{per_step:>8.2f}{sum(c['n'] for c in by_cls.values()):>6}"
          f"{tot_mxu:>11.2f}{tot_hbm:>11.2f}")

    print("\n--- all ops >= 0.10 ms/step ---")
    print(f"{'ms':>7} {'share':>6} {'class':<18}{'GB/s':>7}{'TF/s':>7}  name")
    shown = 0.0
    for r in rows:
        if r["ms"] < 0.10:
            continue
        shown += r["ms"]
        gbs = r["bytes"] / 1e9 / (r["ms"] / 1e3) if r["ms"] else 0
        tfs = r["flops"] / 1e12 / (r["ms"] / 1e3) if r["ms"] else 0
        print(f"{r['ms']:>7.3f} {100 * r['ms'] / per_step:>5.1f}% "
              f"{r['class']:<18}{gbs:>7.0f}{tfs:>7.1f}  {r['name'][:90]}")
    print(f"(shown {shown:.2f} of {per_step:.2f} ms/step; "
          f"tail = {per_step - shown:.2f} ms in "
          f"{sum(1 for r in rows if r['ms'] < 0.10)} ops)")

    with open(os.path.join(TRACE_DIR, "itemized.json"), "w") as f:
        json.dump({"model": model, "batch": BATCH,
                   "ms_per_step": per_step, "rows": rows}, f)
    print(f"\n[itemized table: {TRACE_DIR}/itemized.json]")


if __name__ == "__main__":
    main()
