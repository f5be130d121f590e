"""Offline re-itemization: re-parse a saved profile (hlo.txt.gz +
itemized.json from scripts/profile_step.py) without touching the chip.

Lets the HLO-join heuristics (conv-flop formulas, classification) be
iterated offline against a real TPU-compiled module.  Prints the same
accounting tables as profile_step.py.

Usage: python scripts/itemize_profile.py [/tmp/tg_profile]
"""

from __future__ import annotations

import collections
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from profile_step import HloInfo, PEAK_BYTES, PEAK_FLOPS   # noqa: E402


def main() -> None:
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tg_profile"
    with gzip.open(os.path.join(trace_dir, "hlo.txt.gz"), "rt") as f:
        hlo = HloInfo(f.read())
    with open(os.path.join(trace_dir, "itemized.json")) as f:
        saved = json.load(f)

    per_step = saved["ms_per_step"]
    rows = []
    for r in saved["rows"]:
        name, ms = r["name"], r["ms"]
        info = hlo.lookup(name)
        if info is None:
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
        rows.append({"name": name, "ms": ms, "class": cls,
                     "flops": flops, "bytes": nbytes})
    rows.sort(key=lambda r: -r["ms"])

    by_cls = collections.defaultdict(
        lambda: {"ms": 0.0, "flops": 0.0, "bytes": 0.0, "n": 0})
    for r in rows:
        c = by_cls[r["class"]]
        c["ms"] += r["ms"]
        c["flops"] += r["flops"]
        c["bytes"] += r["bytes"]
        c["n"] += 1

    print(f"=== {saved['model']} batch {saved['batch']}: "
          f"{per_step:.2f} ms/step ===")
    print(f"{'class':<18}{'ms':>8}{'#ops':>6}{'MXU-floor':>11}"
          f"{'HBM-floor':>11}{'binding':>9}{'eff%':>6}")
    for cls, c in sorted(by_cls.items(), key=lambda kv: -kv[1]["ms"]):
        mxu = 1e3 * c["flops"] / PEAK_FLOPS
        hbm = 1e3 * c["bytes"] / PEAK_BYTES
        floor = max(mxu, hbm)
        binding = ("MXU" if mxu >= hbm else "HBM") if floor > 0 else "?"
        eff = 100 * floor / c["ms"] if c["ms"] > 0 and floor > 0 else 0
        print(f"{cls:<18}{c['ms']:>8.2f}{c['n']:>6}{mxu:>11.2f}"
              f"{hbm:>11.2f}{binding:>9}{eff:>6.0f}")

    print(f"\n{'ms':>7} {'share':>6} {'class':<18}{'GB/s':>7}{'TF/s':>7}  name")
    for r in rows[:40]:
        gbs = r["bytes"] / 1e9 / (r["ms"] / 1e3) if r["ms"] else 0
        tfs = r["flops"] / 1e12 / (r["ms"] / 1e3) if r["ms"] else 0
        print(f"{r['ms']:>7.3f} {100 * r['ms'] / per_step:>5.1f}% "
              f"{r['class']:<18}{gbs:>7.0f}{tfs:>7.1f}  {r['name'][:90]}")


if __name__ == "__main__":
    main()
