#!/bin/bash
# r5a: re-confirm the geglu planner v3 default on chip (VERDICT r4
# next-#1: flip default to v3, re-confirm with one A/B — the r4k v3 run
# had 1.0% spread).
#
#   1. full default bench (plan v3 now default): headline + ip + sdxl
#   2. SDXL-only control at plan v2 (the old default)
#
# ONE TPU process at a time; logs under /tmp/r5a_*.log.
#
# RECORD step (structural fix from VERDICT r4 weak-#1): when this
# session ends, every /tmp/r5a_*.log is either (a) archived to
# data/bench_logs/ + summarized in BENCH_NOTES.md, or (b) explicitly
# discarded with a reason in BENCH_NOTES.md.  No orphans.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== r5a.1 defaults (geglu plan v3) ==="
timeout 3000 python bench.py 2>&1 | tail -2 | tee /tmp/r5a_defaults.log

echo "=== r5a.2 SDXL control at plan v2 ==="
THEATERGEN_GEGLU_PLAN=v2 THEATERGEN_BENCH_MODEL=sdxl \
  THEATERGEN_BENCH_STEPS=30 THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 3000 python bench.py 2>&1 | tail -2 | tee /tmp/r5a_sdxl_v2.log

echo "=== r5a done — RECORD the logs (see header) ==="
