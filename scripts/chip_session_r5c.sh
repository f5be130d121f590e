#!/bin/bash
# r5c: SDXL serving numbers (VERDICT r4 next-#3/#5/#8).
#
#   1. SDXL batch sweep at 1024px DDIM-30: batch 2 and 4 (batch 1 is
#      the r5a default run) — the dp serving story multiplies per-chip
#      throughput; also tests the "conv band 75% = batch-1 occupancy"
#      attribution.
#   2. SDXL LCM few-step: 4 and 8 steps, 1024px batch 1.
#   3. geglu block sweep at the two SDXL shapes (isolated kernel).
#
# ONE TPU process at a time; logs under /tmp/r5c_*.log.
#
# RECORD step: archive every /tmp/r5c_*.log to data/bench_logs/ +
# summarize in BENCH_NOTES.md, or discard with a reason there.
set -uo pipefail
cd "$(dirname "$0")/.."

for B in 2 4; do
  echo "=== r5c.1 SDXL batch $B ==="
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_STEPS=30 \
    THEATERGEN_BENCH_BATCH=$B THEATERGEN_BENCH_IP=0 \
    THEATERGEN_BENCH_SDXL=0 \
    timeout 3600 python bench.py 2>&1 | tail -2 \
    | tee /tmp/r5c_sdxl_b$B.log
done

for S in 4 8; do
  echo "=== r5c.2 SDXL LCM $S steps ==="
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_SAMPLER=lcm \
    THEATERGEN_BENCH_STEPS=$S THEATERGEN_BENCH_BATCH=1 \
    THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
    timeout 3600 python bench.py 2>&1 | tail -2 \
    | tee /tmp/r5c_sdxl_lcm$S.log
done

echo "=== r5c.3 geglu block sweep ==="
timeout 5400 python scripts/bench_geglu_sweep.py 2>&1 \
  | tail -40 | tee /tmp/r5c_geglu_sweep.log

echo "=== r5c done — RECORD the logs (see header) ==="
