#!/bin/bash
# Round-4a chip session: measurement wave for VERDICT r3 next-#1/#4/#5.
#   1. sd15 headline bench (first chip run of the IP hot-loop second metric)
#   2. sd15 batch-8 retest under flat16k+packed defaults (VERDICT #4)
#   3. sdxl-1024 bench reproduction (0.2876 baseline for the #1 work)
#   4. per-op profiles for both models — the data for the ms-level
#      itemization of the SD1.5 58%-of-floor and SDXL 64%-of-floor gaps
#
#   nohup bash scripts/chip_session_r4a.sh > /tmp/chip_r4a.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench sd15 default (B4, IP metric on)"
timeout 2400 python bench.py 2>&1 | tee /tmp/r4a_sd15.log | tail -2

stamp "bench sd15 batch 8"
THEATERGEN_BENCH_BATCH=8 THEATERGEN_BENCH_IP=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4a_sd15_b8.log | tail -2

stamp "bench sdxl 1024 (B1, 30 steps)"
THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 THEATERGEN_BENCH_IP=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4a_sdxl.log | tail -2

stamp "profile sdxl step (B1 CFG)"
THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4a_sdxl_profile.log | tail -45

stamp "profile sd15 step (B4 CFG)"
timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4a_sd15_profile.log | tail -45

stamp "done"
