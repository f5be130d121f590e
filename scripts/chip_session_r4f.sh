#!/bin/bash
# Round-4f chip session: fused-GEGLU A/B redo with the in-kernel erf
# polynomial (r4e's runs hit Mosaic's missing erf primitive).
#
#   nohup bash scripts/chip_session_r4f.sh > /tmp/chip_r4f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench sdxl FUSED_GEGLU"
THEATERGEN_FUSED_GEGLU=1 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4f_sdxl_geglu.log | tail -3

stamp "bench sd15 FUSED_GEGLU (headline program)"
THEATERGEN_FUSED_GEGLU=1 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4f_sd15_geglu.log | tail -3

stamp "profile sdxl FUSED_GEGLU (itemization under the kernel)"
THEATERGEN_FUSED_GEGLU=1 THEATERGEN_TRACE_DIR=/tmp/tg_prof_sdxl_geglu \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4f_sdxl_geglu_profile.log | tail -25

stamp "done"
