#!/bin/bash
# Round-4b chip session: profiler-v2 itemization + first SDXL levers.
#   1. profiler v2 (HLO-joined per-op floors) for sd15 B4 and sdxl B1 —
#      the ms-level gap accounting (VERDICT r3 next-#4 and the #1 data)
#   2. flat-kernel q-block sweep at the SDXL-1024 attention shapes
#   3. scoped-VMEM fusion-depth A/B on the SDXL bench (HBM-bound step:
#      deeper XLA fusions = fewer HBM round trips, if the limit binds)
#
#   nohup bash scripts/chip_session_r4b.sh > /tmp/chip_r4b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "profile v2 sd15 (B4 CFG)"
timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4b_sd15_profile.log | tail -60

stamp "profile v2 sdxl (B1 CFG)"
THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4b_sdxl_profile.log | tail -80

stamp "flash q-block sweep at SDXL shapes"
timeout 2400 python scripts/bench_flash_sdxl.py 2>&1 \
  | tee /tmp/r4b_flash_sdxl.log

stamp "bench sdxl scoped-vmem 64M"
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 THEATERGEN_BENCH_IP=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4b_sdxl_vmem64.log | tail -2

stamp "bench sdxl scoped-vmem 32M"
XLA_FLAGS="--xla_tpu_scoped_vmem_limit_kib=32768" \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 THEATERGEN_BENCH_IP=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4b_sdxl_vmem32.log | tail -2

stamp "done"
