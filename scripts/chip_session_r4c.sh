#!/bin/bash
# Round-4c chip session: corrected itemization + SDXL end-to-end A/Bs.
#   1. profiler v2 reruns (lane-filtered, HLO saved for offline parse
#      iteration) for sd15 B4 and sdxl B1
#   2. SDXL bench A/B: flat-kernel q-block override 512 / 1024 (r4b
#      isolated sweep ordered bq1024 < bq512 < bq256 at the 32x32 shape)
#   3. SDXL bench with LIBTPU_INIT_ARGS scoped-vmem raise (the XLA_FLAGS
#      spelling is rejected by the local parser — r4b)
#   4. fixed isolated flash sweep (forced fetch + packed-contract scale)
#   5. default bench.py (headline + ip_hot_loop + sdxl_1024 submetrics)
#      end-to-end through the refactored driver path
#
#   nohup bash scripts/chip_session_r4c.sh > /tmp/chip_r4c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "profile v2 sd15 (B4 CFG)"
THEATERGEN_TRACE_DIR=/tmp/tg_prof_sd15 \
  timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4c_sd15_profile.log | tail -30

stamp "profile v2 sdxl (B1 CFG)"
THEATERGEN_TRACE_DIR=/tmp/tg_prof_sdxl \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  timeout 2400 python scripts/profile_step.py 2>&1 \
  | tee /tmp/r4c_sdxl_profile.log | tail -30

stamp "bench sdxl FLAT_BQ=512"
THEATERGEN_FLAT_BQ=512 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4c_sdxl_bq512.log | tail -2

stamp "bench sdxl FLAT_BQ=1024"
THEATERGEN_FLAT_BQ=1024 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4c_sdxl_bq1024.log | tail -2

stamp "bench sdxl LIBTPU scoped-vmem 64M"
LIBTPU_INIT_ARGS="--xla_tpu_scoped_vmem_limit_kib=65536" \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4c_sdxl_vmem64.log | tail -2

stamp "flash sweep (fixed harness)"
timeout 2400 python scripts/bench_flash_sdxl.py 2>&1 \
  | tee /tmp/r4c_flash_sdxl.log

stamp "default bench (headline + ip + sdxl submetrics)"
timeout 2400 python bench.py 2>&1 | tee /tmp/r4c_default_bench.log | tail -2

stamp "done"
