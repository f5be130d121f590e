#!/bin/bash
# Round-4h chip session: software-pipelined full-FF kernel.
#
# r4g found: naive full-FF kernel = 0.60 ms/instance (serial
# dot→gelu→dot leaves the MXU idle through the VPU band) AND ~15 ms of
# collateral conv-band slowdown on SDXL from 70 big-VMEM pallas calls
# starving XLA's prefetch (SDXL 0.2755 vs v2's 0.2978; SD1.5 1.4738 —
# a win there because SD1.5's XLA up-proj family ran at only 38 TF/s).
#
# This session: (1) isolated microbench of the pipelined kernel across
# VMEM budgets, (2) full SDXL/SD1.5 benches at 96M and a lean budget.
#
#   nohup bash scripts/chip_session_r4h.sh > /tmp/chip_r4h.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "microbench: pipelined ff_matmul across VMEM budgets"
timeout 3000 python scripts/bench_ff_fused.py 2>&1 \
  | tee /tmp/r4h_ff_micro.log

stamp "bench sdxl FUSED_FF pipelined (96M)"
THEATERGEN_FUSED_FF=1 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4h_sdxl_ff96.log | tail -3

stamp "bench sdxl FUSED_FF pipelined (40M lean)"
THEATERGEN_FUSED_FF=1 THEATERGEN_FF_VMEM_MB=40 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4h_sdxl_ff40.log | tail -3

stamp "bench sd15 FUSED_FF pipelined (96M, headline program)"
THEATERGEN_FUSED_FF=1 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4h_sd15_ff96.log | tail -3

stamp "done"
