#!/bin/bash
# Round-4i chip session: in-model A/B of the full-FF kernel at the
# microbench-optimal config (naive body, lean VMEM).  r4h2/r4h3 isolated
# sweep: pipelining LOSES (scratch round-trips > VPU savings), lean
# budgets WIN (48M/bk128: 0.618 ms = 66% MXU at the 642 shape vs 96M's
# 0.712; pipe=1 96M was 1.14).  Controls: SDXL 0.2978 (v2-geglu
# default), SD1.5 1.4738 (naive FF 96M, r4g).
#
#   nohup bash scripts/chip_session_r4i.sh > /tmp/chip_r4i.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench sdxl FF naive 48M"
THEATERGEN_FUSED_FF=1 THEATERGEN_FF_PIPELINE=0 THEATERGEN_FF_VMEM_MB=48 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4i_sdxl_ff48.log | tail -3

stamp "bench sdxl FF naive 64M (bk=256 family)"
THEATERGEN_FUSED_FF=1 THEATERGEN_FF_PIPELINE=0 THEATERGEN_FF_VMEM_MB=64 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4i_sdxl_ff64.log | tail -3

stamp "bench sd15 FF naive 48M (headline program)"
THEATERGEN_FUSED_FF=1 THEATERGEN_FF_PIPELINE=0 THEATERGEN_FF_VMEM_MB=48 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4i_sd15_ff48.log | tail -3

stamp "done"
