#!/bin/bash
# Round-4j chip session: validate the new FF defaults (auto min-M gate,
# naive body, 48M budget) end-to-end.
#
# r4i found: full-FF everywhere wins SD1.5 (1.5292 vs 1.4615) but loses
# SDXL (0.2873/0.2845 vs 0.2978) — and the r4h2 microbench shows the
# shared shapes (8192,640)/(2048,1280) lose isolated too, so the SD1.5
# win lives in its 32768-row 64^2-level instances.  The new default is
# THEATERGEN_FUSED_FF=auto with FF_MIN_M=16384: SD1.5 fuses only the
# big instances (untested combination -> run 1), SDXL fuses nothing
# (expect 0.2978 parity -> same run).
#
#   nohup bash scripts/chip_session_r4j.sh > /tmp/chip_r4j.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench defaults (sd15 auto-mixed headline + ip + sdxl)"
timeout 4800 python bench.py 2>&1 | tee /tmp/r4j_defaults.log | tail -4

stamp "sd15 min_m=8192 (also fuse the 8192-row instances)"
THEATERGEN_FF_MIN_M=8192 THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4j_sd15_minm8192.log | tail -3

stamp "sd15 auto + 96M budget for the big instance"
THEATERGEN_FF_VMEM_MB=96 THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4j_sd15_vmem96.log | tail -3

stamp "done"
