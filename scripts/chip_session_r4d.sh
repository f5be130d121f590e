#!/bin/bash
# Round-4d chip session: the scoped-VMEM lever on the net_2 dot family
# (r4c itemization: FF second projections run at ~60 TF/s because the
# activation tile exceeds the 16M scoped-VMEM reservation).
#   A/B via per-compile compiler_options (THEATERGEN_SCOPED_VMEM_KIB);
#   the XLA_FLAGS spelling is rejected locally and the LIBTPU_INIT_ARGS
#   run produced tunnel-async garbage (r4c) — compile options are the
#   only spelling verified to reach the backend.
#
#   nohup bash scripts/chip_session_r4d.sh > /tmp/chip_r4d.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench sdxl scoped-vmem 64M (compiler_options)"
THEATERGEN_SCOPED_VMEM_KIB=65536 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4d_sdxl_vmem64.log | tail -3

stamp "bench sdxl scoped-vmem 32M"
THEATERGEN_SCOPED_VMEM_KIB=32768 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4d_sdxl_vmem32.log | tail -3

stamp "bench sd15 scoped-vmem 64M (headline program)"
THEATERGEN_SCOPED_VMEM_KIB=65536 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4d_sd15_vmem64.log | tail -3

stamp "bench sd15 scoped-vmem 128M"
THEATERGEN_SCOPED_VMEM_KIB=131072 \
  THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4d_sd15_vmem128.log | tail -3

stamp "done"
