#!/bin/bash
# Round-3f chip session: serve SLO with the LCM-4 sampler — the
# recommended interactive deployment (5 s turns vs DDIM's 13-35 s).
# Completes the BENCH_NOTES SLO matrix: wave-vs-serial closed-loop and
# sparse-Poisson cells existed only for DDIM-50.
#
#   nohup bash scripts/chip_session_r3f.sh > /tmp/chip_r3f.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench_serve LCM-4: closed-loop 4x2, wave + serial"
timeout 3600 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --scheduler lcm --num_steps 4 \
  2>&1 | tee /tmp/r3f_lcm_closed.log | tail -4

stamp "bench_serve LCM-4: Poisson 0.05/s, wave + serial"
timeout 3600 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --scheduler lcm --num_steps 4 --arrival_rate 0.05 \
  2>&1 | tee /tmp/r3f_lcm_poisson.log | tail -4

stamp "done"
