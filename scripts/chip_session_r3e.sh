#!/bin/bash
# Round-3e chip session: the one number still missing after r3d — the
# serve closed-loop SERIAL control (r3 lost it to a 3600 s step timeout,
# r3d budgeted 1500 s for the whole wave+serial suite, which only covers
# params + the wave phase).  bench_serve now takes --modes so the serial
# control runs alone: params ~155 s + width-1 warm (2 turns) + 8 timed
# turns ~110 s.  One serialized TPU session; keep the host CPU idle.
#
#   nohup bash scripts/chip_session_r3e.sh > /tmp/chip_r3e.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench_serve: closed-loop 4x2 SERIAL control only"
timeout 1800 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --modes serial 2>&1 | tee /tmp/r3e_serve_serial.log | tail -6

stamp "bench_detect: GroundingDINO serial vs detect_batch (real config)"
timeout 1800 python scripts/bench_detect.py \
  2>&1 | tee /tmp/r3e_detect.log | tail -8

stamp "done"
