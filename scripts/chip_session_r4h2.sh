#!/bin/bash
# r4h2: isolated microbench of the fixed pipelined full-FF kernel
# (static-parity scratch; bk 128-multiple planner) vs naive vs XLA.
set -u
cd "$(dirname "$0")/.."
echo "=== microbench ff_matmul pipe x budget [$(date -u +%H:%M:%S)] ==="
timeout 4800 python scripts/bench_ff_fused.py 2>&1 | tee /tmp/r4h2_ff_micro.log
echo "=== done [$(date -u +%H:%M:%S)] ==="
