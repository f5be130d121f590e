#!/bin/bash
# r5d: kill the cold start (VERDICT r4 next-#6).
#
# r4k baseline: 321 s param materialization + 359 s first turn (vs
# 3.4 s steady).  Two levers, validated as two fresh processes:
#
#   1. process A: bench_dialogue --snapshot SNAP (cold: materializes,
#      saves snapshot, compiles — populates .jax_cache through the
#      tunnel)
#   2. process B: same command again (warm: snapshot fast-load +
#      compile-cache hits) — the serving story's second-process number.
#
# ONE TPU process at a time (sequential).  Logs /tmp/r5d_*.log.
#
# RECORD step: archive logs to data/bench_logs/ + cold/warm table in
# BENCH_NOTES.md, or discard with a reason there.
set -uo pipefail
cd "$(dirname "$0")/.."

SNAP=${SNAP:-/tmp/r5d_snapshot}
rm -rf "$SNAP"

echo "=== r5d.1 cold process (materialize + save snapshot) ==="
timeout 5400 python scripts/bench_dialogue.py --dialogues 1 --passes 1 \
  --snapshot "$SNAP" 2>&1 | tail -20 | tee /tmp/r5d_cold.log

echo "=== r5d.2 warm process (snapshot + compile cache) ==="
timeout 5400 python scripts/bench_dialogue.py --dialogues 1 --passes 1 \
  --snapshot "$SNAP" 2>&1 | tail -20 | tee /tmp/r5d_warm.log

echo "=== r5d done — RECORD the logs (see header) ==="
