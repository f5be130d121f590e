#!/bin/bash
# r5b: chip-time the guided (default) orchestrator path (VERDICT r4
# next-#4).
#
#   1. per-step guidance cost accounting (cfg step / grad iter /
#      guidance_update while_loop) at the batch-1 character shape
#   2. guided dialogue p50 (2 dialogues x 2 passes; pass 1 = steady)
#   3. guided=False control, same shape, same session
#
# ONE TPU process at a time; logs under /tmp/r5b_*.log.
#
# RECORD step: archive every /tmp/r5b_*.log to data/bench_logs/ +
# summarize in BENCH_NOTES.md, or discard with a reason there.
set -uo pipefail
cd "$(dirname "$0")/.."

echo "=== r5b.1 guidance step cost accounting ==="
timeout 3000 python scripts/bench_guidance_step.py 2>&1 \
  | tail -3 | tee /tmp/r5b_gcost.log

echo "=== r5b.2 guided dialogue ==="
timeout 5400 python scripts/bench_dialogue.py --guided --dialogues 2 \
  --passes 2 2>&1 | tail -30 | tee /tmp/r5b_dialogue_guided.log

echo "=== r5b.3 unguided control ==="
timeout 5400 python scripts/bench_dialogue.py --dialogues 2 --passes 2 \
  2>&1 | tail -30 | tee /tmp/r5b_dialogue_unguided.log

echo "=== r5b done — RECORD the logs (see header) ==="
