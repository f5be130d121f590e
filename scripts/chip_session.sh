#!/bin/bash
# One serialized TPU session: runs the queued measurements in value order,
# one process at a time (the axon tunnel wedges under concurrent claims —
# BENCH_NOTES.md).  Run after /tmp/tpu_watch.sh reports recovery:
#   nohup bash scripts/chip_session.sh > /tmp/chip_session.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "probe3: flat kernel validation + timings"
timeout 3600 python scripts/bench_flash_probe3.py 2>&1 | grep -vE "WARNING|^\[2m"

stamp "bench: headline 50-step CFG, flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 3600 python bench.py 2>&1 | tail -2

stamp "bench: headline 50-step CFG, flat OFF (A/B)"
timeout 2400 python bench.py 2>&1 | tail -2

stamp "profile_step: per-op table, flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 2400 python scripts/profile_step.py 2>&1 | tail -30

stamp "bench: SDXL 1024px 30-step batch1, flat ON"
THEATERGEN_FLASH_FLAT=1 THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_STEPS=30 \
  THEATERGEN_BENCH_BATCH=1 timeout 3600 python bench.py 2>&1 | tail -2

stamp "bench_dialogue: DDIM-50 x2 (round-1 comparable), flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 3600 python scripts/bench_dialogue.py \
  --dialogues 2 2>&1 | tail -15

stamp "bench_dialogue: DDIM-50 + cn_interval 3, flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 2400 python scripts/bench_dialogue.py \
  --cn_interval 3 2>&1 | tail -15

stamp "bench_dialogue: LCM-4, flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 2400 python scripts/bench_dialogue.py \
  --scheduler lcm --num_steps 4 2>&1 | tail -15

stamp "bench_dialogue: DDIM-50 batched characters (one program/turn), flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 3600 python scripts/bench_dialogue.py \
  --batch_chars 2>&1 | tail -15

stamp "bench_serve: 4 sessions x 2 turns, wave vs serial, flat ON"
THEATERGEN_FLASH_FLAT=1 timeout 3600 python scripts/bench_serve.py \
  --sessions 4 --turns 2 2>&1 | tail -4

stamp "done"
