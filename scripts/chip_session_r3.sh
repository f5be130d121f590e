#!/bin/bash
# Round-3 remaining chip measurements (VERDICT r2 next-#2/#6/#8), one
# serialized TPU session — the axon tunnel wedges under concurrent
# claims (BENCH_NOTES.md).  Quick cached-compile items first so a
# mid-session tunnel drop still leaves data; the SDXL cold compiles
# (~40 min each observed) run last with a raised budget.
#   nohup bash scripts/chip_session_r3.sh > /tmp/chip_r3.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench_dialogue: DDIM-50 x2 (round-1 comparable)"
timeout 3600 python scripts/bench_dialogue.py --dialogues 2 2>&1 | tail -15

stamp "bench_dialogue: DDIM-50 batched characters (one program/turn)"
timeout 3600 python scripts/bench_dialogue.py --batch_chars 2>&1 | tail -15

stamp "bench_dialogue: LCM-4"
timeout 2400 python scripts/bench_dialogue.py \
  --scheduler lcm --num_steps 4 2>&1 | tail -15

stamp "bench_dialogue: DDIM-50 + cn_interval 3"
timeout 2400 python scripts/bench_dialogue.py --cn_interval 3 2>&1 | tail -15

stamp "bench_serve: 4 sessions x 2 turns, wave vs serial"
timeout 3600 python scripts/bench_serve.py --sessions 4 --turns 2 2>&1 | tail -6

stamp "bench_serve: Poisson arrivals SLO (4 sessions, lambda=0.05/s)"
timeout 3600 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --arrival_rate 0.05 2>&1 | tail -6

stamp "bench_serve: Poisson arrivals SLO, LCM-4"
timeout 2400 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --arrival_rate 0.05 --scheduler lcm --num_steps 4 2>&1 | tail -6

stamp "profile_step: SDXL per-op table (16k-attention share decision)"
THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 timeout 7200 \
  python scripts/profile_step.py 2>&1 | tail -40

stamp "bench: SDXL 1024px 30-step batch1"
THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_STEPS=30 \
  THEATERGEN_BENCH_BATCH=1 THEATERGEN_BENCH_TIMEOUT=8000 \
  timeout 8400 python bench.py 2>&1 | tail -2

stamp "done"
