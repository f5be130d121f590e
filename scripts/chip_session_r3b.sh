#!/bin/bash
# Round-3 follow-up chip session (run AFTER chip_session_r3.sh exits —
# one TPU process at a time, the axon tunnel wedges under concurrent
# claims).  Ordered by headline impact: the packed-projection A/B feeds
# the official BENCH_r03 default decision; the flat16k probe + SDXL A/B
# feed the VERDICT r2 next-#6 16k-attention decision.
#   nohup bash scripts/chip_session_r3b.sh > /tmp/chip_r3b.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench: packed-projection ON (THEATERGEN_FLASH_PACKED=1)"
THEATERGEN_FLASH_PACKED=1 THEATERGEN_BENCH_TIMEOUT=3000 \
  timeout 3600 python bench.py 2>&1 | tail -2

stamp "bench: packed-projection OFF (same-session control)"
THEATERGEN_BENCH_TIMEOUT=3000 timeout 3600 python bench.py 2>&1 | tail -2

stamp "bench_dialogue: serial DDIM-50, 2 passes (r3 item 1 showed 20.9s steady vs r1's 14.9s — pass 1 is compile-free)"
timeout 2400 python scripts/bench_dialogue.py --dialogues 2 --passes 2 \
  2>&1 | tail -30

stamp "bench_dialogue: batched characters steady state (compiles cached by r3 session)"
timeout 2400 python scripts/bench_dialogue.py --batch_chars --dialogues 2 \
  --passes 2 2>&1 | tail -30

stamp "bench_dialogue: LCM-4 (r3 item timed out mid-compile; fresh compile here)"
timeout 3000 python scripts/bench_dialogue.py --scheduler lcm --num_steps 4 \
  --dialogues 2 --passes 2 2>&1 | tail -30

stamp "bench_dialogue: cn_interval 3 steady state (cached)"
timeout 2400 python scripts/bench_dialogue.py --cn_interval 3 --dialogues 2 \
  --passes 2 2>&1 | tail -30

stamp "bench_serve: Poisson SLO rerun (width-complete warm fix; caches hot)"
timeout 2400 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --arrival_rate 0.05 2>&1 | tail -4

stamp "flat16k probe: online flat kernel vs copy-based at 8k/16k"
timeout 3600 python scripts/bench_flash_flat16k.py 2>&1 | tail -40

stamp "bench: SDXL 1024px 30-step with THEATERGEN_FLASH_FLAT16K=1"
THEATERGEN_FLASH_FLAT16K=1 THEATERGEN_BENCH_MODEL=sdxl \
  THEATERGEN_BENCH_STEPS=30 THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_TIMEOUT=8000 timeout 8400 python bench.py 2>&1 | tail -2

stamp "done"
