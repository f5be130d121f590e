#!/bin/bash
# Round-3 follow-up chip session (run AFTER chip_session_r3.sh exits —
# one TPU process at a time, the axon tunnel wedges under concurrent
# claims).  Ordered by headline impact: the packed-projection A/B feeds
# the official BENCH_r03 default decision, then compile-free steady
# states for the dialogue metric, then the flat16k probe (VERDICT r2
# next-#6: SDXL-1024 runs NO 16k attention — attention_levels gate level
# 0 off, max seq 4096 — so the kernel decision rests on the isolated
# probe; an SDXL FLAT16K bench A/B would compare identical programs).
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

stamp "bench_dialogue: batched characters, 2 passes (compiles cached by r3 session)"
timeout 2400 python scripts/bench_dialogue.py --batch_chars --dialogues 2 \
  --passes 2 2>&1 | tail -30

stamp "bench_dialogue: cn_interval 3, 2 passes (cached)"
timeout 2400 python scripts/bench_dialogue.py --cn_interval 3 --dialogues 2 \
  --passes 2 2>&1 | tail -30

stamp "flat16k probe: online flat kernel vs copy-based at 8k/16k"
timeout 3600 python scripts/bench_flash_flat16k.py 2>&1 | tail -40

stamp "bench_serve: Poisson SLO rerun (width-complete warm fix; caches hot)"
timeout 2400 python scripts/bench_serve.py --sessions 4 --turns 2 \
  --arrival_rate 0.05 2>&1 | tail -4

stamp "bench_dialogue: LCM-4 (r3 item timed out mid-compile; fresh compile here)"
timeout 3000 python scripts/bench_dialogue.py --scheduler lcm --num_steps 4 \
  --dialogues 2 --passes 2 2>&1 | tail -30

stamp "done"
