#!/bin/bash
# Round-3 final chip session: the r3/r3b queues re-prioritized against the
# round deadline.  One serialized TPU session (the axon tunnel wedges under
# concurrent claims — BENCH_NOTES.md); each step is gated on an estimated
# worst-case cost vs a hard stop that leaves the chip free for the driver's
# end-of-round bench.py run (r02's 1.19 regression was exactly that
# contention).
#
# Priority order:
#   1. packed-projection A/B  — decides the BENCH_r03 headline default
#   2. SDXL 1024px 30-step    — BASELINE config 5, queued since round 1
#   3. compile-cached steady-state dialogue passes (honest turn metric)
#   4. flat16k isolated probe — the Sk>4096 kernel decision's number
#   5. SDXL per-op profile    — only if time remains (16k share already
#      closed architecturally; the profile is documentation, not a decision)
# Dropped vs r3/r3b: serve Poisson-LCM (closed-loop LCM dialogue already
# measured; lowest marginal information per chip-minute).
#
#   nohup bash scripts/chip_session_r3c.sh > /tmp/chip_r3c.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

HARD_STOP=${THEATERGEN_CHIP_HARD_STOP:-1787137800}  # 2026-08-19 11:10 UTC
guard() {  # guard <est_cost_s> <label> — skip the step if it can't finish
  local now; now=$(date +%s)
  if (( now + $1 > HARD_STOP )); then
    echo "SKIP (deadline, est ${1}s > $((HARD_STOP - now))s left): $2"
    return 1
  fi
  return 0
}

if guard 2100 "bench packed ON"; then
  stamp "bench: packed-projection ON (THEATERGEN_FLASH_PACKED=1)"
  THEATERGEN_FLASH_PACKED=1 THEATERGEN_BENCH_TIMEOUT=1900 \
    timeout 2100 python bench.py 2>&1 | tail -2
fi

if guard 1500 "bench packed OFF control"; then
  stamp "bench: packed-projection OFF (same-session control)"
  THEATERGEN_BENCH_TIMEOUT=1300 timeout 1500 python bench.py 2>&1 | tail -2
fi

if guard 6000 "SDXL 1024 bench"; then
  stamp "bench: SDXL 1024px 30-step batch1"
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_STEPS=30 \
    THEATERGEN_BENCH_BATCH=1 THEATERGEN_BENCH_TIMEOUT=5700 \
    timeout 6000 python bench.py 2>&1 | tail -2
fi

if guard 1800 "serial dialogue steady-state"; then
  stamp "bench_dialogue: serial DDIM-50, 2 passes (compile cached by r3)"
  timeout 1800 python scripts/bench_dialogue.py --dialogues 2 --passes 2 \
    2>&1 | tail -30
fi

if guard 1800 "batch_chars steady-state"; then
  stamp "bench_dialogue: batched characters, 2 passes (cached)"
  timeout 1800 python scripts/bench_dialogue.py --batch_chars --dialogues 2 \
    --passes 2 2>&1 | tail -30
fi

if guard 2100 "flat16k probe"; then
  stamp "flat16k probe: online flat kernel vs copy-based at 8k/16k"
  timeout 2100 python scripts/bench_flash_flat16k.py 2>&1 | tail -40
fi

if guard 5400 "SDXL per-op profile"; then
  stamp "profile_step: SDXL per-op table"
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 timeout 5400 \
    python scripts/profile_step.py 2>&1 | tail -40
fi

stamp "done"
