#!/bin/bash
# Round-3d chip session: the four numbers still missing after r3/r3c,
# cheapest-first so a deadline cut loses the least.  One serialized TPU
# session (axon tunnel wedges under concurrent claims — BENCH_NOTES.md);
# keep the host CPU idle while this runs (1-CPU box: concurrent pytest
# starved r3c's batch_chars host phase to death).
#
#   1. headline bench.py confirm   — live number post flat16k default flip
#                                    (512px HLO bit-identical, cache warm)
#   2. batch_chars steady state    — program compiled in r3, params now fast
#   3. serve closed-loop serial    — the control r3 lost to a step timeout
#   4. LCM-4 dialogue steady state — fresh compile budget (~40 min)
#
#   nohup bash scripts/chip_session_r3d.sh > /tmp/chip_r3d.log 2>&1 &
# Steps tee full output to /tmp/r3d_<step>.log (never bare tail: it
# buffers until exit and eats tracebacks).
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

HARD_STOP=${THEATERGEN_CHIP_HARD_STOP:?set THEATERGEN_CHIP_HARD_STOP (epoch s)}
guard() {  # guard <est_cost_s> <label>
  local now; now=$(date +%s)
  if (( now + $1 > HARD_STOP )); then
    echo "SKIP (deadline, est ${1}s > $((HARD_STOP - now))s left): $2"
    return 1
  fi
  return 0
}

if guard 900 "headline confirm"; then
  stamp "bench: headline SD1.5 confirm (flat16k default ON, warm cache)"
  THEATERGEN_BENCH_TIMEOUT=700 timeout 900 python bench.py \
    2>&1 | tee /tmp/r3d_headline.log | tail -2
fi

if guard 1800 "batch_chars steady-state"; then
  stamp "bench_dialogue: batched characters, 2 passes (cached compile)"
  timeout 1800 python scripts/bench_dialogue.py --batch_chars --dialogues 2 \
    --passes 2 2>&1 | tee /tmp/r3d_batchchars.log | tail -30
fi

if guard 1500 "serve closed-loop serial control"; then
  stamp "bench_serve: closed-loop 4x2, wave vs serial (serial control)"
  timeout 1500 python scripts/bench_serve.py --sessions 4 --turns 2 \
    2>&1 | tee /tmp/r3d_serve.log | tail -6
fi

if guard 3000 "LCM-4 dialogue"; then
  stamp "bench_dialogue: LCM-4, 2 passes (fresh compile budget)"
  timeout 3000 python scripts/bench_dialogue.py --scheduler lcm --num_steps 4 \
    --dialogues 2 --passes 2 2>&1 | tee /tmp/r3d_lcm.log | tail -30
fi

stamp "done"
