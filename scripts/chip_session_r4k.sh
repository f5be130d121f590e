#!/bin/bash
# Round-4k chip session, three questions:
#  1. Defaults confirmation after the per-model fused_ff flag landed
#     (UNetConfig.fused_ff: SD1.5 True, SDXL False): one default
#     bench.py run must reproduce SD1.5 ~1.529 / IP ~1.50 / SDXL ~0.298.
#  2. geglu down-kernel planner A/B (v2 whole-M vs v3 pipeline-depth):
#     the r4f profile has the v2 kernel at ~52% of its binding floor
#     with only 5 grid cells at the big SDXL shapes; v3 gives >=16
#     cells for warmup/cooldown amortization.  SDXL is where the band
#     is biggest (18.69 ms/step).
#  3. Dialogue p50 sanity: the orchestrator's SD1.5 programs (char
#     batches 1-4 + ControlNet final pass) now inherit fused_ff=True —
#     only the batch-4 denoise program was A/B'd, so check the p50
#     (round-3 steady state: 15.75 s 2-pass fresh-DB).
#
#   nohup bash scripts/chip_session_r4k.sh > /tmp/chip_r4k.log 2>&1 &
set -u
cd "$(dirname "$0")/.."
stamp() { echo "=== $1 [$(date -u +%H:%M:%S)] ==="; }

stamp "bench defaults (family fused_ff flag: sd15 FF-on, sdxl FF-off)"
timeout 4800 python bench.py 2>&1 | tee /tmp/r4k_defaults.log | tail -4

stamp "sdxl geglu plan v3"
THEATERGEN_GEGLU_PLAN=v3 \
  THEATERGEN_BENCH_MODEL=sdxl THEATERGEN_BENCH_BATCH=1 \
  THEATERGEN_BENCH_STEPS=30 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4k_sdxl_planv3.log | tail -3

stamp "sd15 geglu plan v3 (the non-FF remnants under the family flag)"
THEATERGEN_GEGLU_PLAN=v3 THEATERGEN_BENCH_IP=0 THEATERGEN_BENCH_SDXL=0 \
  timeout 2400 python bench.py 2>&1 | tee /tmp/r4k_sd15_planv3.log | tail -3

stamp "dialogue p50 under the fused_ff defaults (2 passes, fresh DB)"
timeout 3600 python scripts/bench_dialogue.py --dialogues 2 \
  2>&1 | tee /tmp/r4k_dialogue.log | tail -5

stamp "done"
