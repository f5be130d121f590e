#!/bin/bash
# Turnkey real-weights parity run (VERDICT r2 next-#3): on the FIRST
# machine with egress + ported checkpoints, one command goes from a
# weights directory to the BASELINE.json quality gate:
#
#   1. (once, on a machine with network) export the reference checkpoints:
#        python scripts/export_weights.py --out /path/to/weights
#   2. here:
#        bash scripts/parity_run.sh /path/to/weights [dataset_dir] [n_dialogues]
#
# Produces under parity_out/:
#   run/            the generated image tree ({dialogue}/{turn}/img_0.png)
#   db/             per-dialogue character databases
#   scores.json     ACCS / ATIS / AFID (+ detector-derived accuracies,
#                   provenance-suffixed) over the subset
#   scores.csv      per-dialogue/turn TIS+CCS rows (reference eval.py:298)
#   grid.png        side-by-side turn grid for eyeballing consistency
#
# Compare scores.json against the reference's CMIGBench numbers
# (CCS/TIS/AFID, eval.py:273-420) — parity within noise is the gate.
set -euo pipefail
cd "$(dirname "$0")/.."

WEIGHTS=${1:?usage: parity_run.sh WEIGHTS_DIR [DATASET_DIR] [N_DIALOGUES]}
DATASET=${2:-data/sample}
N=${3:-5}
OUT=${PARITY_OUT:-parity_out}

# PARITY_TINY=1: exercise the whole runbook with the tiny random-weight
# configuration (scores come out _UNVALIDATED; validates the plumbing,
# not quality) — this is how the script stays testable with no weights.
GEN_FLAGS=(--weights "$WEIGHTS" --snapshot "$OUT/snapshot")
EVAL_FLAGS=(--weights_dir "$WEIGHTS")
if [ "${PARITY_TINY:-0}" = "1" ]; then
  GEN_FLAGS=(--tiny --num_steps 3)
  EVAL_FLAGS=(--random-ok --tiny)
fi

mkdir -p "$OUT"

echo "=== generate: $N dialogues, DDIM-50, real weights ==="
python -m theatergen_tpu.cli.generate \
  "${GEN_FLAGS[@]}" \
  --dataset_path "$DATASET" --task story \
  --base_save_dir "$OUT/run" --database_path_base "$OUT/db" \
  --max_dialogues "$N" --repeats 1

echo "=== eval: CCS / TIS / AFID over the generated tree ==="
python -m theatergen_tpu.eval.cmig \
  --save_dir "$OUT/run/story/run0" \
  --dataset_path "$DATASET" --task story \
  "${EVAL_FLAGS[@]}" \
  --max_dialogues "$N" --csv "$OUT/scores.csv" \
  | tee "$OUT/scores.json"

echo "=== grid: side-by-side turns ==="
python - "$OUT/run/story/run0" "$OUT/grid.png" <<'EOF'
import os
import sys

import numpy as np
from PIL import Image

root, out = sys.argv[1], sys.argv[2]
rows = []
for dialogue in sorted(os.listdir(root))[:8]:
    drow = []
    for t in range(1, 5):
        p = os.path.join(root, dialogue, f"turn {t}", "img_0.png")
        if os.path.exists(p):
            drow.append(np.asarray(Image.open(p).convert("RGB").resize((256, 256))))
    if drow:
        rows.append(np.concatenate(drow, axis=1))
if rows:
    w = max(r.shape[1] for r in rows)
    rows = [np.pad(r, ((0, 0), (0, w - r.shape[1]), (0, 0))) for r in rows]
    Image.fromarray(np.concatenate(rows, axis=0)).save(out)
    print("wrote", out)
EOF

# ---- latent-level golden parity (VERDICT r3 next-#2) --------------------
# If a goldens bundle sits next to the weights (exported once by
# scripts/export_reference_goldens.py on the weights machine), compare
# our denoise loop latent-for-latent against the reference trajectories.
GOLDENS=${GOLDENS_DIR:-"$WEIGHTS/../goldens"}
if [ "${PARITY_TINY:-0}" = "1" ]; then
  echo "=== goldens: self-test (tiny, validates plumbing only) ==="
  python scripts/golden_parity.py --self --out_json "$OUT/goldens.json"
elif [ -d "$GOLDENS" ]; then
  echo "=== goldens: latent-for-latent parity vs reference trajectories ==="
  python scripts/golden_parity.py --goldens "$GOLDENS" \
    --weights "$WEIGHTS" --out_json "$OUT/goldens.json"
else
  echo "=== goldens: SKIPPED (no bundle at $GOLDENS — run"
  echo "    scripts/export_reference_goldens.py on the weights machine) ==="
fi

# ---- independent-judge detector agreement (VERDICT r3 next-#2c) ---------
# With ported GDINO weights the detect-regen loop stops grading its own
# homework; measure the attention-detect vs independent-detector gap.
echo "=== detector agreement (independent judge) ==="
if [ "${PARITY_TINY:-0}" = "1" ]; then
  python scripts/detect_agreement.py --n 4 | tee "$OUT/detect_agreement.txt"
else
  python scripts/detect_agreement.py --n 16 --weights_dir "$WEIGHTS" \
    | tee "$OUT/detect_agreement.txt"
fi

echo "=== done: $OUT/scores.json (quality) + $OUT/goldens.json (latent parity) ==="
