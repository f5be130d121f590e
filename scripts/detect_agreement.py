"""Quantify the attention-detect vs independent-detector gap (VERDICT r2 #5).

The reference verifies every generated character with an INDEPENDENT
GroundingDINO forward (``theatergen.py:98-160``); the no-weights default
here uses the generator's own aggregated cross-attention
(``theater.py`` detect phase) — the model grading its own homework.
This harness measures how often the two disagree.

Per seeded character generation it records three verdicts:
  A  attention_detect on the pipeline's own guidance-key attention
  B  A + CLIP crop-verify (ClipBoxScorer on A's box, the optional
     second check in ``perception/detector.py``)
  C  the independent detector backend (GroundingDINO; the reference's
     check and the ground truth of this comparison)
and prints the agreement matrix plus A's and B's false-pass rate
relative to C (how much garbage the self-check waves through).

With ``--weights_dir`` (real checkpoints) this is the real measurement.
Without it, every tower is random: C's verdicts are noise, so the table
validates the HARNESS and exposes one real failure mode — whether
attention-detect passes everything its own generator produces.

Usage::

    env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/detect_agreement.py \
        --n 8 [--weights_dir /path/to/ported]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_gdino_backend(weights_dir: str | None):
    import jax
    import numpy as np

    from theatergen_tpu.perception.gdino import (
        GroundingDinoBackend, GroundingDinoConfig, GroundingDinoForDetection,
        WordPieceTokenizer, prepare_text_inputs, tiny_gdino_config,
    )

    if weights_dir and os.path.exists(os.path.join(weights_dir,
                                                   "gdino.safetensors")):
        from theatergen_tpu.models.weights import (
            load_state_dict, port_grounding_dino,
        )

        sd = load_state_dict(os.path.join(weights_dir, "gdino.safetensors"))
        return GroundingDinoBackend(
            GroundingDinoConfig(), port_grounding_dino(sd),
            WordPieceTokenizer(os.path.join(weights_dir, "gdino_vocab.txt")))

    gcfg = tiny_gdino_config()
    gm = GroundingDinoForDetection(gcfg)
    ids = np.array([[101, 5, 6, 1012, 102]], np.int64)
    mask, pos = prepare_text_inputs(ids)
    gparams = gm.init(
        jax.random.key(0),
        np.zeros((1, gcfg.image_size, gcfg.image_size, 3), np.float32),
        ids, mask, pos)["params"]

    class _Tok:
        cls, sep, unk = 101, 102, 100
        vocab = {".": 1012}

        def encode(self, text):
            out = [self.cls]
            for t in text.split():
                out.append(1012 if t == "." else (hash(t) % 90) + 5)
            out.append(self.sep)
            return out

    return GroundingDinoBackend(gcfg, gparams, _Tok())


def run(n: int, weights_dir: str | None, seed: int, num_steps: int,
        clip_threshold: float = 0.2):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.config import sd15_config, tiny_config
    from theatergen_tpu.db import CharacterDB
    from theatergen_tpu.eval.cmig import ClipEmbedder
    from theatergen_tpu.perception import detector as det
    from theatergen_tpu.pipelines.bundle import init_bundle
    from theatergen_tpu.theater import Theater
    from theatergen_tpu.utils import parse

    import tempfile

    if weights_dir:
        from theatergen_tpu.models.weights import load_bundle

        bundle = load_bundle(sd15_config(), weights_dir)
        embedder = ClipEmbedder.from_weights_dir(weights_dir)
    else:
        bundle = init_bundle(tiny_config(), jax.random.key(0), with_ip=True,
                             with_vision=True)
        embedder = ClipEmbedder.eval_default(jax.random.key(0), tiny=True)
    backend = build_gdino_backend(weights_dir)
    scorer = det.ClipBoxScorer(embedder)

    db = CharacterDB(tempfile.mkdtemp(prefix="detagree_db_"))
    theater = Theater(bundle, db, num_steps=num_steps)
    spec = {
        "prompt": "a red knight in a forest",
        "gen_boxes": [("a red knight", (150, 100, 200, 350))],
        "bg_prompt": "a forest", "extra_neg_prompt": "", "obj_ids": [0],
        "canvas_height": 512, "canvas_width": 512,
    }
    plan = parse.convert_spec(spec, 512, 512).object_plans[0]
    prep = theater._character_prep(plan, "")
    lat_fn = theater._char_lat_fn()

    rows = []
    for i in range(n):
        rng = jax.random.fold_in(jax.random.key(seed), i)
        init_lat = lat_fn(jax.random.fold_in(rng, 0),
                          jax.random.fold_in(rng, 1),
                          jnp.asarray(prep["centered"])[None])
        result = theater.char_run(
            bundle.unet_ip_params, init_lat, prep["ctx"],
            jnp.float32(prep["ip_scale"]), prep["gin"],
            rng=jax.random.fold_in(rng, 7), extra_cond=prep["extra_cond"])
        image = theater._decode_img(result.latents)
        agg = theater._aggregate_attn(result.ref_attn)

        d_attn = det.attention_detect([jnp.asarray(m) for m in agg], None)
        a = bool(d_attn.ok)
        clip_score = scorer.score(image[0], d_attn.box, plan.phrase)
        b = a and clip_score > clip_threshold
        d_ext = backend(np.asarray(image[0]), plan.phrase)
        c = bool(d_ext.ok)
        rows.append((a, b, c, float(d_attn.confidence), clip_score,
                     float(d_ext.confidence)))

    A = np.array([r[0] for r in rows])
    B = np.array([r[1] for r in rows])
    C = np.array([r[2] for r in rows])
    out = {
        "n": n,
        "validated": bool(weights_dir),
        "pass_rate": {"attn": float(A.mean()), "attn+clip": float(B.mean()),
                      "detector": float(C.mean())},
        "agreement_with_detector": {"attn": float((A == C).mean()),
                                    "attn+clip": float((B == C).mean())},
        # false pass: self-check says ok, independent detector says no —
        # the rate at which the generator waves through its own failures
        "false_pass_vs_detector": {
            "attn": float((A & ~C).mean()),
            "attn+clip": float((B & ~C).mean()),
        },
    }
    if not weights_dir:
        out["caveat"] = ("random weights: detector verdicts are noise; "
                         "only pass_rate.attn (self-grading rate) and the "
                         "harness itself are meaningful — rerun with "
                         "--weights_dir for the real table")
    return out, rows


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--num_steps", type=int, default=3)
    ap.add_argument("--weights_dir", default=None)
    ap.add_argument("--clip_threshold", type=float, default=0.2)
    args = ap.parse_args(argv)
    out, rows = run(args.n, args.weights_dir, args.seed, args.num_steps,
                    args.clip_threshold)
    import json

    for i, r in enumerate(rows):
        print(f"  gen {i}: attn={r[0]} attn+clip={r[1]} detector={r[2]}"
              f"  (attn_conf {r[3]:.3f}, clip {r[4]:.3f}, det {r[5]:.3f})")
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
