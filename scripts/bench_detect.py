"""Chip bench: GroundingDINO serial vs batched detection.

`GroundingDinoBackend.detect_batch` exists so a wave of B character
images costs ONE model dispatch + ONE host fetch instead of B of each
(the reference detects images one by one, ``utils/detector.py:5-21``).
This measures that claim on real hardware at the real
grounding-dino-tiny config (random weights — FLOP/byte-identical).

Prints one JSON line: per-B serial and batched seconds + speedup.

Usage (one TPU session at a time — BENCH_NOTES rules):
  timeout 1800 python scripts/bench_detect.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from theatergen_tpu.utils.fastinit import materialize_params, setup_compile_cache

setup_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from theatergen_tpu.perception.gdino import (
    GroundingDinoBackend, GroundingDinoConfig, GroundingDinoForDetection,
    WordPieceTokenizer,
)

PHRASES = ["a red knight", "a blue wizard", "a green archer", "a gray wolf"]


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--tiny", action="store_true",
                    help="tiny config CPU smoke (no timing value)")
    args = ap.parse_args()
    if args.tiny:
        from theatergen_tpu.perception.gdino import tiny_gdino_config

        cfg = tiny_gdino_config()
    else:
        cfg = GroundingDinoConfig()
    module = GroundingDinoForDetection(cfg)
    pad = GroundingDinoBackend.TEXT_PAD_LEN
    print("materializing gdino params...", flush=True)
    t0 = time.time()
    pixels0 = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    ids0 = np.zeros((1, pad), np.int64)
    from theatergen_tpu.perception.gdino import prepare_text_inputs

    sm0, pi0 = prepare_text_inputs(ids0)
    tm0 = np.ones((1, pad), bool)
    params = materialize_params(
        lambda: module.init(jax.random.key(0), pixels0, ids0, sm0, pi0,
                            text_token_mask=tm0)["params"],
        dtype=jnp.float32)
    print(f"params ready in {time.time() - t0:.0f}s", flush=True)

    # vocab content is irrelevant for timing: encode() maps unknown
    # words to [UNK]; only the id layout (< vocab_size) matters
    import tempfile

    with tempfile.NamedTemporaryFile("w", suffix=".txt", delete=False) as f:
        f.write("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "a"]) + "\n")
        vocab_path = f.name
    tok = WordPieceTokenizer(vocab_path)
    backend = GroundingDinoBackend(cfg, params, tok)

    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.random((4, 512, 512, 3), np.float32))

    results = {}
    for b in (1, 2, 4):
        ims, phrases = images[:b], PHRASES[:b]
        # warm both routes (each B is its own compiled batch program)
        for im, ph in zip(ims, phrases):
            backend(im, ph)
        backend.detect_batch(ims, phrases)

        t_serial = min(
            _timed(lambda: [backend(im, ph)
                            for im, ph in zip(ims, phrases)])
            for _ in range(3))
        t_batch = min(
            _timed(lambda: backend.detect_batch(ims, phrases))
            for _ in range(3))
        results[f"B{b}"] = {"serial_s": round(t_serial, 4),
                            "batched_s": round(t_batch, 4),
                            "speedup": round(t_serial / t_batch, 3)}
        print(f"B={b}: serial {t_serial:.3f}s batched {t_batch:.3f}s "
              f"({t_serial / t_batch:.2f}x)", flush=True)

    print(json.dumps({
        "metric": "GroundingDINO detection, serial vs detect_batch "
                  f"(random weights, {'tiny' if args.tiny else 'real'}"
                  f" config, {cfg.image_size}px)",
        **results,
    }))


def _timed(fn) -> float:
    t = time.perf_counter()
    out = fn()
    # Detection leaves are numpy/jnp already fetched by the backends'
    # np.asarray scoring; touch them anyway so laziness can't hide work
    leaves = jax.tree.leaves(out)
    for x in leaves:
        np.asarray(x)
    return time.perf_counter() - t


if __name__ == "__main__":
    main()
