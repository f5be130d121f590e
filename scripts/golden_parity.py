"""TPU-side consumer of the reference golden bundles: latent-for-latent
parity verdicts (VERDICT r3 next-#2c).

Two modes:

``--goldens DIR --weights WEIGHTS_DIR``
    The real measurement.  Loads the ported checkpoints, then for every
    case in DIR runs our DDIM loop on the case's injected noise twice —
    once with the exported text embeddings (isolates UNet + scheduler)
    and once re-encoding the prompt through our tokenizer + CLIP
    (adds the text stack) — and prints a JSON table of per-step latent
    MSE, final relative MSE, image PSNR, and a pass/fail verdict per
    row.  Exit code 1 if any row fails.

``--self``
    No-torch self-test (runs in this environment): exports a golden
    bundle FROM our own tiny random-weight pipeline through the same
    on-disk format the torch exporter writes, then consumes it.  The
    injection path must reproduce the recorded trajectory to ~0 error —
    this validates the format, the NCHW↔NHWC conversion, and the
    noise/context threading end-to-end, so day-1-with-weights is only
    the torch half.

Usage::

    env -u PYTHONPATH JAX_PLATFORMS=cpu python scripts/golden_parity.py --self
    python scripts/golden_parity.py --goldens /g --weights /w
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def self_test(out_json: str | None = None) -> int:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.ops import scheduler as sched_ops
    from theatergen_tpu.pipelines import sd
    from theatergen_tpu.pipelines.bundle import init_bundle

    cfg = tiny_config()
    bundle = init_bundle(cfg, jax.random.key(0))
    steps = 4
    prompt, negative = "a red knight", ""
    context = np.asarray(sd.encode_prompts(bundle, prompt, negative))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(
        sd.seeded_latents(jax.random.key(7), 1, h, w), np.float32)

    # "export": run our own loop and record the trajectory + image,
    # exactly what export_reference_goldens.py records from torch
    sched = sched_ops.make_schedule(cfg.scheduler, steps)

    def unet_apply(x, t, c):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c)

    final, traj = jax.jit(
        lambda l, c: sd.denoise(unet_apply, sched, l, c, 7.5,
                                collect_trajectory=True))(
        jnp.asarray(lat0), jnp.asarray(context))
    img = np.asarray(sd.decode_latents(bundle, final))[0]

    with tempfile.TemporaryDirectory() as tdir:
        GD.save_case(tdir, "selfcase", prompt=prompt, negative=negative,
                     num_steps=steps, guidance_scale=7.5, seed=7,
                     init_latents=lat0, context=context,
                     trajectory=np.asarray(traj, np.float32), image=img)
        case = GD.load_case(tdir, "selfcase")
        res = GD.run_case(bundle, case)
    # latents must be bit-identical (same program, same inputs); the image
    # only survives a PNG uint8 round-trip, which bounds PSNR near ~54 dB
    ok = (res["final_mse"] < 1e-9
          and res.get("image_psnr_db", 0) > 50.0)
    res["pass"] = bool(ok)
    res["mode"] = "self-test (tiny random weights)"
    print(json.dumps(res, indent=1))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(res, f, indent=1)
    return 0 if ok else 1


def real_run(goldens_dir: str, weights_dir: str,
             out_json: str | None = None) -> int:
    from theatergen_tpu.config import sd15_config
    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.models.weights import load_bundle

    cfg = sd15_config()
    bundle = load_bundle(cfg, weights_dir)
    rows = []
    for name in GD.list_cases(goldens_dir):
        case = GD.load_case(goldens_dir, name)
        for own in (False, True):
            r = GD.run_case(bundle, case, use_own_text_encoder=own)
            r["pass"] = GD.verdict(r)
            rows.append(r)
            print(json.dumps(r), flush=True)
    table = {"rows": rows, "all_pass": all(r["pass"] for r in rows)}
    print(json.dumps({"all_pass": table["all_pass"],
                      "n_rows": len(rows)}))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(table, f, indent=1)
    return 0 if table["all_pass"] else 1


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--goldens", default=None)
    ap.add_argument("--weights", default=None)
    ap.add_argument("--self", action="store_true", dest="self_mode")
    ap.add_argument("--out_json", default=None)
    args = ap.parse_args()
    if args.self_mode:
        return self_test(args.out_json)
    if not (args.goldens and args.weights):
        ap.error("--goldens and --weights required (or --self)")
    return real_run(args.goldens, args.weights, args.out_json)


if __name__ == "__main__":
    raise SystemExit(main())
