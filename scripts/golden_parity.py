"""TPU-side consumer of the reference golden bundles: latent-for-latent
parity verdicts (VERDICT r3 next-#2, extended to the reference's actual
hot paths in r5 per VERDICT r4 next-#2).

Two modes:

``--goldens DIR --weights WEIGHTS_DIR``
    The real measurement.  Loads the ported checkpoints, then for every
    case in DIR runs the kind-matched pipeline on the case's injected
    inputs and prints a JSON table of per-step latent MSE, final
    relative MSE, image PSNR, and a pass/fail verdict per row.  Kinds
    (see ``theatergen_tpu/eval/goldens.py``):

    - ``text2img``     bare DDIM+CFG loop; run twice — injected
                       embeddings (UNet+scheduler only) and own-encoder
                       (adds the text stack).
    - ``character_ip`` the IP-Adapter character pass (81-token context,
                       decoupled image attention); run twice — injected
                       ip tokens and own-projector (adds ImageProjModel).
    - ``final_cn``     ControlNet + frozen-mask composed final pass.
    - ``sdxl``         SDXL base UNet with micro-conditioning (DDIM).
    - ``sdxl_ea``      SDXL under EulerAncestral with the recorded
                       per-step noise injected (the reference's actual
                       XL sampler).

    Exit code 1 if any row fails.

``--self``
    No-torch self-test (runs in this environment): exports one golden
    bundle PER KIND from our own tiny random-weight pipelines through
    the same on-disk format the torch exporter writes, then consumes
    them.  The injection path must reproduce each recorded trajectory to
    ~0 error — this validates the format, the NCHW↔NHWC conversion, and
    the noise/context/mask threading end-to-end for every kind, so
    day-1-with-weights is only the torch half.

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


def _export_self_text2img(tdir, bundle):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.ops import scheduler as sched_ops
    from theatergen_tpu.pipelines import sd

    cfg = bundle.cfg
    steps = 4
    prompt, negative = "a red knight", ""
    context = np.asarray(sd.encode_prompts(bundle, prompt, negative))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(
        sd.seeded_latents(jax.random.key(7), 1, h, w), np.float32)
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
    GD.save_case(tdir, "self_text2img", prompt=prompt, negative=negative,
                 num_steps=steps, guidance_scale=7.5, seed=7,
                 init_latents=lat0, context=context,
                 trajectory=np.asarray(traj, np.float32), image=img)


def _export_self_character(tdir, bundle):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.pipelines import sd
    from theatergen_tpu.pipelines.character import (
        ip_context, make_character_pipeline,
    )

    cfg = bundle.cfg
    steps = 3
    prompt = "full-body picture of a red knight"
    negative = ("background, multiple objects, incomplete, lowres, "
                "bad anatomy, low quality, obscured")
    text_ctx = np.asarray(sd.encode_prompts(bundle, prompt, negative))
    embeds = np.asarray(jax.random.normal(
        jax.random.key(21), (1, cfg.ip_adapter.clip_embeddings_dim)),
        np.float32)
    ctx = np.asarray(ip_context(bundle, jnp.asarray(text_ctx),
                                jnp.asarray(embeds)))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(
        sd.seeded_latents(jax.random.key(22), 1, h, w), np.float32)
    run, _ = make_character_pipeline(bundle, steps, use_ip=True,
                                     guided=False, guidance_scale=7.5)
    res = run(bundle.unet_ip_params, jnp.asarray(lat0), jnp.asarray(ctx),
              jnp.float32(0.4), None)
    img = np.asarray(sd.decode_latents(bundle, res.latents))[0]
    GD.save_case(tdir, "self_character_ip", prompt=prompt,
                 negative=negative, num_steps=steps, guidance_scale=7.5,
                 seed=22, kind="character_ip", ip_scale=0.4,
                 init_latents=lat0, context=ctx, image_embeds=embeds,
                 trajectory=np.asarray(res.trajectory, np.float32),
                 image=img)


def _export_self_final(tdir, bundle):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.pipelines import sd
    from theatergen_tpu.pipelines.final import make_final_pipeline

    cfg = bundle.cfg
    steps = 3
    frozen_steps = 2
    prompt, negative = "a knight and a dragon", "lowres"
    text_ctx = np.asarray(sd.encode_prompts(bundle, prompt, negative))
    # 81-token IP context for the UNet, text-only for the ControlNet
    ip_tokens = np.asarray(jax.random.normal(
        jax.random.key(31),
        (2, cfg.ip_adapter.num_tokens, cfg.unet.cross_attention_dim)),
        np.float32)
    ctx = np.concatenate([text_ctx, ip_tokens], axis=1)
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    latents_all = np.asarray(jax.random.normal(
        jax.random.key(32), (steps + 1, 1, h, w, 4)), np.float32)
    frozen_mask = np.zeros((h, w), np.float32)
    frozen_mask[: h // 2, : w // 2] = 1.0
    cond_image = np.asarray(jax.random.uniform(
        jax.random.key(33), (cfg.pipeline.height, cfg.pipeline.width, 3)),
        np.float32)
    run, _ = make_final_pipeline(bundle, steps, use_ip=True,
                                 use_controlnet=True, guided=False,
                                 guidance_scale=7.5)
    final, traj = run(bundle.unet_ip_params, bundle.controlnet_params,
                      jnp.asarray(latents_all), jnp.asarray(frozen_mask),
                      jnp.int32(frozen_steps), jnp.asarray(ctx),
                      jnp.asarray(text_ctx), jnp.asarray(cond_image),
                      jnp.float32(0.1), None)
    img = np.asarray(sd.decode_latents(bundle, final))[0]
    GD.save_case(tdir, "self_final_cn", prompt=prompt, negative=negative,
                 num_steps=steps, guidance_scale=7.5, seed=32,
                 kind="final_cn", ip_scale=0.1, frozen_steps=frozen_steps,
                 init_latents=latents_all[0], context=ctx,
                 cn_context=text_ctx, cond_image=cond_image,
                 latents_all=latents_all, frozen_mask=frozen_mask,
                 trajectory=np.asarray(traj, np.float32), image=img)


def _export_self_sdxl(tdir, bundle):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.ops import scheduler as sched_ops
    from theatergen_tpu.pipelines import sd
    from theatergen_tpu.pipelines.sdxl import (
        default_time_ids, encode_prompts_xl,
    )

    cfg = bundle.cfg
    steps = 3
    prompt, negative = "a castle at dusk", ""
    context, pooled = encode_prompts_xl(bundle, prompt, negative)
    context, pooled = np.asarray(context), np.asarray(pooled)
    time_ids = np.asarray(default_time_ids(
        cfg.pipeline.height, cfg.pipeline.width, 2))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(
        sd.seeded_latents(jax.random.key(41), 1, h, w), np.float32)
    sched = sched_ops.make_schedule(cfg.scheduler, steps)
    pooled_j, tids_j = jnp.asarray(pooled), jnp.asarray(time_ids)

    def unet_apply(x, t, c):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c,
            pooled_text=pooled_j[-x.shape[0]:],
            time_ids=tids_j[-x.shape[0]:])

    final, traj = jax.jit(
        lambda l, c: sd.denoise(unet_apply, sched, l, c, 7.5,
                                collect_trajectory=True))(
        jnp.asarray(lat0), jnp.asarray(context))
    img = np.asarray(sd.decode_latents(bundle, final))[0]
    GD.save_case(tdir, "self_sdxl", prompt=prompt, negative=negative,
                 num_steps=steps, guidance_scale=7.5, seed=41,
                 model="sdxl", kind="sdxl", init_latents=lat0,
                 context=context, pooled=pooled, time_ids=time_ids,
                 trajectory=np.asarray(traj, np.float32), image=img)


def _export_self_sdxl_ea(tdir, bundle):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.ops import scheduler as sched_ops
    from theatergen_tpu.pipelines import sd
    from theatergen_tpu.pipelines.sdxl import (
        default_time_ids, encode_prompts_xl,
    )

    cfg = bundle.cfg
    steps = 3
    prompt, negative = "a harbor at night", ""
    context, pooled = encode_prompts_xl(bundle, prompt, negative)
    context, pooled = np.asarray(context), np.asarray(pooled)
    time_ids = np.asarray(default_time_ids(
        cfg.pipeline.height, cfg.pipeline.width, 2))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    sched = sched_ops.make_euler_ancestral_schedule(cfg.scheduler, steps)
    lat0 = np.asarray(
        sd.seeded_latents(jax.random.key(51), 1, h, w)
        * sched.init_noise_sigma, np.float32)
    noise = np.asarray(jax.random.normal(
        jax.random.key(52), (steps, 1, h, w, 4)), np.float32)
    pooled_j, tids_j = jnp.asarray(pooled), jnp.asarray(time_ids)

    def unet_apply(x, t, c):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c,
            pooled_text=pooled_j[-x.shape[0]:],
            time_ids=tids_j[-x.shape[0]:])

    lat = jnp.asarray(lat0)
    traj = [lat0]
    for i in range(steps):
        scaled = sched_ops.ea_scale_model_input(sched, lat, i)
        eps = unet_apply(jnp.concatenate([scaled, scaled], axis=0),
                         sched.timesteps[i], jnp.asarray(context))
        eps = sd.cfg_combine(eps.astype(jnp.float32), 7.5)
        lat = sched_ops.ea_step(sched, eps, i, lat, jnp.asarray(noise[i]))
        traj.append(np.asarray(lat, np.float32))
    img = np.asarray(sd.decode_latents(bundle, lat))[0]
    GD.save_case(tdir, "self_sdxl_ea", prompt=prompt, negative=negative,
                 num_steps=steps, guidance_scale=7.5, seed=51,
                 model="sdxl", kind="sdxl_ea", init_latents=lat0,
                 context=context, pooled=pooled, time_ids=time_ids,
                 step_noise=noise,
                 trajectory=np.stack(traj, axis=0), image=img)


def self_test(out_json: str | None = None) -> int:
    import jax

    from theatergen_tpu.config import tiny_config, tiny_xl_config
    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.pipelines.bundle import init_bundle

    bundle = init_bundle(tiny_config(), jax.random.key(0),
                         with_ip=True, with_controlnet=True,
                         with_vision=True)
    xl_bundle = init_bundle(tiny_xl_config(), jax.random.key(1))

    rows = []
    with tempfile.TemporaryDirectory() as tdir:
        _export_self_text2img(tdir, bundle)
        _export_self_character(tdir, bundle)
        _export_self_final(tdir, bundle)
        _export_self_sdxl(tdir, xl_bundle)
        _export_self_sdxl_ea(tdir, xl_bundle)
        for name in GD.list_cases(tdir):
            case = GD.load_case(tdir, name)
            b = xl_bundle if case.kind.startswith("sdxl") else bundle
            res = GD.run_case(b, case)
            # latents must be bit-identical (same program, same inputs);
            # the image only survives a PNG uint8 round-trip, which
            # bounds PSNR near ~54 dB
            res["pass"] = bool(res["final_mse"] < 1e-9
                               and res.get("image_psnr_db", 0) > 50.0)
            rows.append(res)
            print(json.dumps(res), flush=True)
    table = {"rows": rows,
             "kinds": sorted({r["kind"] for r in rows}),
             "all_pass": all(r["pass"] for r in rows),
             "mode": "self-test (tiny random weights)"}
    print(json.dumps({"all_pass": table["all_pass"],
                      "kinds": table["kinds"], "n_rows": len(rows)}))
    if out_json:
        with open(out_json, "w") as f:
            json.dump(table, f, indent=1)
    return 0 if table["all_pass"] else 1


def real_run(goldens_dir: str, weights_dir: str,
             out_json: str | None = None) -> int:
    import json as _json

    from theatergen_tpu.config import sd15_config, sdxl_config
    from theatergen_tpu.eval import goldens as GD
    from theatergen_tpu.models.weights import load_bundle

    names = GD.list_cases(goldens_dir)
    # probe kinds from meta.json alone — load_case would deserialize
    # every 50-step trajectory twice, and the bundle choice below must
    # not require reading arrays (r5 code review)
    kinds = {}
    for n in names:
        with open(os.path.join(goldens_dir, n, "meta.json")) as f:
            kinds[n] = _json.load(f).get("kind", "text2img")
    need_sd15 = any(not k.startswith("sdxl") for k in kinds.values())
    need_xl = any(k.startswith("sdxl") for k in kinds.values())

    # load only the stacks the cases need: SD1.5 (ip+controlnet+vision,
    # weights.py:1185) and SDXL co-resident is the 16 GB-v5e OOM pattern
    # BENCH_NOTES r5d records
    bundle = load_bundle(sd15_config(), weights_dir) if need_sd15 else None
    xl_bundle = (load_bundle(sdxl_config(), weights_dir)
                 if need_xl else None)

    rows = []
    for name in names:
        case = GD.load_case(goldens_dir, name)
        b = xl_bundle if case.kind.startswith("sdxl") else bundle
        # isolation ladder per kind: injected first, then add our own
        # upstream stage (text encoder / IP projector) when possible
        modes = [{}]
        if case.kind == "text2img":
            modes.append({"use_own_text_encoder": True})
        elif case.kind == "character_ip" and case.image_embeds is not None:
            modes.append({"use_own_projector": True})
        for kw in modes:
            r = GD.run_case(b, case, **kw)
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
