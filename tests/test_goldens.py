"""Golden-parity kit: format round-trip, injection hooks, verdicts.

The kit (VERDICT r3 next-#2) makes day-1-with-weights a parity verdict:
``export_reference_goldens.py`` (torch side, not runnable here) dumps
noise/embeddings/trajectories; ``eval/goldens.py`` injects them through
our denoise loop.  These tests prove the no-torch half: the on-disk
format round-trips, injected inputs reproduce a recorded run exactly,
and a semantically wrong run fails the verdict loudly.
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.eval import goldens as GD
from theatergen_tpu.ops import latents as L
from theatergen_tpu.ops import scheduler as sched_ops
from theatergen_tpu.pipelines import sd
from theatergen_tpu.pipelines.bundle import init_bundle


@pytest.fixture(scope="module")
def bundle():
    return init_bundle(tiny_config(), jax.random.key(0))


def _export_self_case(bundle, tmp, steps=3, seed=11):
    cfg = bundle.cfg
    context = np.asarray(sd.encode_prompts(bundle, "a red knight", ""))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(sd.seeded_latents(jax.random.key(seed), 1, h, w),
                      np.float32)
    sched = sched_ops.make_schedule(cfg.scheduler, steps)

    def unet_apply(x, t, c):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c)

    final, traj = sd.denoise(unet_apply, sched, jnp.asarray(lat0),
                             jnp.asarray(context), 7.5,
                             collect_trajectory=True)
    img = np.asarray(sd.decode_latents(bundle, final))[0]
    GD.save_case(str(tmp), "case_a", prompt="a red knight", negative="",
                 num_steps=steps, guidance_scale=7.5, seed=seed,
                 init_latents=lat0, context=context,
                 trajectory=np.asarray(traj, np.float32), image=img)
    return lat0, context, np.asarray(traj, np.float32)


def test_format_round_trip(bundle, tmp_path):
    lat0, context, traj = _export_self_case(bundle, tmp_path)
    assert GD.list_cases(str(tmp_path)) == ["case_a"]
    case = GD.load_case(str(tmp_path), "case_a")
    # NHWC → NCHW on disk → NHWC back must be exact
    np.testing.assert_array_equal(case.init_latents, lat0)
    np.testing.assert_array_equal(case.context, context)
    np.testing.assert_array_equal(case.trajectory, traj)
    assert case.image.shape[-1] == 3
    # on-disk layout is torch NCHW (what the exporter writes)
    raw = np.load(os.path.join(tmp_path, "case_a", "init_latents.npy"))
    assert raw.shape == (1, 4) + lat0.shape[1:3]
    meta = json.load(open(os.path.join(tmp_path, "case_a", "meta.json")))
    assert meta["num_steps"] == 3 and meta["guidance_scale"] == 7.5


def test_injection_reproduces_recorded_run(bundle, tmp_path):
    _export_self_case(bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_a")
    res = GD.run_case(bundle, case)
    assert res["context"] == "injected"
    assert res["final_mse"] < 1e-9           # same program, same inputs
    assert max(res["step_mse"]) < 1e-9
    assert res["image_psnr_db"] > 50.0       # PNG uint8 round-trip bound
    assert GD.verdict(res)


def test_own_text_encoder_mode_matches_here(bundle, tmp_path):
    # our exported context came from our own encoder, so re-encoding must
    # agree; with real reference goldens this row isolates text-stack bugs
    _export_self_case(bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_a")
    res = GD.run_case(bundle, case, use_own_text_encoder=True)
    assert res["context"] == "own-encoder"
    assert res["final_mse"] < 1e-6
    assert GD.verdict(res)


def test_semantic_bug_fails_verdict(bundle, tmp_path):
    """A wrong guidance scale (the kind of bug parity exists to catch)
    must fail by orders of magnitude, not hide inside the tolerance."""
    _export_self_case(bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_a")
    case.guidance_scale = 1.0                # exported run used 7.5
    res = GD.run_case(bundle, case)
    assert res["final_rel_mse"] > 0.05
    assert not GD.verdict(res)


def test_input_latents_noise_injection():
    """input_latents_for_boxes accepts external unit-normal noise in place
    of its seeded draws (the orchestrator-path injection hook)."""
    boxes = jnp.array([[0.1, 0.1, 0.5, 0.5], [0.4, 0.4, 0.9, 0.9]])
    h = w = 8
    rng_bg, rng_fg = jax.random.key(1), jax.random.key(2)
    per_obj, bg = L.input_latents_for_boxes(rng_bg, rng_fg, boxes, h, w)
    # injecting the SAME noise the seeded path drew reproduces it exactly
    bg_noise = np.asarray(L.unscaled_latents(rng_bg, (1, h, w, 4)))
    fg_noise = np.asarray(L.unscaled_latents(rng_fg, (2, 1, h, w, 4)))
    per2, bg2 = L.input_latents_for_boxes(
        rng_bg, rng_fg, boxes, h, w, bg_noise=bg_noise, fg_noise=fg_noise)
    np.testing.assert_array_equal(np.asarray(per_obj), np.asarray(per2))
    np.testing.assert_array_equal(np.asarray(bg), np.asarray(bg2))
    # and DIFFERENT noise changes the result (the hook is actually live)
    per3, _ = L.input_latents_for_boxes(
        rng_bg, rng_fg, boxes, h, w, bg_noise=bg_noise * 0.0,
        fg_noise=fg_noise)
    assert np.abs(np.asarray(per_obj) - np.asarray(per3)).max() > 1e-3


def test_sampler_step_noise_injection():
    """Sampler.step(noise=...) overrides the ancestral/consistency draw."""
    cfg = tiny_config().scheduler
    for kind in ("euler_ancestral", "lcm"):
        s = sched_ops.make_sampler(cfg, 4, kind=kind)
        x = jax.random.normal(jax.random.key(3), (1, 8, 8, 4))
        eps = jax.random.normal(jax.random.key(4), (1, 8, 8, 4))
        rng = jax.random.key(5)
        # injecting the same noise the rng path folds in → identical step
        ref_noise = jax.random.normal(jax.random.fold_in(rng, 1), x.shape,
                                      jnp.float32)
        a = s.step(eps, 1, x, rng=rng)
        b = s.step(eps, 1, x, noise=ref_noise)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
        # a different injected noise changes the step
        c = s.step(eps, 1, x, noise=ref_noise * 0.0)
        assert np.abs(np.asarray(a) - np.asarray(c)).max() > 1e-6


def test_psnr_and_verdict_edges():
    a = np.zeros((4, 4, 3)); b = np.zeros((4, 4, 3))
    assert GD.psnr(a, b) == float("inf")
    b[0, 0, 0] = 1.0
    assert 0 < GD.psnr(a, b) < 60
    assert GD.verdict({"final_rel_mse": 0.01})
    assert not GD.verdict({"final_rel_mse": 0.2})
    assert not GD.verdict({"final_rel_mse": 0.01, "image_psnr_db": 10.0})


# ---------------------------------------------------------------------------
# r5: the reference's actual hot paths get latent-level parity targets
# (VERDICT r4 next-#2) — character_ip, final_cn, sdxl case kinds.
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def full_bundle():
    return init_bundle(tiny_config(), jax.random.key(1),
                       with_ip=True, with_controlnet=True, with_vision=True)


def _export_character_case(b, tmp, steps=2, seed=21):
    from theatergen_tpu.pipelines.character import (
        ip_context, make_character_pipeline,
    )

    cfg = b.cfg
    prompt = "full-body picture of a red knight"
    text_ctx = np.asarray(sd.encode_prompts(b, prompt, ""))
    embeds = np.asarray(jax.random.normal(
        jax.random.key(seed), (1, cfg.ip_adapter.clip_embeddings_dim)),
        np.float32)
    ctx = np.asarray(ip_context(b, jnp.asarray(text_ctx),
                                jnp.asarray(embeds)))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(sd.seeded_latents(jax.random.key(seed + 1), 1, h, w),
                      np.float32)
    run, _ = make_character_pipeline(b, steps, use_ip=True, guided=False,
                                     guidance_scale=7.5)
    res = run(b.unet_ip_params, jnp.asarray(lat0), jnp.asarray(ctx),
              jnp.float32(0.4), None)
    img = np.asarray(sd.decode_latents(b, res.latents))[0]
    GD.save_case(str(tmp), "case_ip", prompt=prompt, negative="",
                 num_steps=steps, guidance_scale=7.5, seed=seed,
                 kind="character_ip", ip_scale=0.4, init_latents=lat0,
                 context=ctx, image_embeds=embeds,
                 trajectory=np.asarray(res.trajectory, np.float32),
                 image=img)


def test_character_ip_case_round_trip(full_bundle, tmp_path):
    _export_character_case(full_bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_ip")
    assert case.kind == "character_ip" and case.ip_scale == 0.4
    assert case.image_embeds is not None
    res = GD.run_case(full_bundle, case)
    assert res["context"] == "injected"
    assert res["final_mse"] < 1e-9
    # own-projector mode: our exported ip tokens came from our own
    # projector, so rebuilding them from image_embeds must agree
    res2 = GD.run_case(full_bundle, case, use_own_projector=True)
    assert res2["context"] == "own-projector"
    assert res2["final_mse"] < 1e-6


def test_character_ip_wrong_scale_fails(full_bundle, tmp_path):
    """A wrong decoupled-attention scale (e.g. a to_k_ip porting bug
    showing up as an effective scale change) must fail the verdict
    loudly."""
    _export_character_case(full_bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_ip")
    case.ip_scale = 4.0                       # exported at 0.4
    res = GD.run_case(full_bundle, case)
    assert res["final_rel_mse"] > 0.05
    assert not GD.verdict(res)


def _export_final_case(b, tmp, steps=3, frozen_steps=2, seed=31):
    from theatergen_tpu.pipelines.final import make_final_pipeline

    cfg = b.cfg
    prompt = "a knight and a dragon"
    text_ctx = np.asarray(sd.encode_prompts(b, prompt, "lowres"))
    ip_tokens = np.asarray(jax.random.normal(
        jax.random.key(seed),
        (2, cfg.ip_adapter.num_tokens, cfg.unet.cross_attention_dim)),
        np.float32)
    ctx = np.concatenate([text_ctx, ip_tokens], axis=1)
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    latents_all = np.asarray(jax.random.normal(
        jax.random.key(seed + 1), (steps + 1, 1, h, w, 4)), np.float32)
    fm = np.zeros((h, w), np.float32)
    fm[: h // 2, : w // 2] = 1.0
    cond_image = np.asarray(jax.random.uniform(
        jax.random.key(seed + 2),
        (cfg.pipeline.height, cfg.pipeline.width, 3)), np.float32)
    run, _ = make_final_pipeline(b, steps, use_ip=True, use_controlnet=True,
                                 guided=False, guidance_scale=7.5)
    final, traj = run(b.unet_ip_params, b.controlnet_params,
                      jnp.asarray(latents_all), jnp.asarray(fm),
                      jnp.int32(frozen_steps), jnp.asarray(ctx),
                      jnp.asarray(text_ctx), jnp.asarray(cond_image),
                      jnp.float32(0.1), None)
    img = np.asarray(sd.decode_latents(b, final))[0]
    GD.save_case(str(tmp), "case_final", prompt=prompt, negative="lowres",
                 num_steps=steps, guidance_scale=7.5, seed=seed,
                 kind="final_cn", ip_scale=0.1, frozen_steps=frozen_steps,
                 init_latents=latents_all[0], context=ctx,
                 cn_context=text_ctx, cond_image=cond_image,
                 latents_all=latents_all, frozen_mask=fm,
                 trajectory=np.asarray(traj, np.float32), image=img)


def test_final_cn_case_round_trip(full_bundle, tmp_path):
    _export_final_case(full_bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_final")
    assert case.kind == "final_cn" and case.frozen_steps == 2
    assert case.latents_all.shape[0] == case.num_steps + 1
    # NHWC round trip of the 5-D composed trajectory
    raw = np.load(os.path.join(tmp_path, "case_final", "latents_all.npy"))
    assert raw.shape[2] == 4                  # NCHW on disk
    res = GD.run_case(full_bundle, case)
    assert res["final_mse"] < 1e-9
    assert GD.verdict(res)


def test_final_cn_frozen_off_by_one_fails(full_bundle, tmp_path):
    """The frozen-replacement window is the subtle port point
    (reference models/pipelines.py:833-834): shifting frozen_steps must
    blow up the trajectory comparison, not sneak through."""
    _export_final_case(full_bundle, tmp_path)
    case = GD.load_case(str(tmp_path), "case_final")
    case.frozen_steps = 0                     # exported with 2
    res = GD.run_case(full_bundle, case)
    assert res["final_rel_mse"] > 0.05
    assert not GD.verdict(res)


def test_sdxl_case_round_trip(tmp_path):
    from theatergen_tpu.config import tiny_xl_config
    from theatergen_tpu.pipelines.sdxl import (
        default_time_ids, encode_prompts_xl,
    )

    b = init_bundle(tiny_xl_config(), jax.random.key(2))
    cfg = b.cfg
    steps = 2
    context, pooled = encode_prompts_xl(b, "a castle", "")
    context, pooled = np.asarray(context), np.asarray(pooled)
    time_ids = np.asarray(default_time_ids(
        cfg.pipeline.height, cfg.pipeline.width, 2))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    lat0 = np.asarray(sd.seeded_latents(jax.random.key(3), 1, h, w),
                      np.float32)
    sched = sched_ops.make_schedule(cfg.scheduler, steps)
    pooled_j, tids_j = jnp.asarray(pooled), jnp.asarray(time_ids)

    def unet_apply(x, t, c):
        return b.unet.apply(
            {"params": b.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c,
            pooled_text=pooled_j[-x.shape[0]:],
            time_ids=tids_j[-x.shape[0]:])

    final, traj = sd.denoise(unet_apply, sched, jnp.asarray(lat0),
                             jnp.asarray(context), 7.5,
                             collect_trajectory=True)
    img = np.asarray(sd.decode_latents(b, final))[0]
    GD.save_case(str(tmp_path), "case_xl", prompt="a castle", negative="",
                 num_steps=steps, guidance_scale=7.5, seed=3,
                 model="sdxl", kind="sdxl", init_latents=lat0,
                 context=context, pooled=pooled, time_ids=time_ids,
                 trajectory=np.asarray(traj, np.float32), image=img)
    case = GD.load_case(str(tmp_path), "case_xl")
    assert case.kind == "sdxl" and case.pooled is not None
    res = GD.run_case(b, case)
    assert res["final_mse"] < 1e-9
    assert GD.verdict(res)
    # micro-conditioning is live: zeroing pooled must change the result
    case.pooled = np.zeros_like(case.pooled)
    res2 = GD.run_case(b, case)
    assert res2["final_mse"] > 0


def test_sdxl_ea_case_round_trip(tmp_path):
    """EulerAncestral SDXL case with recorded per-step noise: injection
    replays the draw exactly (ea_step takes explicit noise), and a
    shifted noise record must fail — proving the noise actually gates
    the comparison (the reference's real XL sampler, generate.py:125)."""
    from theatergen_tpu.config import tiny_xl_config
    from theatergen_tpu.pipelines.sdxl import (
        default_time_ids, encode_prompts_xl,
    )

    b = init_bundle(tiny_xl_config(), jax.random.key(4))
    cfg = b.cfg
    steps = 3
    context, pooled = encode_prompts_xl(b, "a harbor", "")
    context, pooled = np.asarray(context), np.asarray(pooled)
    time_ids = np.asarray(default_time_ids(
        cfg.pipeline.height, cfg.pipeline.width, 2))
    h, w = cfg.pipeline.latent_height, cfg.pipeline.latent_width
    sched = sched_ops.make_euler_ancestral_schedule(cfg.scheduler, steps)
    lat0 = np.asarray(sd.seeded_latents(jax.random.key(5), 1, h, w)
                      * sched.init_noise_sigma, np.float32)
    noise = np.asarray(jax.random.normal(
        jax.random.key(6), (steps, 1, h, w, 4)), np.float32)
    pooled_j, tids_j = jnp.asarray(pooled), jnp.asarray(time_ids)

    def unet_apply(x, t, c):
        return b.unet.apply(
            {"params": b.unet_params}, x,
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
    img = np.asarray(sd.decode_latents(b, lat))[0]
    GD.save_case(str(tmp_path), "case_ea", prompt="a harbor", negative="",
                 num_steps=steps, guidance_scale=7.5, seed=5,
                 model="sdxl", kind="sdxl_ea", init_latents=lat0,
                 context=context, pooled=pooled, time_ids=time_ids,
                 step_noise=noise, trajectory=np.stack(traj, axis=0),
                 image=img)
    case = GD.load_case(str(tmp_path), "case_ea")
    assert case.kind == "sdxl_ea" and case.step_noise.shape[0] == steps
    res = GD.run_case(b, case)
    assert res["sampler"] == "euler_ancestral"
    assert res["final_mse"] < 1e-9
    assert GD.verdict(res)
    # a rolled noise record must blow up the trajectory comparison
    case.step_noise = np.roll(case.step_noise, 1, axis=0)
    res2 = GD.run_case(b, case)
    assert res2["final_rel_mse"] > 0.05 or res2["final_mse"] > 1e-4
