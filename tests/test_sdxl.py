"""SDXL path: per-level UNet generalization, dual encoders, EA sampler,
T2I-Adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import SchedulerConfig, tiny_xl_config
from theatergen_tpu.ops import scheduler as S
from theatergen_tpu.pipelines import sdxl
from theatergen_tpu.pipelines.bundle import init_bundle


CFG = tiny_xl_config()


@pytest.fixture(scope="module")
def bundle():
    return init_bundle(CFG, jax.random.key(0), with_t2i_adapter=True)


def test_euler_ancestral_schedule_tables():
    ea = S.make_euler_ancestral_schedule(SchedulerConfig(), 10)
    sig = np.asarray(ea.sigmas)
    assert sig.shape == (11,)
    assert sig[-1] == 0.0
    assert np.all(np.diff(sig) < 0)          # strictly decreasing
    assert float(ea.init_noise_sigma) == pytest.approx(sig[0])


def test_euler_ancestral_exact_inverse():
    """With the true epsilon and no ancestral noise, stepping recovers x0."""
    ea = S.make_euler_ancestral_schedule(SchedulerConfig(), 8)
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    x = x0 + ea.init_noise_sigma * eps
    for i in range(ea.num_steps):
        true_eps = (x - x0) / ea.sigmas[i]
        x = S.ea_step(ea, true_eps, jnp.int32(i), x, jnp.zeros_like(x))
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=1e-4)


def test_ea_scale_model_input():
    ea = S.make_euler_ancestral_schedule(SchedulerConfig(), 4)
    x = jnp.ones((1, 2, 2, 4))
    s0 = float(ea.sigmas[0])
    out = S.ea_scale_model_input(ea, x, jnp.int32(0))
    np.testing.assert_allclose(np.asarray(out), 1 / np.sqrt(s0**2 + 1),
                               rtol=1e-5)


def test_xl_unet_forward_with_micro_conditioning(bundle):
    cfg = bundle.cfg
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(2), (2, cfg.text.max_length, cfg.unet.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(3), (2, 32))
    tids = sdxl.default_time_ids(16, 16, 2)
    out = bundle.unet.apply(
        {"params": bundle.unet_params}, x, jnp.array([10, 500]), ctx,
        pooled_text=pooled, time_ids=tids)
    assert out.shape == (2, 8, 8, 4)
    # micro-conditioning must matter
    out2 = bundle.unet.apply(
        {"params": bundle.unet_params}, x, jnp.array([10, 500]), ctx,
        pooled_text=pooled * 2, time_ids=tids)
    assert np.abs(np.asarray(out - out2)).max() > 1e-6


def test_encode_prompts_xl_shapes(bundle):
    cfg = bundle.cfg
    ctx, pooled = sdxl.encode_prompts_xl(bundle, ["a castle"], ["blurry"])
    assert ctx.shape == (2, cfg.text.max_length,
                         cfg.text.hidden_size + cfg.text2.hidden_size)
    assert pooled.shape == (2, cfg.text2.projection_dim)


def test_t2i_adapter_features(bundle):
    cfg = bundle.cfg
    hint = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    feats = bundle.t2i_adapter.apply(
        {"params": bundle.t2i_adapter_params}, hint)
    assert len(feats) == len(cfg.unet.block_out_channels)
    assert feats[0].shape == (1, 8, 8, cfg.unet.block_out_channels[0])
    assert feats[1].shape == (1, 4, 4, cfg.unet.block_out_channels[1])


def test_text2img_xl_end_to_end(bundle):
    """Dual-encoder context is 80-dim (32+48), but the tiny XL UNet expects
    cross_attention_dim=32 — build a matching pipeline by projecting...
    instead, drive with the UNet's own dim via direct context."""
    # For the tiny config the XL pipeline is driven at the op level:
    cfg = bundle.cfg
    ea = S.make_euler_ancestral_schedule(cfg.scheduler, 3)
    ctx = jax.random.normal(
        jax.random.key(1), (2, cfg.text.max_length, cfg.unet.cross_attention_dim))
    pooled = jax.random.normal(jax.random.key(2), (2, 32))
    tids = sdxl.default_time_ids(16, 16, 2)

    def unet_apply(x, t, c, pool, ti):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c,
            pooled_text=pool, time_ids=ti)

    lat = jax.random.normal(jax.random.key(3), (1, 8, 8, 4)) * ea.init_noise_sigma
    final, traj = sdxl.denoise_xl(
        unet_apply, ea, jax.random.key(4), lat, ctx, pooled, tids, 5.0,
        collect_trajectory=True)
    assert final.shape == (1, 8, 8, 4)
    assert traj.shape == (4, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(final)).all()
    # determinism given the same rng
    final2, _ = sdxl.denoise_xl(
        unet_apply, ea, jax.random.key(4), lat, ctx, pooled, tids, 5.0)
    np.testing.assert_array_equal(np.asarray(final), np.asarray(final2))


def test_ip_adapter_plus_variant():
    """Resampler-based IP context ("plus"): patch tokens → query tokens."""
    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.pipelines.character import encode_ip_image, ip_context
    from theatergen_tpu.pipelines import sd as sd_mod

    cfg = tiny_config()
    b = init_bundle(cfg, jax.random.key(0), with_ip=True, with_vision=True,
                    ip_variant="plus")
    assert b.ip_variant == "plus"
    img = jax.random.uniform(jax.random.key(1), (1, 16, 16, 3))
    feats = encode_ip_image(b, img)
    assert feats.ndim == 3  # patch tokens, not pooled embeds
    text_ctx = jax.random.normal(
        jax.random.key(2),
        (2, cfg.text.max_length, cfg.unet.cross_attention_dim))
    ctx = ip_context(b, text_ctx, feats)
    assert ctx.shape == (2, cfg.text.max_length + cfg.ip_adapter.resampler_queries,
                         cfg.unet.cross_attention_dim)
    # and the plus unet consumes it
    out = b.unet_ip.apply(
        {"params": b.unet_ip_params},
        jnp.zeros((2, 8, 8, 4)), jnp.zeros((2,), jnp.int32), ctx,
        ip_scale=0.5)
    assert out.shape == (2, 8, 8, 4)


def test_theater_xl_turn(tmp_path):
    """Full orchestrator turn on the SDXL-shaped backbone: dual encoders,
    EulerAncestral char+final passes, T2I-Adapter conditioning."""
    from theatergen_tpu.db import CharacterDB
    from theatergen_tpu.theater import Theater

    b = init_bundle(CFG, jax.random.key(0), with_ip=True, with_vision=True,
                    with_t2i_adapter=True)
    db = CharacterDB(str(tmp_path))
    t = Theater(b, db, num_steps=2)
    assert t.is_xl and t.use_t2i and not t.use_controlnet
    spec = {"prompt": "a red knight in a forest", "bg_prompt": "a forest",
            "gen_boxes": [("a red knight", (60, 100, 150, 300))],
            "extra_neg_prompt": "", "obj_ids": [0],
            "canvas_height": 512, "canvas_width": 512}
    res = t.run_turn(spec, seed=0)
    H = CFG.pipeline.height
    assert res.image.shape == (H, H, 3)
    assert np.isfinite(res.image).all()
    assert db.has(0)
    # determinism under the ancestral sampler too — with a FRESH db: a
    # repeat on the same db is a DB hit (ip_scale 0.4 vs 0.0, reference
    # models/pipelines.py:183-199) and legitimately differs
    t2 = Theater(b, CharacterDB(str(tmp_path / "repeat")), num_steps=2)
    res2 = t2.run_turn(spec, seed=0)
    np.testing.assert_array_equal(res.image, res2.image)


def test_theater_xl_wave_and_batched_match_serial(tmp_path):
    """XL dialogues are wave-capable: micro-conds (pooled/time_ids) batch
    through the character runner's extra_cond axis and T2I-Adapter
    features through the final runner's adapter axis.  Wave-of-2 and
    batched-characters runs must reproduce the serial path."""
    from theatergen_tpu.db import CharacterDB
    from theatergen_tpu.theater import Theater, run_turn_wave

    b = init_bundle(CFG, jax.random.key(0), with_ip=True, with_vision=True,
                    with_t2i_adapter=True)
    spec1 = {"prompt": "a red knight and a green dragon in a forest",
             "bg_prompt": "a forest",
             "gen_boxes": [("a red knight", (60, 100, 150, 300)),
                           ("a green dragon", (300, 80, 180, 350))],
             "extra_neg_prompt": "", "obj_ids": [0, 1],
             "canvas_height": 512, "canvas_width": 512}
    spec2 = {"prompt": "a blue wizard on a mountain",
             "bg_prompt": "snowy mountains",
             "gen_boxes": [("a blue wizard", (200, 120, 160, 320))],
             "extra_neg_prompt": "", "obj_ids": [2],
             "canvas_height": 512, "canvas_width": 512}

    serial = []
    for i, sp in enumerate([spec1, spec2]):
        th = Theater(b, CharacterDB(str(tmp_path / f"s{i}")), num_steps=2)
        serial.append(th.run_turn(sp, seed=i))

    # within-turn character batching (XL extra_cond axis on the char runner)
    batched = Theater(b, CharacterDB(str(tmp_path / "b")), num_steps=2,
                      batch_characters=True).run_turn(spec1, seed=0)
    np.testing.assert_allclose(batched.image, serial[0].image, atol=2e-3)

    # dialogue wave (XL extra_cond + adapter axes on the final runner)
    ths = [Theater(b, CharacterDB(str(tmp_path / f"w{i}")), num_steps=2)
           for i in range(2)]
    assert all(t.is_xl and t.use_t2i for t in ths)
    wave = run_turn_wave(ths, [spec1, spec2], [0, 1])
    for s, wv in zip(serial, wave):
        np.testing.assert_allclose(wv.image, s.image, atol=2e-3)
        assert s.detections == wv.detections


def test_text2img_xl_pipeline_class(bundle):
    """Full Text2ImgXL: dual-encoder prompts → EA denoise → VAE decode."""
    from theatergen_tpu.pipelines.sdxl import Text2ImgXL

    pipe = Text2ImgXL(bundle, num_steps=2)
    img = pipe(jax.random.key(0), "a castle at dawn", "blurry")
    H = bundle.cfg.pipeline.height
    assert img.shape == (1, H, H, 3)
    assert np.isfinite(np.asarray(img)).all()
    # with a T2I hint
    hint = jax.random.uniform(jax.random.key(1), (H, H, 3))
    img2 = pipe(jax.random.key(0), "a castle at dawn", "blurry", hint=hint)
    assert np.abs(np.asarray(img) - np.asarray(img2)).max() >= 0


def test_segment_with_boxes_legacy():
    from theatergen_tpu.perception import sam as SM
    from theatergen_tpu.config import tiny_config

    scfg = tiny_config().sam
    sam = SM.SAMLite(scfg)
    s = scfg.image_size
    img = jax.random.uniform(jax.random.key(0), (s, s, 3))
    boxes = jnp.array([[0.1, 0.1, 0.5, 0.5], [0.4, 0.4, 0.9, 0.9]])
    params = sam.init(jax.random.key(1), img[None], boxes[None])["params"]
    masks, confs = SM.segment_with_boxes(sam, params, img, boxes, out_size=16)
    assert masks.shape == (2, 16, 16)
    assert confs.shape == (2,)


def test_denoising_end_truncates(bundle):
    from theatergen_tpu.pipelines.sdxl import Text2ImgXL

    full = Text2ImgXL(bundle, num_steps=4)
    half = Text2ImgXL(bundle, num_steps=4, denoising_end=0.5)
    assert full.sched.num_steps == 4
    assert half.sched.num_steps == 2
    assert half.sched.sigmas.shape[0] == 3


def test_sdxl_1024_runs_no_16k_attention():
    """The VERDICT r2 #6 decision rests on this: SDXL carries no
    attention at the 128² level (down block 0 is a plain DownBlock2D in
    the real model), so the longest self-attention at 1024px is 64² =
    4096 tokens — inside the whole-K flat kernel's budget. 16k sequences
    only arise at ≥2048px, where the online flat kernel
    (THEATERGEN_FLASH_FLAT16K) applies (BENCH_NOTES round 3)."""
    from theatergen_tpu.config import sdxl_config
    from theatergen_tpu.ops import flash_attention as fa

    cfg = sdxl_config().unet
    assert cfg.attention_levels[0] is False
    seqs = [(cfg.sample_size // 2 ** i) ** 2
            for i, has in enumerate(cfg.attention_levels) if has]
    assert max(seqs) == 4096
    q = jnp.zeros((2, 4096, 10, 64), jnp.bfloat16)
    assert fa.flat_supported(q, q)          # whole-K kernel covers 1024px
    q16 = jnp.zeros((2, 16384, 10, 64), jnp.bfloat16)
    assert fa.flat_online_supported(q16, q16)   # ≥2048px route exists


def test_text2img_xl_lcm_route(bundle):
    """SDXL few-step serving (VERDICT r4 next-#8): with
    scheduler_type='lcm', Text2ImgXL runs the guidance-free consistency
    loop (one cond-only UNet eval per step) — the route LCM-LoRA-XL
    merged weights (models/lora.py) take past the CFG ceiling."""
    import dataclasses as dc

    from theatergen_tpu.pipelines.sdxl import Text2ImgXL

    cfg = bundle.cfg
    lcm_cfg = dc.replace(cfg, pipeline=dc.replace(
        cfg.pipeline, scheduler_type="lcm"))
    b = dc.replace(bundle, cfg=lcm_cfg)
    pipe = Text2ImgXL(b, num_steps=4)
    assert pipe.is_lcm and pipe.sched.num_steps == 4
    img = pipe(jax.random.key(0), "a castle at dawn", "blurry")
    H = cfg.pipeline.height
    assert img.shape == (1, H, H, 3)
    assert np.isfinite(np.asarray(img)).all()
    # deterministic under the same key
    img2 = pipe(jax.random.key(0), "a castle at dawn", "blurry")
    np.testing.assert_array_equal(np.asarray(img), np.asarray(img2))
    # T2I hint threads through the cond-only batch too
    hint = jax.random.uniform(jax.random.key(1), (H, H, 3))
    img3 = pipe(jax.random.key(0), "a castle at dawn", "blurry", hint=hint)
    assert np.isfinite(np.asarray(img3)).all()
    # denoising_end is a CFG-schedule concept; LCM must reject it
    with pytest.raises(ValueError):
        Text2ImgXL(b, num_steps=4, denoising_end=0.5)
