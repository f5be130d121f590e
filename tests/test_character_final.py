"""Character pipeline (IP + guidance + ref-attn capture) and final pass."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.pipelines import sd
from theatergen_tpu.pipelines.bundle import init_bundle
from theatergen_tpu.pipelines.character import (
    encode_ip_image, ip_context, make_character_pipeline,
)
from theatergen_tpu.pipelines.final import make_final_pipeline
from theatergen_tpu.pipelines.guidance import GuidanceInputs


@pytest.fixture(scope="module")
def bundle():
    return init_bundle(
        tiny_config(), jax.random.key(0),
        with_ip=True, with_controlnet=True, with_vision=True,
    )


def _gin(cfg):
    k = cfg.pipeline.max_objects
    return GuidanceInputs(
        boxes=jnp.zeros((k, 4)).at[0].set(jnp.array([0.2, 0.2, 0.8, 0.8])),
        token_pos=jnp.zeros((k, 2), jnp.int32).at[0, 0].set(2),
        token_valid=jnp.zeros((k, 2), bool).at[0, 0].set(True),
        obj_valid=jnp.zeros((k,), bool).at[0].set(True),
        word_token=jnp.zeros((k,), jnp.int32).at[0].set(2),
    )


def test_ip_context_append(bundle):
    cfg = bundle.cfg
    text_ctx = jnp.zeros((2, cfg.text.max_length, cfg.unet.cross_attention_dim))
    img_embed = jnp.ones((1, cfg.ip_adapter.clip_embeddings_dim))
    ctx = ip_context(bundle, text_ctx, img_embed)
    assert ctx.shape == (2, cfg.text.max_length + cfg.ip_adapter.num_tokens,
                         cfg.unet.cross_attention_dim)
    # cond and uncond ip tokens must differ (zeros vs real embeds)
    assert np.abs(np.asarray(ctx[0, -4:] - ctx[1, -4:])).max() > 1e-6


def test_encode_ip_image(bundle):
    img = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3))
    e = encode_ip_image(bundle, img)
    assert e.shape == (1, bundle.cfg.vision.projection_dim)


def test_character_pipeline_ip_scale_effect(bundle):
    cfg = bundle.cfg
    run, sched = make_character_pipeline(bundle, 2, use_ip=True)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(2),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    r0 = run(bundle.unet_ip_params, lat, ctx, jnp.float32(0.0), None)
    r1 = run(bundle.unet_ip_params, lat, ctx, jnp.float32(0.8), None)
    assert r0.trajectory.shape == (3, 1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(r0.trajectory[0]), np.asarray(lat))
    # ip scale must change the result
    assert np.abs(np.asarray(r0.latents - r1.latents)).max() > 1e-6


def test_character_pipeline_ref_attn_capture(bundle):
    cfg = bundle.cfg
    run, _ = make_character_pipeline(
        bundle, 2, use_ip=True, capture_ref_attn=True
    )
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(2),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    res = run(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), _gin(cfg))
    assert res.ref_attn is not None
    assert len(res.ref_attn) == len(cfg.guidance.attn_keys)
    for m in res.ref_attn:
        assert m.shape[0] == 2  # steps
        assert m.shape[1] == cfg.unet.num_attention_heads
        assert np.isfinite(np.asarray(m)).all()


def test_character_pipeline_guided_runs(bundle):
    cfg = bundle.cfg
    run, _ = make_character_pipeline(bundle, 2, use_ip=True, guided=True)
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(2),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    res = run(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), _gin(cfg))
    assert np.isfinite(np.asarray(res.latents)).all()
    # guidance must change the outcome vs unguided
    run_u, _ = make_character_pipeline(bundle, 2, use_ip=True, guided=False)
    res_u = run_u(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), None)
    assert np.abs(np.asarray(res.latents - res_u.latents)).max() > 1e-7


def test_character_pipeline_cfg_cutoff(bundle):
    """CFG truncation: frac=1.0 ≡ exact; frac<1 runs finite with full-length
    trajectory AND full-length ref-attn capture; tail differs from exact."""
    cfg = bundle.cfg
    steps = 4
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(2),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    run_exact, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True)
    run_same, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True,
        cfg_cutoff_fraction=1.0)
    run_fast, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True,
        cfg_cutoff_fraction=0.5)
    g = _gin(cfg)
    exact = run_exact(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), g)
    same = run_same(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), g)
    np.testing.assert_array_equal(np.asarray(exact.latents),
                                  np.asarray(same.latents))
    fast = run_fast(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), g)
    assert fast.trajectory.shape == (steps + 1, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(fast.latents)).all()
    assert np.abs(np.asarray(fast.latents - exact.latents)).max() > 1e-7
    # capture stays live through the cond-only tail, full step count
    for m_fast, m_exact in zip(fast.ref_attn, exact.ref_attn):
        assert m_fast.shape == m_exact.shape
        assert m_fast.shape[0] == steps
        assert np.isfinite(np.asarray(m_fast)).all()
    # CFG-phase steps are identical work → identical captures
    np.testing.assert_allclose(np.asarray(fast.ref_attn[0][:2]),
                               np.asarray(exact.ref_attn[0][:2]), atol=1e-6)


def test_character_pipeline_deepcache(bundle):
    """interval=1 ≡ exact; interval=2 runs finite with the cached steps
    reusing the previous full step's ref-attn maps; composes with CFG
    truncation."""
    cfg = bundle.cfg
    steps = 4
    lat = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(2),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    run_base, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True)
    run_dc1, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True,
        deepcache_interval=1)
    run_dc2, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True,
        deepcache_interval=2)
    run_combo, _ = make_character_pipeline(
        bundle, steps, use_ip=True, capture_ref_attn=True,
        deepcache_interval=2, cfg_cutoff_fraction=0.5)
    base = run_base(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), None)
    same = run_dc1(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), None)
    np.testing.assert_array_equal(np.asarray(base.latents),
                                  np.asarray(same.latents))
    fast = run_dc2(bundle.unet_ip_params, lat, ctx, jnp.float32(0.4), None)
    assert np.isfinite(np.asarray(fast.latents)).all()
    assert fast.trajectory.shape == (steps + 1, 1, 8, 8, 4)
    assert np.abs(np.asarray(fast.latents - base.latents)).max() > 1e-7
    m = np.asarray(fast.ref_attn[0])
    assert m.shape[0] == steps and np.isfinite(m).all()
    np.testing.assert_array_equal(m[1], m[0])   # cached step reuses maps
    assert np.abs(m[2] - m[1]).max() > 0        # full step refreshes
    combo = run_combo(bundle.unet_ip_params, lat, ctx,
                      jnp.float32(0.4), None)
    assert np.isfinite(np.asarray(combo.latents)).all()
    assert combo.trajectory.shape == (steps + 1, 1, 8, 8, 4)


def test_final_pipeline_deepcache(bundle):
    """Final pass under DeepCache: finite, frozen replacement exact,
    interval=1 ≡ baseline."""
    cfg = bundle.cfg
    steps = 4
    latents_all = jax.random.normal(jax.random.key(3), (steps + 1, 1, 8, 8, 4))
    frozen_mask = jnp.zeros((8, 8)).at[:4, :4].set(1.0)
    ctx = jax.random.normal(
        jax.random.key(4),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    cn_ctx = ctx[:, : cfg.text.max_length]
    cond_img = jnp.zeros((16, 16, 3))
    args = (bundle.unet_ip_params, bundle.controlnet_params, latents_all,
            frozen_mask, jnp.int32(steps), ctx, cn_ctx, cond_img,
            jnp.float32(0.1), None)
    run_base, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True)
    run_dc1, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True,
        deepcache_interval=1)
    run_dc2, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True,
        deepcache_interval=2, cfg_cutoff_fraction=0.5)
    base, _ = run_base(*args)
    same, _ = run_dc1(*args)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    fast, traj = run_dc2(*args)
    assert traj.shape == (steps + 1, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(fast)).all()
    np.testing.assert_allclose(
        np.asarray(fast[0, :4, :4]), np.asarray(latents_all[-1][0, :4, :4]),
        atol=1e-5)


def test_final_pipeline_cfg_cutoff(bundle):
    """Final pass honors the truncation (incl. batch-1 ControlNet) and keeps
    the frozen-latent replacement exact in the cond-only tail."""
    cfg = bundle.cfg
    steps = 4
    run_exact, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True)
    run_fast, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True,
        cfg_cutoff_fraction=0.5)
    latents_all = jax.random.normal(jax.random.key(3), (steps + 1, 1, 8, 8, 4))
    frozen_mask = jnp.zeros((8, 8)).at[:4, :4].set(1.0)
    ctx = jax.random.normal(
        jax.random.key(4),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    cn_ctx = ctx[:, : cfg.text.max_length]
    cond_img = jnp.zeros((16, 16, 3))
    args = (bundle.unet_ip_params, bundle.controlnet_params, latents_all,
            frozen_mask, jnp.int32(steps), ctx, cn_ctx, cond_img,
            jnp.float32(0.1), None)
    exact, traj_e = run_exact(*args)
    fast, traj_f = run_fast(*args)
    assert traj_f.shape == traj_e.shape == (steps + 1, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(fast)).all()
    assert np.abs(np.asarray(fast - exact)).max() > 1e-7
    # frozen region still comes from the composed trajectory in BOTH modes
    np.testing.assert_allclose(
        np.asarray(fast[0, :4, :4]), np.asarray(latents_all[-1][0, :4, :4]),
        atol=1e-5)


def test_final_pipeline_frozen_replacement(bundle):
    cfg = bundle.cfg
    steps = 3
    run, sched = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True
    )
    latents_all = jax.random.normal(jax.random.key(3), (steps + 1, 1, 8, 8, 4))
    frozen_mask = jnp.zeros((8, 8)).at[:4, :4].set(1.0)
    ctx = jax.random.normal(
        jax.random.key(4),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    cn_ctx = ctx[:, : cfg.text.max_length]
    cond_img = jnp.zeros((16, 16, 3))
    final, traj = run(
        bundle.unet_ip_params, bundle.controlnet_params, latents_all,
        frozen_mask, jnp.int32(steps), ctx, cn_ctx, cond_img,
        jnp.float32(0.1), None,
    )
    # with frozen_steps == all steps, the masked region of the final latents
    # must equal the composed trajectory's final slot
    np.testing.assert_allclose(
        np.asarray(final[0, :4, :4]), np.asarray(latents_all[-1][0, :4, :4]),
        atol=1e-5,
    )
    # unmasked region must NOT match (it was denoised freely)
    assert np.abs(np.asarray(final[0, 4:, 4:]
                             - latents_all[-1][0, 4:, 4:])).max() > 1e-4
    # frozen_steps=0 leaves everything free
    final0, _ = run(
        bundle.unet_ip_params, bundle.controlnet_params, latents_all,
        frozen_mask, jnp.int32(0), ctx, cn_ctx, cond_img,
        jnp.float32(0.1), None,
    )
    assert np.abs(np.asarray(final0[0, :4, :4]
                             - latents_all[-1][0, :4, :4])).max() > 1e-4


def test_final_pipeline_controlnet_conditioning_matters(bundle):
    cfg = bundle.cfg
    run, _ = make_final_pipeline(bundle, 2, use_ip=True, use_controlnet=True)
    latents_all = jax.random.normal(jax.random.key(3), (3, 1, 8, 8, 4))
    ctx = jax.random.normal(
        jax.random.key(4),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    cn_ctx = ctx[:, : cfg.text.max_length]
    fm = jnp.zeros((8, 8))
    img1 = jnp.zeros((16, 16, 3))
    img2 = jnp.ones((16, 16, 3))
    f1, _ = run(bundle.unet_ip_params, bundle.controlnet_params, latents_all,
                fm, jnp.int32(0), ctx, cn_ctx, img1, jnp.float32(0.1), None)
    f2, _ = run(bundle.unet_ip_params, bundle.controlnet_params, latents_all,
                fm, jnp.int32(0), ctx, cn_ctx, img2, jnp.float32(0.1), None)
    # zero-init output convs: residuals identical at init → nudge params
    # of the zero convs so conditioning flows
    import jax as _jax
    cn = _jax.tree_util.tree_map(lambda x: x, bundle.controlnet_params)
    cn["controlnet_mid_block"]["kernel"] = (
        jnp.ones_like(cn["controlnet_mid_block"]["kernel"]) * 0.01
    )
    # the hint enters through the (also zero-init) cond-embedding out conv
    cn["controlnet_cond_embedding"]["conv_out"]["kernel"] = (
        jnp.ones_like(
            cn["controlnet_cond_embedding"]["conv_out"]["kernel"]
        ) * 0.01
    )
    f1n, _ = run(bundle.unet_ip_params, cn, latents_all, fm, jnp.int32(0),
                 ctx, cn_ctx, img1, jnp.float32(0.1), None)
    f2n, _ = run(bundle.unet_ip_params, cn, latents_all, fm, jnp.int32(0),
                 ctx, cn_ctx, img2, jnp.float32(0.1), None)
    assert np.abs(np.asarray(f1n - f2n)).max() > 1e-6
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f2), atol=1e-6)


def test_final_pipeline_controlnet_interval(bundle):
    """ControlNet residual caching: interval=1 ≡ baseline, interval=2
    finite with frozen replacement exact, and composes with cfg-cutoff
    (cache batch sliced at the phase switch)."""
    cfg = bundle.cfg
    steps = 4
    # random-init ControlNets emit EXACT zeros (zero-conv init) — perturb
    # the output convs so the residual path actually carries signal
    def noisy(path, x):
        p = "/".join(str(getattr(k, "key", k)) for k in path)
        if "controlnet_down_blocks" in p or "controlnet_mid_block" in p:
            return x + 0.05 * jax.random.normal(
                jax.random.fold_in(jax.random.key(9), x.size), x.shape)
        return x

    cn_params = jax.tree_util.tree_map_with_path(
        noisy, bundle.controlnet_params)
    latents_all = jax.random.normal(jax.random.key(3), (steps + 1, 1, 8, 8, 4))
    frozen_mask = jnp.zeros((8, 8)).at[:4, :4].set(1.0)
    ctx = jax.random.normal(
        jax.random.key(4),
        (2, cfg.text.max_length + 4, cfg.unet.cross_attention_dim),
    )
    cn_ctx = ctx[:, : cfg.text.max_length]
    cond_img = jnp.ones((16, 16, 3)) * 0.5
    args = (bundle.unet_ip_params, cn_params, latents_all,
            frozen_mask, jnp.int32(steps), ctx, cn_ctx, cond_img,
            jnp.float32(0.1), None)
    run_base, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True)
    run_cn1, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True,
        controlnet_interval=1)
    run_cn2, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True,
        controlnet_interval=2)
    run_cn2_cut, _ = make_final_pipeline(
        bundle, steps, use_ip=True, use_controlnet=True,
        controlnet_interval=2, cfg_cutoff_fraction=0.5)
    base, _ = run_base(*args)
    same, _ = run_cn1(*args)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(same))
    fast, traj = run_cn2(*args)
    assert traj.shape == (steps + 1, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(fast)).all()
    # cached steps differ from exact (the cache is actually being used)
    assert np.abs(np.asarray(fast - base)).max() > 1e-7
    np.testing.assert_allclose(
        np.asarray(fast[0, :4, :4]), np.asarray(latents_all[-1][0, :4, :4]),
        atol=1e-5)
    cut, _ = run_cn2_cut(*args)
    assert np.isfinite(np.asarray(cut)).all()
