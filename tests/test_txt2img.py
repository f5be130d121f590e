"""End-to-end tiny txt2img: the minimum slice of SURVEY.md §7."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.pipelines import sd
from theatergen_tpu.pipelines.bundle import init_bundle


@pytest.fixture(scope="module")
def bundle():
    return init_bundle(tiny_config(), jax.random.key(0))


def test_txt2img_runs_and_is_deterministic(bundle):
    pipe = sd.Text2Img(bundle, num_steps=3)
    img1 = pipe(jax.random.key(1), "a red apple on a table")
    img2 = pipe(jax.random.key(1), "a red apple on a table")
    img3 = pipe(jax.random.key(2), "a red apple on a table")
    assert img1.shape == (1, 16, 16, 3)  # tiny cfg: 8×8 latent, VAE scale 2
    assert float(img1.min()) >= 0.0 and float(img1.max()) <= 1.0
    np.testing.assert_array_equal(np.asarray(img1), np.asarray(img2))
    assert np.abs(np.asarray(img1) - np.asarray(img3)).max() > 1e-6


def test_denoise_trajectory_stacking(bundle):
    """Trajectory ys must be [S+1, B, h, w, 4] with traj[0] == initial noise
    (the reference's latents_all contract, models/pipelines.py:375-381)."""
    cfg = bundle.cfg
    sched_obj = __import__(
        "theatergen_tpu.ops.scheduler", fromlist=["make_schedule"]
    ).make_schedule(cfg.scheduler, 4)
    lat = sd.seeded_latents(jax.random.key(0), 1, 8, 8)
    ctx = jax.random.normal(
        jax.random.key(1), (2, cfg.text.max_length, cfg.unet.cross_attention_dim)
    )

    def unet_apply(x, t, c):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c,
        )

    final, traj = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5,
                             collect_trajectory=True)
    assert traj.shape == (5, 1, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(traj[0]), np.asarray(lat))
    np.testing.assert_array_equal(np.asarray(traj[-1]), np.asarray(final))


def test_encode_decode_roundtrip_scale(bundle):
    img = jax.random.uniform(jax.random.key(0), (1, 16, 16, 3)) * 2 - 1
    z = sd.encode_image(bundle, img)
    assert z.shape == (1, 8, 8, 4)
    out = sd.decode_latents(bundle, z)
    assert out.shape == (1, 16, 16, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_invert_then_denoise_consistency(bundle):
    """Inversion produces a trajectory of the right shape; denoising the
    inverted latents with the same context returns near the original
    (exact for a perfect model; here we check shape/finiteness only since
    weights are random)."""
    cfg = bundle.cfg
    z = jax.random.normal(jax.random.key(0), (1, 8, 8, 4)) * 0.2
    ctx = jax.random.normal(
        jax.random.key(1), (2, cfg.text.max_length, cfg.unet.cross_attention_dim)
    )
    noised, traj = sd.invert(bundle, z, ctx, num_steps=4)
    assert traj.shape == (5, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(noised)).all()


def test_cfg_combine():
    eps = jnp.stack([jnp.zeros((2, 2)), jnp.ones((2, 2))])
    out = sd.cfg_combine(eps.reshape(2, 2, 2), 7.5)
    np.testing.assert_allclose(np.asarray(out), 7.5)


def test_denoise_cfg_cutoff(bundle):
    """CFG truncation: cutoff >= S matches exact CFG; cutoff < S runs and
    stays finite with a full-length trajectory."""
    from theatergen_tpu.ops import scheduler as S

    cfg = bundle.cfg
    sched_obj = S.make_schedule(cfg.scheduler, 4)
    lat = sd.seeded_latents(jax.random.key(0), 1, 8, 8)
    ctx = jax.random.normal(
        jax.random.key(1), (2, cfg.text.max_length, cfg.unet.cross_attention_dim))

    def unet_apply(x, t, c):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c)

    exact, _ = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5)
    same, _ = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5,
                         cfg_cutoff_steps=4)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(same))
    fast, traj = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5,
                            cfg_cutoff_steps=2, collect_trajectory=True)
    assert traj.shape == (5, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(fast)).all()
    assert np.abs(np.asarray(fast - exact)).max() > 1e-7  # tail differs


def test_denoise_deepcache(bundle):
    """DeepCache in the denoise scan: interval=1 ≡ exact, interval=2 runs
    finite and differs; composes with CFG truncation (batched cache rows
    sliced to cond at the phase boundary)."""
    from theatergen_tpu.ops import scheduler as S

    cfg = bundle.cfg
    sched_obj = S.make_schedule(cfg.scheduler, 4)
    lat = sd.seeded_latents(jax.random.key(0), 1, 8, 8)
    ctx = jax.random.normal(
        jax.random.key(1), (2, cfg.text.max_length, cfg.unet.cross_attention_dim))

    def unet_apply(x, t, c, **kw):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c, **kw)

    exact, _ = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5)
    same, _ = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5,
                         deepcache_interval=1)
    np.testing.assert_array_equal(np.asarray(exact), np.asarray(same))
    fast, traj = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5,
                            deepcache_interval=2, collect_trajectory=True)
    assert traj.shape == (5, 1, 8, 8, 4)
    assert np.isfinite(np.asarray(fast)).all()
    assert np.abs(np.asarray(fast - exact)).max() > 1e-7
    combo, _ = sd.denoise(unet_apply, sched_obj, lat, ctx, 7.5,
                          deepcache_interval=2, cfg_cutoff_steps=2)
    assert np.isfinite(np.asarray(combo)).all()


def test_text2img_lcm_surface(bundle):
    """Text2Img(sampler='lcm') is the user surface for LCM(-LoRA)-merged
    checkpoints: guidance-free loop, finite [0,1] image, deterministic."""
    pipe = sd.Text2Img(bundle, num_steps=4, sampler="lcm")
    i1 = np.asarray(pipe(jax.random.key(7), "a knight"))
    i2 = np.asarray(pipe(jax.random.key(7), "a knight"))
    i3 = np.asarray(pipe(jax.random.key(8), "a knight"))
    assert i1.shape[-1] == 3
    assert np.isfinite(i1).all() and i1.min() >= 0.0 and i1.max() <= 1.0
    np.testing.assert_array_equal(i1, i2)
    assert not np.array_equal(i1, i3)


def test_lcm_lora_merge_then_sample(bundle):
    """The LCM-LoRA user flow end-to-end: merge adapter deltas into the
    UNet (models/lora.py), then sample with the guidance-free LCM loop —
    the merged weights must actually change the output."""
    import dataclasses

    from theatergen_tpu.models import lora as LR

    kernel = bundle.unet_params["encoder"]["down_blocks_0_attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    in_f, out_f = kernel.shape
    rng = np.random.RandomState(0)
    lora_sd = {
        "unet.down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
        ".lora_A.weight": rng.randn(2, in_f).astype(np.float32),
        "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
        ".lora_B.weight": rng.randn(out_f, 2).astype(np.float32),
    }
    merged = LR.apply_lora_unet(bundle.unet_params, lora_sd, scale=0.3)
    b2 = dataclasses.replace(bundle, unet_params=merged)

    base = np.asarray(sd.Text2Img(bundle, num_steps=4, sampler="lcm")(
        jax.random.key(7), "a knight"))
    with_lora = np.asarray(sd.Text2Img(b2, num_steps=4, sampler="lcm")(
        jax.random.key(7), "a knight"))
    assert np.isfinite(with_lora).all()
    assert with_lora.min() >= 0.0 and with_lora.max() <= 1.0
    assert not np.array_equal(base, with_lora)
