"""DDIM schedule correctness: tables, round-trips, fast schedules."""

import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import SchedulerConfig
from theatergen_tpu.ops import scheduler as S


CFG = SchedulerConfig()


def test_beta_table_endpoints():
    betas = S.betas_for_schedule(CFG)
    assert betas.shape == (1000,)
    np.testing.assert_allclose(betas[0], 0.00085, rtol=1e-6)
    np.testing.assert_allclose(betas[-1], 0.012, rtol=1e-6)
    acp = S.alphas_cumprod_for(CFG)
    assert acp[0] > acp[-1] > 0


def test_uniform_timesteps_match_diffusers_leading():
    # diffusers DDIM, 50 steps, steps_offset=1: [981, 961, ..., 21, 1]
    ts = S.uniform_timesteps(CFG, 50)
    assert ts[0] == 981 and ts[-1] == 1
    assert len(ts) == 50
    assert np.all(np.diff(ts) == -20)


def test_alpha_prev_table_aligns_with_next_position():
    sched = S.make_schedule(CFG, 10)
    # alpha_prod_prev[i] must equal alphas_cumprod[timesteps[i+1]]
    np.testing.assert_allclose(
        np.asarray(sched.alpha_prod_prev[:-1]),
        np.asarray(sched.alphas_cumprod)[np.asarray(sched.timesteps[1:])],
    )
    # final prev = alphas_cumprod[0] (set_alpha_to_one=False)
    np.testing.assert_allclose(
        np.asarray(sched.alpha_prod_prev[-1]), np.asarray(sched.alphas_cumprod[0])
    )


def _final_target(sched, x0, noise):
    """With set_alpha_to_one=False the loop terminates at alpha_cumprod[0]
    (≈0.99915), not 1 — exactly diffusers' behavior for the reference config
    (generate.py:73)."""
    a0 = np.asarray(sched.alphas_cumprod[0])
    return np.sqrt(a0) * np.asarray(x0) + np.sqrt(1 - a0) * np.asarray(noise)


def test_ddim_step_denoises_perfect_epsilon():
    """If model_output is the exact noise used at t, stepping over the whole
    schedule from the noised sample must land on the analytic endpoint."""
    rng = np.random.RandomState(0)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    noise = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    sched = S.make_schedule(CFG, 25)
    t0 = sched.timesteps[0]
    x = S.add_noise(sched, x0, noise, t0)
    for i in range(sched.num_steps):
        x = S.ddim_step(sched, noise, jnp.int32(i), x)
    np.testing.assert_allclose(
        np.asarray(x), _final_target(sched, x0, noise), atol=2e-3
    )


def test_inversion_round_trip():
    """invert (with perfect epsilon) then denoise recovers x0."""
    rng = np.random.RandomState(1)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    inv = S.make_inversion_schedule(CFG, 20)
    fwd = S.make_schedule(CFG, 20)
    x = x0
    for i in range(inv.num_steps):
        x = S.ddim_inverse_step(inv, eps, jnp.int32(i), x)
    for i in range(fwd.num_steps):
        x = S.ddim_step(fwd, eps, jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-3)


def test_fast_schedule_subsamples_tail():
    ts_full = S.uniform_timesteps(CFG, 20)
    ts_fast = S.fast_timesteps(CFG, 20, fast_after_steps=10, fast_rate=2)
    np.testing.assert_array_equal(ts_fast[:10], ts_full[:10])
    np.testing.assert_array_equal(ts_fast[10:], ts_full[11::2])
    # degenerate case: fast_after >= len-1 returns full schedule
    np.testing.assert_array_equal(
        S.fast_timesteps(CFG, 20, fast_after_steps=19, fast_rate=2), ts_full
    )


def test_fast_schedule_still_denoises():
    rng = np.random.RandomState(2)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    noise = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    sched = S.make_schedule(CFG, 50, fast_after_steps=10, fast_rate=4)
    assert sched.num_steps == 10 + len(range(11, 50, 4))
    x = S.add_noise(sched, x0, noise, sched.timesteps[0])
    for i in range(sched.num_steps):
        x = S.ddim_step(sched, noise, jnp.int32(i), x)
    np.testing.assert_allclose(
        np.asarray(x), _final_target(sched, x0, noise), atol=2e-3
    )


def test_add_noise_vectorized_timesteps():
    """Per-step frozen-latent targets noise one sample at *all* schedule
    timesteps at once (reference models/pipelines.py:617-631)."""
    rng = np.random.RandomState(3)
    sched = S.make_schedule(CFG, 8)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    noise = jnp.asarray(rng.randn(8, 4, 8, 8), jnp.float32)
    out = S.add_noise(sched, x0, noise, sched.timesteps)  # [8,4,8,8]
    assert out.shape == (8, 4, 8, 8)
    one = S.add_noise(sched, x0[0], noise[3], sched.timesteps[3])
    np.testing.assert_allclose(np.asarray(out[3]), np.asarray(one), rtol=1e-5)


@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_ddim_step_eta_requires_noise(eta):
    sched = S.make_schedule(CFG, 4)
    x = jnp.zeros((1, 4, 8, 8))
    if eta > 0:
        with pytest.raises(ValueError):
            S.ddim_step(sched, x, jnp.int32(0), x, eta=eta)
    else:
        S.ddim_step(sched, x, jnp.int32(0), x, eta=eta)


def test_lcm_timesteps_match_diffusers_formula():
    """LCMScheduler grid: arange(1,K+1)*(T/K)-1, linspace-indexed from
    the end (current diffusers selection — covers non-divisor counts)."""
    from theatergen_tpu.ops.scheduler import make_lcm_schedule

    cfg = SchedulerConfig()
    s = make_lcm_schedule(cfg, 4, original_inference_steps=50)
    # skipping = 20; origin desc = [999, 979, ...]; floor-linspace indices
    # [0, 12, 25, 37]
    expect = np.asarray([999, 759, 499, 259], np.int32)
    np.testing.assert_array_equal(np.asarray(s.timesteps), expect)
    assert s.num_steps == 4
    # alpha_prod_prev is the next loop position's alpha
    acp = np.asarray(s.alpha_prod)
    np.testing.assert_allclose(np.asarray(s.alpha_prod_prev)[:-1], acp[1:])
    # non-divisor count keeps covering the low-noise end instead of
    # truncating: the last grid point must drop below t=100
    s33 = make_lcm_schedule(cfg, 33, original_inference_steps=50)
    ts33 = np.asarray(s33.timesteps)
    assert s33.num_steps == 33 and len(np.unique(ts33)) == 33
    assert ts33[-1] < 100 and (np.diff(ts33) < 0).all()


def test_lcm_step_boundary_condition():
    """Last step returns the boundary-scaled x0 blend (no re-noising);
    earlier steps re-noise toward the next grid point."""
    import jax

    from theatergen_tpu.ops.scheduler import lcm_step, make_lcm_schedule

    cfg = SchedulerConfig()
    s = make_lcm_schedule(cfg, 4)
    rng = jax.random.key(0)
    x = jax.random.normal(rng, (1, 4, 4, 4))
    eps = jax.random.normal(jax.random.key(1), (1, 4, 4, 4))
    noise = jax.random.normal(jax.random.key(2), (1, 4, 4, 4))

    i_last = jnp.asarray(3)
    a_t = s.alpha_prod[i_last]
    x0 = (x - jnp.sqrt(1 - a_t) * eps) / jnp.sqrt(a_t)
    st = s.timesteps[i_last].astype(jnp.float32) * s.timestep_scaling
    c_skip = s.sigma_data ** 2 / (st ** 2 + s.sigma_data ** 2)
    c_out = st / jnp.sqrt(st ** 2 + s.sigma_data ** 2)
    want = c_out * x0 + c_skip * x
    got = lcm_step(s, eps, i_last, x, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5)

    # non-final step: output variance includes the fresh-noise term
    got0 = lcm_step(s, eps, jnp.asarray(0), x, noise)
    assert not np.allclose(np.asarray(got0), np.asarray(got))


def test_lcm_sampler_end_to_end_tiny():
    """4-step guidance-free LCM loop through the tiny UNet stays finite."""
    import jax

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.models.unet import UNet2DCondition
    from theatergen_tpu.ops.scheduler import make_sampler
    from theatergen_tpu.pipelines.sd import lcm_denoise

    cfg = tiny_config()
    unet = UNet2DCondition(cfg.unet)
    lat = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(1),
                            (1, 16, cfg.unet.cross_attention_dim))
    params = unet.init(jax.random.key(2), lat,
                       jnp.zeros((1,), jnp.int32), ctx)["params"]
    sampler = make_sampler(cfg.scheduler, 4, kind="lcm")

    def unet_apply(x, t, c):
        return unet.apply({"params": params}, x,
                          jnp.broadcast_to(t[None], (x.shape[0],)), c)

    out = lcm_denoise(unet_apply, sampler, lat, ctx, jax.random.key(3))
    assert out.shape == lat.shape
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# prediction_type: v_prediction / sample / zero-terminal-SNR
# ---------------------------------------------------------------------------


def _perfect_outputs(sched, x0, eps, i):
    """Exact (epsilon, v, sample) model outputs at loop position i for the
    sample x_t = sqrt(a)·x0 + sqrt(1-a)·eps."""
    a = np.asarray(sched.alpha_prod[i], np.float64)
    v = np.sqrt(a) * np.asarray(eps) - np.sqrt(1.0 - a) * np.asarray(x0)
    return {
        "epsilon": eps,
        "v_prediction": jnp.asarray(v, jnp.float32),
        "sample": x0,
    }


@pytest.mark.parametrize("pred", ["v_prediction", "sample"])
def test_ddim_step_prediction_types_match_epsilon(pred):
    """A perfect model under any parameterization must produce the exact
    same DDIM update as the perfect-epsilon step."""
    rng = np.random.RandomState(7)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    base = S.make_schedule(CFG, 12)
    alt = S.make_schedule(
        SchedulerConfig(prediction_type=pred), 12)
    x_e = S.add_noise(base, x0, eps, base.timesteps[0])
    x_p = x_e
    for i in range(base.num_steps):
        outs = _perfect_outputs(base, x0, eps, i)
        x_e = S.ddim_step(base, outs["epsilon"], jnp.int32(i), x_e)
        x_p = S.ddim_step(alt, outs[pred], jnp.int32(i), x_p)
    np.testing.assert_allclose(np.asarray(x_p), np.asarray(x_e), atol=3e-3)


def test_zero_terminal_snr_rescale():
    """arXiv 2305.08891 alg. 1: terminal alpha_cumprod exactly 0, first
    sqrt(alpha_cumprod) preserved, table monotone decreasing."""
    cfg = SchedulerConfig(rescale_zero_terminal_snr=True,
                          prediction_type="v_prediction")
    acp = S.alphas_cumprod_for(cfg)
    base = S.alphas_cumprod_for(SchedulerConfig())
    assert acp[-1] == pytest.approx(0.0, abs=1e-12)
    np.testing.assert_allclose(np.sqrt(acp[0]), np.sqrt(base[0]), rtol=1e-12)
    assert np.all(np.diff(acp) < 0)


def test_zero_snr_v_prediction_denoises():
    """Perfect-v trajectory on the zero-SNR schedule still lands on the
    analytic endpoint (epsilon would divide by sqrt(0) at a terminal step)."""
    cfg = SchedulerConfig(rescale_zero_terminal_snr=True,
                          prediction_type="v_prediction")
    rng = np.random.RandomState(11)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    sched = S.make_schedule(cfg, 10)
    x = S.add_noise(sched, x0, eps, sched.timesteps[0])
    for i in range(sched.num_steps):
        x = S.ddim_step(sched, _perfect_outputs(sched, x0, eps, i)[
            "v_prediction"], jnp.int32(i), x)
    np.testing.assert_allclose(
        np.asarray(x), _final_target(sched, x0, eps), atol=2e-3)


def test_inverse_step_v_prediction_round_trip():
    """A v-model algebraically equivalent to a constant-eps model (v derived
    from the actual sample at the consumed alpha) must invert-then-denoise
    back to x0, exactly like the epsilon round trip."""
    cfg = SchedulerConfig(prediction_type="v_prediction")
    rng = np.random.RandomState(13)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    inv = S.make_inversion_schedule(cfg, 16)
    fwd = S.make_schedule(cfg, 16)

    def v_from_eps(x, a):
        a = np.asarray(a, np.float64)
        x0c = (np.asarray(x) - np.sqrt(1.0 - a) * np.asarray(eps)) / np.sqrt(a)
        v = np.sqrt(a) * np.asarray(eps) - np.sqrt(1.0 - a) * x0c
        return jnp.asarray(v, jnp.float32)

    x = x0
    for i in range(inv.num_steps):
        x = S.ddim_inverse_step(inv, v_from_eps(x, inv.alpha_prod_prev[i]),
                                jnp.int32(i), x)
    for i in range(fwd.num_steps):
        x = S.ddim_step(fwd, v_from_eps(x, fwd.alpha_prod[i]),
                        jnp.int32(i), x)
    np.testing.assert_allclose(np.asarray(x), np.asarray(x0), atol=5e-3)


def test_ea_step_v_prediction_matches_epsilon():
    """EA sigma-form v_prediction x0 must agree with the epsilon form on
    the same raw sample (x = x0 + sigma·eps, v in scaled space)."""
    rng = np.random.RandomState(17)
    x0 = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    eps = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    noise = jnp.asarray(rng.randn(1, 4, 8, 8), jnp.float32)
    base = S.make_euler_ancestral_schedule(CFG, 8)
    vsch = S.make_euler_ancestral_schedule(
        SchedulerConfig(prediction_type="v_prediction"), 8)
    for i in range(3):
        sigma = np.asarray(base.sigmas[i], np.float64)
        x = x0 + jnp.float32(sigma) * eps
        v = (np.asarray(eps) - sigma * np.asarray(x0)) / np.sqrt(
            sigma**2 + 1.0)
        out_e = S.ea_step(base, eps, jnp.int32(i), x, noise)
        out_v = S.ea_step(vsch, jnp.asarray(v, jnp.float32),
                          jnp.int32(i), x, noise)
        np.testing.assert_allclose(np.asarray(out_v), np.asarray(out_e),
                                   atol=1e-4)
