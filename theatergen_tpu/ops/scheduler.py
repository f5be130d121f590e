"""DDIM scheduler as pure functions over a static schedule table.

Reference behavior being reproduced (see SURVEY.md §2.1/§2.9):

- SD1.5 betas: ``scaled_linear`` 0.00085 → 0.012 over 1000 train steps,
  ``clip_sample=False``, ``set_alpha_to_one=False``, ``steps_offset=1``
  (reference ``generate.py:68-76``).
- Fast schedule: keep the first ``fast_after_steps`` timesteps, subsample the
  rest by ``fast_rate`` (reference ``utils/schedule.py:4-8``); the reference
  then *dynamically adjusts* the scheduler's step size per step
  (``utils/schedule.py:10-19``).  Here the previous-timestep lookup is simply
  ``timesteps[i+1]`` — exact for any (possibly non-uniform) schedule, so no
  dynamic adjustment is needed and the whole loop stays shape-static for
  ``lax.scan``.
- DDIM inversion timesteps for ``invert()`` (reference
  ``models/pipelines.py:524-588``).

Everything is index-based (position ``i`` in the timestep array), never
value-based, so a denoising loop is ``lax.scan`` over ``i`` with all gathers
static-shaped.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..config import SchedulerConfig


@dataclasses.dataclass(frozen=True)
class DDIMSchedule:
    """Static schedule tables. All arrays are host-precomputed numpy/jnp.

    Attributes:
      timesteps: ``[S]`` int32, descending train-timestep values.
      alphas_cumprod: ``[T]`` float32 cumulative alpha products.
      alpha_prod: ``[S]`` float32, ``alphas_cumprod[timesteps]``.
      alpha_prod_prev: ``[S]`` float32, alpha at the *next* loop position
        (``timesteps[i+1]``), final entry = final_alpha_cumprod.
      init_noise_sigma: scalar latent scaling at t=T (DDIM: 1.0).
    """

    timesteps: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alpha_prod: jnp.ndarray
    alpha_prod_prev: jnp.ndarray
    num_train_timesteps: int
    init_noise_sigma: float = 1.0
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])


def x0_eps_from_pred(
    prediction_type: str,
    a_t: jnp.ndarray,
    model_output: jnp.ndarray,
    sample: jnp.ndarray,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(x0, eps) from the model output under a given parameterization.

    ``epsilon`` is the reference configuration (``generate.py:68-76``);
    ``v_prediction`` (v = sqrt(a)·eps − sqrt(1−a)·x0) covers SD2.x-class
    and zero-SNR checkpoints; ``sample`` predicts x0 directly.  Static
    string dispatch — resolved at trace time.
    """
    sq_a = jnp.sqrt(a_t)
    sq_1a = jnp.sqrt(1.0 - a_t)
    if prediction_type == "epsilon":
        eps = model_output
        x0 = (sample - sq_1a * eps) / sq_a
    elif prediction_type == "v_prediction":
        x0 = sq_a * sample - sq_1a * model_output
        eps = sq_a * model_output + sq_1a * sample
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - sq_a * x0) / sq_1a
    else:
        raise ValueError(f"unknown prediction_type {prediction_type!r}")
    return x0, eps


def betas_for_schedule(cfg: SchedulerConfig) -> np.ndarray:
    if cfg.beta_schedule == "scaled_linear":
        return (
            np.linspace(
                cfg.beta_start**0.5, cfg.beta_end**0.5, cfg.num_train_timesteps,
                dtype=np.float64,
            )
            ** 2
        )
    if cfg.beta_schedule == "linear":
        return np.linspace(
            cfg.beta_start, cfg.beta_end, cfg.num_train_timesteps, dtype=np.float64
        )
    raise ValueError(f"unknown beta schedule {cfg.beta_schedule!r}")


def alphas_cumprod_for(cfg: SchedulerConfig) -> np.ndarray:
    acp = np.cumprod(1.0 - betas_for_schedule(cfg), axis=0)
    if cfg.rescale_zero_terminal_snr:
        # arXiv 2305.08891 alg. 1: shift+scale sqrt(acp) so the terminal
        # step is exactly zero SNR while the first step's value is kept.
        s = np.sqrt(acp)
        s0, sT = s[0], s[-1]
        s = (s - sT) * s0 / (s0 - sT)
        acp = s**2
    return acp


def uniform_timesteps(cfg: SchedulerConfig, num_steps: int) -> np.ndarray:
    """Diffusers-style leading-spaced timesteps with ``steps_offset``."""
    ratio = cfg.num_train_timesteps // num_steps
    ts = (np.arange(num_steps) * ratio).round()[::-1].astype(np.int64)
    ts = ts + cfg.steps_offset
    return np.clip(ts, 0, cfg.num_train_timesteps - 1).astype(np.int32)


def fast_timesteps(
    cfg: SchedulerConfig, num_steps: int, fast_after_steps: int, fast_rate: int
) -> np.ndarray:
    """Subsampled schedule: first ``fast_after_steps`` kept, remainder strided.

    Mirrors ``get_fast_schedule`` (reference ``utils/schedule.py:4-8``).
    """
    ts = uniform_timesteps(cfg, num_steps)
    if fast_after_steps >= len(ts) - 1:
        return ts
    return np.concatenate([ts[:fast_after_steps], ts[fast_after_steps + 1 :: fast_rate]])


def make_schedule(
    cfg: SchedulerConfig,
    num_steps: int,
    *,
    fast_after_steps: Optional[int] = None,
    fast_rate: int = 2,
    timesteps: Optional[np.ndarray] = None,
) -> DDIMSchedule:
    acp = alphas_cumprod_for(cfg).astype(np.float32)
    if timesteps is None:
        if fast_after_steps is not None:
            timesteps = fast_timesteps(cfg, num_steps, fast_after_steps, fast_rate)
        else:
            timesteps = uniform_timesteps(cfg, num_steps)
    timesteps = np.asarray(timesteps, dtype=np.int32)
    final_alpha = np.float32(1.0) if cfg.set_alpha_to_one else acp[0]
    alpha_prod = acp[timesteps]
    alpha_prod_prev = np.concatenate([acp[timesteps[1:]], [final_alpha]])
    return DDIMSchedule(
        timesteps=jnp.asarray(timesteps),
        alphas_cumprod=jnp.asarray(acp),
        alpha_prod=jnp.asarray(alpha_prod),
        alpha_prod_prev=jnp.asarray(alpha_prod_prev),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
    )


def make_inversion_schedule(cfg: SchedulerConfig, num_steps: int) -> DDIMSchedule:
    """Ascending timesteps for DDIM inversion.

    The reference inverts over *all* steps with the inverse scheduler
    (``models/pipelines.py:539-588``, ``get_inverse_timesteps``).  The i-th
    inverse step maps x_{t_prev} → x_t; so ``alpha_prod`` holds the target
    (larger-t) alpha and ``alpha_prod_prev`` the source alpha.
    """
    acp = alphas_cumprod_for(cfg).astype(np.float32)
    ts = uniform_timesteps(cfg, num_steps)[::-1].copy()  # ascending
    # source timestep for position i is the previous (smaller) one; for the
    # first step the source is "clean" (alpha=final_alpha semantics of
    # DDIMInverseScheduler with set_alpha_to_one=False → acp[0]).
    src = np.concatenate([[0], ts[:-1]])
    alpha_src = np.where(np.arange(len(ts)) == 0, acp[0], acp[src])
    return DDIMSchedule(
        timesteps=jnp.asarray(ts),
        alphas_cumprod=jnp.asarray(acp),
        alpha_prod=jnp.asarray(acp[ts]),
        alpha_prod_prev=jnp.asarray(alpha_src.astype(np.float32)),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
    )


def pred_original(
    sched: DDIMSchedule, model_output: jnp.ndarray, i: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """x0 prediction from the model output at loop position ``i``."""
    a_t = sched.alpha_prod[i].astype(sample.dtype)
    return x0_eps_from_pred(sched.prediction_type, a_t, model_output, sample)[0]


def ddim_step(
    sched: DDIMSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    *,
    eta: float = 0.0,
    noise: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """One deterministic DDIM update x_t → x_{t_prev} at loop position ``i``.

    Matches diffusers ``DDIMScheduler.step`` with ``clip_sample=False``
    (the reference's configuration, ``generate.py:68-76``), generalized to
    arbitrary schedules via the precomputed ``alpha_prod_prev`` table and
    to epsilon / v_prediction / sample parameterizations.
    """
    dtype = sample.dtype
    a_t = sched.alpha_prod[i].astype(dtype)
    a_prev = sched.alpha_prod_prev[i].astype(dtype)
    x0, eps = x0_eps_from_pred(sched.prediction_type, a_t, model_output, sample)
    if eta > 0.0:
        var = (1.0 - a_prev) / (1.0 - a_t) * (1.0 - a_t / a_prev)
        sigma = eta * jnp.sqrt(var)
    else:
        sigma = jnp.zeros((), dtype)
    dir_xt = jnp.sqrt(1.0 - a_prev - sigma**2) * eps
    prev = jnp.sqrt(a_prev) * x0 + dir_xt
    if eta > 0.0:
        if noise is None:
            raise ValueError("eta > 0 requires noise")
        prev = prev + sigma * noise
    return prev


def ddim_inverse_step(
    sched: DDIMSchedule, model_output: jnp.ndarray, i: jnp.ndarray, sample: jnp.ndarray
) -> jnp.ndarray:
    """One DDIM inversion update x_{t_src} → x_t (ascending schedule)."""
    dtype = sample.dtype
    a_t = sched.alpha_prod[i].astype(dtype)        # target (larger t)
    a_src = sched.alpha_prod_prev[i].astype(dtype)  # source
    x0, eps = x0_eps_from_pred(sched.prediction_type, a_src, model_output, sample)
    return jnp.sqrt(a_t) * x0 + jnp.sqrt(1.0 - a_t) * eps


def add_noise(
    sched: DDIMSchedule, sample: jnp.ndarray, noise: jnp.ndarray, t: jnp.ndarray
) -> jnp.ndarray:
    """Forward-process noising at train timestep value ``t`` (may be a vector
    broadcast over a leading axis of per-step targets, as in the frozen-latent
    preparation, reference ``models/pipelines.py:617-631``)."""
    acp = sched.alphas_cumprod.astype(sample.dtype)
    a = acp[t]
    a = a.reshape(a.shape + (1,) * (sample.ndim - a.ndim))
    return jnp.sqrt(a) * sample + jnp.sqrt(1.0 - a) * noise


def guidance_step_scale(sched: DDIMSchedule, i: jnp.ndarray) -> jnp.ndarray:
    """Gradient-descent scale for latent guidance at position ``i``.

    The reference scales the energy gradient by ``(1 - alpha_prod_t)**0.5``
    for DDIM (``models/pipelines.py:106-119``); equivalently sigma_t**2 for
    sigma-parameterized schedulers.
    """
    return jnp.sqrt(1.0 - sched.alpha_prod[i])


# ---------------------------------------------------------------------------
# Euler-Ancestral (the reference's SDXL scheduler, generate.py:118-121)
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class EulerAncestralSchedule:
    """Sigma-parameterized ancestral Euler sampler tables.

    ``sigmas`` has S+1 entries (terminal 0 appended); latents are scaled by
    ``init_noise_sigma = sigmas[0]`` at t=T, and model inputs by
    ``1/sqrt(sigma^2+1)`` each step (diffusers
    ``EulerAncestralDiscreteScheduler`` semantics).
    """

    timesteps: jnp.ndarray        # [S] int32 descending
    sigmas: jnp.ndarray           # [S+1] float32
    num_train_timesteps: int
    prediction_type: str = "epsilon"

    @property
    def num_steps(self) -> int:
        return int(self.timesteps.shape[0])

    @property
    def init_noise_sigma(self) -> jnp.ndarray:
        return self.sigmas[0]


def make_euler_ancestral_schedule(cfg: SchedulerConfig,
                                  num_steps: int) -> EulerAncestralSchedule:
    acp = alphas_cumprod_for(cfg).astype(np.float64)
    # zero-SNR rescale drives acp[-1] to exactly 0; leading-spaced timesteps
    # never index it, but keep the table finite.
    all_sigmas = np.sqrt((1.0 - acp) / np.maximum(acp, 1e-24))
    ts = uniform_timesteps(cfg, num_steps)
    sigmas = np.concatenate([all_sigmas[ts], [0.0]]).astype(np.float32)
    return EulerAncestralSchedule(
        timesteps=jnp.asarray(ts),
        sigmas=jnp.asarray(sigmas),
        num_train_timesteps=cfg.num_train_timesteps,
        prediction_type=cfg.prediction_type,
    )


def ea_scale_model_input(sched: EulerAncestralSchedule, sample: jnp.ndarray,
                         i: jnp.ndarray) -> jnp.ndarray:
    sigma = sched.sigmas[i].astype(sample.dtype)
    return sample / jnp.sqrt(sigma**2 + 1.0)


def ea_step(
    sched: EulerAncestralSchedule,
    model_output: jnp.ndarray,
    i: jnp.ndarray,
    sample: jnp.ndarray,
    noise: jnp.ndarray,
) -> jnp.ndarray:
    """One ancestral Euler update.

    ``sample`` is the raw (unscaled) latent, as in diffusers
    ``EulerAncestralDiscreteScheduler.step``; the sigma-form x0 for
    v_prediction is ``x/(σ²+1) − v·σ/sqrt(σ²+1)``.
    """
    dtype = sample.dtype
    s_from = sched.sigmas[i].astype(dtype)
    s_to = sched.sigmas[i + 1].astype(dtype)
    if sched.prediction_type == "epsilon":
        x0 = sample - s_from * model_output
    elif sched.prediction_type == "v_prediction":
        x0 = (sample / (s_from**2 + 1.0)
              - model_output * s_from / jnp.sqrt(s_from**2 + 1.0))
    elif sched.prediction_type == "sample":
        x0 = model_output
    else:
        raise ValueError(
            f"unknown prediction_type {sched.prediction_type!r}")
    var = jnp.maximum(s_from**2 - s_to**2, 0.0)
    s_up = jnp.sqrt(s_to**2 * var / jnp.maximum(s_from**2, 1e-12))
    s_down = jnp.sqrt(jnp.maximum(s_to**2 - s_up**2, 0.0))
    derivative = (sample - x0) / jnp.maximum(s_from, 1e-12)
    out = sample + derivative * (s_down - s_from) + noise * s_up
    return out


# ---------------------------------------------------------------------------
# Sampler facade: one interface over DDIM / EulerAncestral for the pipelines
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class LCMSchedule:
    """Latent Consistency Model sampling tables (LCM / LCM-LoRA,
    arXiv 2310.04378 / 2311.05556 — the standard few-step acceleration for
    the SD1.5 ecosystem; pairs with ``models/lora.py``'s LCM-LoRA merge).

    Guidance-free: CFG is distilled into the weights, so each step is ONE
    UNet eval, and 4-8 steps replace 50 — ~25× fewer UNet evals than
    50-step CFG DDIM.
    """

    timesteps: jnp.ndarray        # [S] int32 descending
    alpha_prod: jnp.ndarray       # [S]
    alpha_prod_prev: jnp.ndarray  # [S] (next loop position)
    num_steps: int
    timestep_scaling: float = 10.0
    sigma_data: float = 0.5
    init_noise_sigma: float = 1.0


def make_lcm_schedule(cfg: SchedulerConfig, num_steps: int,
                      original_inference_steps: int = 50) -> LCMSchedule:
    """diffusers LCMScheduler.set_timesteps: the distillation grid is
    ``arange(1, K+1)·(T/K) − 1`` (K = original_inference_steps); sampling
    picks ``floor(linspace(0, K, num_steps, endpoint=False))`` indices
    into the reversed grid — the stride-based variant truncates the
    low-noise end whenever ``num_steps`` does not divide K."""
    T = cfg.num_train_timesteps
    skipping = T // original_inference_steps
    origin = (np.arange(1, original_inference_steps + 1) * skipping
              - 1)                                    # ascending
    idx = np.floor(np.linspace(0, len(origin), num_steps,
                               endpoint=False)).astype(np.int64)
    ts = origin[::-1][idx].astype(np.int32)
    acp = alphas_cumprod_for(cfg)
    alpha_prod = acp[ts]
    alpha_prev = np.concatenate([acp[ts[1:]], [acp[0]]]).astype(np.float32)
    return LCMSchedule(
        timesteps=jnp.asarray(ts),
        alpha_prod=jnp.asarray(alpha_prod.astype(np.float32)),
        alpha_prod_prev=jnp.asarray(alpha_prev),
        num_steps=len(ts),
    )


def lcm_step(
    sched: LCMSchedule,
    model_output: jnp.ndarray,     # eps prediction
    i: jnp.ndarray,                # loop index
    sample: jnp.ndarray,
    noise: jnp.ndarray,            # fresh per-step noise
) -> jnp.ndarray:
    """One consistency step: x0 from eps, boundary-condition blend, then
    re-noise to the next grid timestep (skipped on the last step)."""
    a_t = sched.alpha_prod[i]
    a_prev = sched.alpha_prod_prev[i]
    x = sample.astype(jnp.float32)
    eps = model_output.astype(jnp.float32)
    x0 = (x - jnp.sqrt(1.0 - a_t) * eps) / jnp.sqrt(a_t)

    scaled_t = sched.timesteps[i].astype(jnp.float32) * sched.timestep_scaling
    c_skip = sched.sigma_data ** 2 / (scaled_t ** 2 + sched.sigma_data ** 2)
    c_out = scaled_t / jnp.sqrt(scaled_t ** 2 + sched.sigma_data ** 2)
    denoised = c_out * x0 + c_skip * x

    renoised = (jnp.sqrt(a_prev) * denoised
                + jnp.sqrt(1.0 - a_prev) * noise.astype(jnp.float32))
    out = jnp.where(i == sched.num_steps - 1, denoised, renoised)
    return out.astype(sample.dtype)


@dataclasses.dataclass(frozen=True)
class Sampler:
    """Scheduler-agnostic stepping interface used by the denoise loops.

    ``kind`` selects the math; both schedules ride along so the object is a
    static pytree jit can close over.  ``rng`` only matters for the
    ancestral sampler (per-step noise via fold_in — no carry needed).
    """

    kind: str                            # "ddim" | "euler_ancestral" | "lcm"
    ddim: Optional[DDIMSchedule] = None
    ea: Optional["EulerAncestralSchedule"] = None
    lcm: Optional[LCMSchedule] = None

    @property
    def num_steps(self) -> int:
        return (self.ddim or self.ea or self.lcm).num_steps

    @property
    def timesteps(self) -> jnp.ndarray:
        return (self.ddim or self.ea or self.lcm).timesteps

    @property
    def init_noise_sigma(self):
        if self.kind == "euler_ancestral":
            return self.ea.init_noise_sigma
        return jnp.float32(1.0)

    def scale_model_input(self, sample, i):
        if self.kind == "euler_ancestral":
            return ea_scale_model_input(self.ea, sample, i)
        return sample

    def step(self, model_output, i, sample, rng=None, noise=None):
        """``noise`` (optional ``[h, w, ...]``-shaped array) overrides the
        per-step ancestral/consistency noise draw — the reference-noise
        injection hook for latent-level golden parity against torch
        schedulers whose RNG streams jax can't reproduce (SURVEY §7 "RNG
        parity"; see ``theatergen_tpu/eval/goldens.py``)."""
        if self.kind in ("euler_ancestral", "lcm"):
            if noise is None:
                assert rng is not None, f"{self.kind} sampler needs rng"
                import jax

                noise = jax.random.normal(
                    jax.random.fold_in(rng, i), sample.shape, jnp.float32
                ).astype(sample.dtype)
            else:
                noise = noise.astype(sample.dtype)
            if self.kind == "lcm":
                return lcm_step(self.lcm, model_output, i, sample, noise)
            return ea_step(self.ea, model_output, i, sample, noise)
        return ddim_step(self.ddim, model_output, i, sample)

    def guidance_step_scale(self, i):
        """Latent-guidance gradient scale: sqrt(1-alpha) for DDIM,
        sigma^2 for sigma-parameterized samplers
        (reference models/pipelines.py:106-119)."""
        if self.kind == "euler_ancestral":
            return self.ea.sigmas[i] ** 2
        if self.kind == "lcm":
            return jnp.sqrt(1.0 - self.lcm.alpha_prod[i])
        return guidance_step_scale(self.ddim, i)


def make_sampler(cfg: SchedulerConfig, num_steps: int, *,
                 kind: str = "ddim",
                 fast_after_steps: Optional[int] = None,
                 fast_rate: int = 2) -> Sampler:
    if kind == "euler_ancestral":
        return Sampler(kind=kind,
                       ea=make_euler_ancestral_schedule(cfg, num_steps))
    if kind == "lcm":
        return Sampler(kind=kind, lcm=make_lcm_schedule(cfg, num_steps))
    return Sampler(kind="ddim", ddim=make_schedule(
        cfg, num_steps, fast_after_steps=fast_after_steps,
        fast_rate=fast_rate))


def cfg_cutoff_steps(num_steps: int,
                     fraction: Optional[float]) -> int:
    """Steps to run with full CFG before switching cond-only.

    ``fraction=None`` (or >=1) ≡ exact CFG for all steps; otherwise
    ``ceil(fraction · num_steps)`` clamped to [1, num_steps] — at least one
    CFG step so guidance always shapes the high-noise start.
    """
    if fraction is None or fraction >= 1.0:
        return num_steps
    return max(1, min(num_steps, int(math.ceil(fraction * num_steps))))
