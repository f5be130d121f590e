"""Core txt2img denoising pipeline: one ``lax.scan`` over DDIM steps.

Equivalent of the reference's plain CFG loop ``generate()``
(``models/pipelines.py:493-521``) and the VAE helpers ``encode``/``decode``
(``:131-173``), plus DDIM inversion (``invert``, ``:524-588``).

TPU-first differences from the reference:
- the step loop is a jitted ``lax.scan``; the per-step latent trajectory is
  the scan's stacked ``ys``, kept on device (the reference appends
  ``.cpu()`` latents every step — ``models/pipelines.py:449-453``);
- classifier-free guidance runs as one batched UNet call over
  ``concat([uncond, cond])``;
- latents are NHWC ``[B, H/8, W/8, 4]``.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import scheduler as sched_ops
from ..ops.scheduler import DDIMSchedule
from .bundle import Bundle


def seeded_latents(rng: jax.Array, batch: int, h: int, w: int,
                   channels: int = 4, dtype=jnp.float32) -> jnp.ndarray:
    """Unit-normal starting noise, ``init_noise_sigma``-scaled (DDIM: 1.0).
    Reference seeding discipline: ``utils/latents.py:138-154``."""
    return jax.random.normal(rng, (batch, h, w, channels), dtype)


def cfg_combine(eps: jnp.ndarray, scale: jnp.ndarray) -> jnp.ndarray:
    """Classifier-free guidance over a [2B, ...] uncond/cond stack."""
    eps_u, eps_c = jnp.split(eps, 2, axis=0)
    return eps_u + scale * (eps_c - eps_u)


def lcm_denoise(
    unet_apply: Callable[..., jnp.ndarray],
    sampler,                           # scheduler.Sampler kind="lcm"
    latents: jnp.ndarray,              # [B, h, w, 4]
    context_cond: jnp.ndarray,         # [B, L, C] — conditional only
    rng: jax.Array,
) -> jnp.ndarray:
    """Guidance-free LCM sampling loop (LCM / LCM-LoRA): one UNet eval per
    step, fresh noise re-injection between consistency steps — 4-8 steps
    replace the 50-step CFG loop once an LCM(-LoRA) checkpoint is merged
    (``models/lora.py``)."""

    def step(lat, i):
        t = sampler.timesteps[i]
        eps = unet_apply(lat, t, context_cond)
        return sampler.step(eps, i, lat, rng=rng), None

    final, _ = jax.lax.scan(step, latents,
                            jnp.arange(sampler.num_steps))
    return final


def denoise(
    unet_apply: Callable[..., jnp.ndarray],
    sched: DDIMSchedule,
    latents: jnp.ndarray,             # [B, h, w, 4]
    context: jnp.ndarray,             # [2B, L, C]  (uncond ++ cond)
    guidance_scale: float,
    *,
    collect_trajectory: bool = False,
    cfg_cutoff_steps: Optional[int] = None,
    deepcache_interval: Optional[int] = None,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Scan the DDIM loop. Returns (final_latents, trajectory or None).

    ``trajectory[s]`` is the latent *entering* step s (so trajectory[0] is
    the initial noise); with the final latents appended it matches the
    reference's ``latents_all`` stack of steps+1 states
    (``models/pipelines.py:375-381,449-453``, ``utils/latents.py:169-218``).

    ``cfg_cutoff_steps``: optional acceleration — run classifier-free
    guidance (2× UNet batch) only for the first N steps, then cond-only
    (guidance has little late-step effect; the temporal-attention-
    decomposition observation, arXiv 2404.02747).  Saves ~half the UNet
    work on the truncated tail.  ``None`` or >= num_steps ≡ exact CFG.

    ``deepcache_interval``: DeepCache (arXiv 2312.00858) — every N-th step
    runs the full UNet and refreshes the deep-feature cache; the steps in
    between run only the shallow blocks against the cached feature (~70%
    FLOPs saved on those steps).  Requires ``unet_apply`` to accept the
    ``deep_cache`` / ``return_deep_cache`` kwargs
    (:class:`..models.unet.UNet2DCondition` does).  ``None``/``1`` ≡ exact.
    """
    use_dc = deepcache_interval is not None and deepcache_interval > 1

    def apply_dc(lat_in, t, ctx, cache, i):
        """One UNet eval under the DeepCache policy (or plain if off)."""
        if not use_dc:
            return unet_apply(lat_in, t, ctx), cache
        return jax.lax.cond(
            i % deepcache_interval == 0,
            lambda c: unet_apply(lat_in, t, ctx, return_deep_cache=True),
            lambda c: (unet_apply(lat_in, t, ctx, deep_cache=c), c),
            cache,
        )

    def cfg_step(carry, i):
        lat, cache = carry
        lat_in = jnp.concatenate([lat, lat], axis=0)
        t = sched.timesteps[i]
        eps, cache = apply_dc(lat_in, t, context, cache, i)
        eps = cfg_combine(eps.astype(jnp.float32), guidance_scale)
        nxt = sched_ops.ddim_step(sched, eps, i, lat)
        return (nxt, cache), (lat if collect_trajectory else None)

    def cond_step(carry, i):
        lat, cache = carry
        t = sched.timesteps[i]
        eps, cache = apply_dc(lat, t, context[context.shape[0] // 2:],
                              cache, i)
        nxt = sched_ops.ddim_step(sched, eps.astype(jnp.float32), i, lat)
        return (nxt, cache), (lat if collect_trajectory else None)

    s_total = sched.num_steps
    cutoff = s_total if cfg_cutoff_steps is None else min(
        int(cfg_cutoff_steps), s_total)
    b = latents.shape[0]
    if use_dc:
        # step 0 is always a full step, so the zeros cache is never read
        cache_sd = jax.eval_shape(
            lambda l: unet_apply(
                jnp.concatenate([l, l], axis=0), sched.timesteps[0],
                context, return_deep_cache=True)[1],
            latents)
        cache = jnp.zeros(cache_sd.shape, cache_sd.dtype)
    else:
        cache = None
    (final, cache), traj = jax.lax.scan(
        cfg_step, (latents, cache), jnp.arange(cutoff))
    if cutoff < s_total:
        if use_dc:
            # cond-only phase: keep the cond rows of the batched cache
            cache = cache[b:]
        (final, _), traj2 = jax.lax.scan(cond_step, (final, cache),
                                         jnp.arange(cutoff, s_total))
        if collect_trajectory:
            traj = jnp.concatenate([traj, traj2], axis=0)
    if collect_trajectory:
        traj = jnp.concatenate([traj, final[None]], axis=0)
    else:
        traj = None
    return final, traj


def encode_image(bundle: Bundle, image: jnp.ndarray,
                 rng: Optional[jax.Array] = None) -> jnp.ndarray:
    """Image [-1,1] NHWC → scaled latent (reference ``encode``,
    ``models/pipelines.py:131-160``: uses the posterior mean when no rng)."""
    mean, logvar = bundle.vae.apply(
        {"params": bundle.vae_params}, image, method="encode"
    )
    z = mean
    if rng is not None:
        z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
            rng, mean.shape, mean.dtype
        )
    return z * bundle.cfg.vae.scaling_factor


def decode_with(vae, vae_params, scaling_factor: float,
                latents: jnp.ndarray) -> jnp.ndarray:
    """Params-explicit scaled-latent → [0,1] image decode — the one
    implementation every pipeline shares (jit-friendly: no bundle capture)."""
    z = latents / scaling_factor
    img = vae.apply({"params": vae_params}, z, method="decode")
    return jnp.clip(img.astype(jnp.float32) / 2 + 0.5, 0.0, 1.0)


def decode_latents(bundle: Bundle, latents: jnp.ndarray) -> jnp.ndarray:
    """Scaled latent → image in [0,1] NHWC (reference ``decode``,
    ``models/pipelines.py:163-173``)."""
    return decode_with(bundle.vae, bundle.vae_params,
                       bundle.cfg.vae.scaling_factor, latents)


def encode_prompts(bundle: Bundle, prompts, negative_prompts=None) -> jnp.ndarray:
    """Tokenize + CLIP-encode → [2B, L, C] uncond++cond context
    (reference ``models/models.py:53-79``)."""
    if isinstance(prompts, str):
        prompts = [prompts]
    if negative_prompts is None:
        negative_prompts = [""] * len(prompts)
    elif isinstance(negative_prompts, str):
        negative_prompts = [negative_prompts] * len(prompts)
    if len(negative_prompts) != len(prompts):
        raise ValueError(
            f"got {len(prompts)} prompts but {len(negative_prompts)} negative"
            " prompts; pass one per prompt or a single string"
        )
    ids = bundle.tokenizer(list(negative_prompts) + list(prompts),
                           max_length=bundle.cfg.text.max_length)
    return bundle.text_embed(jnp.asarray(ids))


class Text2Img:
    """Jit-once txt2img runner.

    >>> pipe = Text2Img(bundle, num_steps=20)
    >>> img = pipe(rng, "a cat")          # [B, H, W, 3] in [0, 1]

    ``sampler="lcm"`` switches to the guidance-free LCM loop (one UNet
    eval per step, 4-8 steps) for LCM(-LoRA)-merged checkpoints
    (``models/lora.py``).
    """

    def __init__(self, bundle: Bundle, num_steps: int = 50,
                 guidance_scale: Optional[float] = None,
                 sampler: str = "ddim"):
        self.bundle = bundle
        cfg = bundle.cfg
        if sampler not in ("ddim", "lcm"):
            raise ValueError(
                f"Text2Img supports sampler 'ddim' or 'lcm', got {sampler!r}"
                " (Euler-Ancestral lives in pipelines/sdxl.py's loop)")
        self.sampler_kind = sampler
        if sampler == "lcm":
            self.sampler = sched_ops.make_sampler(
                cfg.scheduler, num_steps, kind="lcm")
            self.sched = None
        else:
            self.sched = sched_ops.make_schedule(
                cfg.scheduler, num_steps,
                fast_after_steps=cfg.pipeline.fast_after_steps,
                fast_rate=cfg.pipeline.fast_rate,
            )
        self.guidance_scale = (
            cfg.pipeline.guidance_scale if guidance_scale is None else guidance_scale
        )
        # params are explicit jit args — closing over them would bake
        # multi-GB weight constants into the lowered program.
        self._run = jax.jit(self._run_impl)

    def _run_impl(self, unet_params, vae_params, rng, context):
        b = self.bundle
        cfg = b.cfg
        lat = seeded_latents(
            rng, context.shape[0] // 2,
            cfg.pipeline.latent_height, cfg.pipeline.latent_width,
        )

        def unet_apply(x, t, ctx, **kw):
            return b.unet.apply(
                {"params": unet_params}, x,
                jnp.broadcast_to(t[None], (x.shape[0],)), ctx, **kw,
            )

        if self.sampler_kind == "lcm":
            cond = context[context.shape[0] // 2:]
            final = lcm_denoise(unet_apply, self.sampler, lat, cond,
                                jax.random.fold_in(rng, 1))
        else:
            final, _ = denoise(unet_apply, self.sched, lat, context,
                               self.guidance_scale,
                               deepcache_interval=cfg.pipeline.deepcache_interval)
        return decode_with(b.vae, vae_params, cfg.vae.scaling_factor, final)

    def __call__(self, rng: jax.Array, prompt, negative_prompt=None):
        context = encode_prompts(self.bundle, prompt, negative_prompt)
        return self._run(self.bundle.unet_params, self.bundle.vae_params,
                         rng, context)


def invert(
    bundle: Bundle,
    image_latents: jnp.ndarray,
    context: jnp.ndarray,
    num_steps: int,
    guidance_scale: float = 1.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """DDIM inversion: clean latents → per-step inverted trajectory.

    Returns (noised_latents, trajectory [S+1, ...]); equivalent of the
    reference's ``invert`` which collects latents at every inverse step
    (``models/pipelines.py:524-563``).
    """
    sched = sched_ops.make_inversion_schedule(bundle.cfg.scheduler, num_steps)

    def unet_apply(x, t, ctx):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), ctx,
        )

    def step(lat, i):
        lat_in = jnp.concatenate([lat, lat], axis=0)
        eps = unet_apply(lat_in, sched.timesteps[i], context)
        eps = cfg_combine(eps.astype(jnp.float32), guidance_scale)
        nxt = sched_ops.ddim_inverse_step(sched, eps, i, lat)
        return nxt, lat

    final, traj = jax.lax.scan(step, image_latents, jnp.arange(sched.num_steps))
    traj = jnp.concatenate([traj, final[None]], axis=0)
    return final, traj
