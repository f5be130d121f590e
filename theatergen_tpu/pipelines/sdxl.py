"""SDXL pipeline: dual text encoders, micro-conditioning, Euler-Ancestral
loop, T2I-Adapter structure conditioning.

Equivalent of the reference's XL branch (``generate.py:103-133``: SDXL base
+ ``StableDiffusionXLAdapterPipeline`` + EulerAncestral + IPAdapterXL; the
final-pass XL leg at ``models/pipelines.py:635-696,745-797``).  The
reference splits this across three GPUs by model placement; here everything
is one jitted program on one chip (or pjit-sharded).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import scheduler as sched_ops
from . import sd
from .bundle import Bundle


def encode_prompts_xl(
    bundle: Bundle, prompts, negative_prompts=None
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Tokenize with one tokenizer, encode with both towers, concat the
    penultimate hidden states (768 + 1280 → 2048) and take encoder-2's
    projected pooled output — diffusers SDXL ``encode_prompt`` semantics.

    Returns (context [2B, L, 2048], pooled [2B, pooled_dim]).
    """
    assert bundle.text2 is not None, "SDXL bundle needs text2"
    if isinstance(prompts, str):
        prompts = [prompts]
    if negative_prompts is None:
        negative_prompts = [""] * len(prompts)
    elif isinstance(negative_prompts, str):
        negative_prompts = [negative_prompts] * len(prompts)
    if len(negative_prompts) != len(prompts):
        raise ValueError("one negative prompt per prompt")
    texts = list(negative_prompts) + list(prompts)
    L = bundle.cfg.text.max_length
    ids = jnp.asarray(bundle.tokenizer(texts, max_length=L))
    # tower 2 (OpenCLIP bigG) pads with token 0, not the eos the first
    # tokenizer uses — the padded context rows feed every cross-attention
    ids2 = jnp.asarray(bundle.tokenizer(texts, max_length=L,
                                        pad_token_id=0))
    enc = bundle.jitted(
        f"encode_xl_{id(bundle.text)}_{id(bundle.text2)}",
        lambda p1, p2, i1, i2: _dual_tower_fwd(bundle, p1, p2, i1, i2))
    return enc(bundle.text_params, bundle.text2_params, ids, ids2)


def _dual_tower_fwd(bundle, p1, p2, ids, ids2):
    _, _, pen1 = bundle.text.apply(
        {"params": p1}, ids, return_penultimate=True)
    _, pooled2, pen2 = bundle.text2.apply(
        {"params": p2}, ids2, return_penultimate=True)
    context = jnp.concatenate([pen1, pen2], axis=-1)
    return context, pooled2


def default_time_ids(height: int, width: int, batch: int) -> jnp.ndarray:
    """(orig_h, orig_w, crop_top, crop_left, target_h, target_w) — the SDXL
    micro-conditioning vector, default: full-frame."""
    ids = jnp.asarray([[height, width, 0, 0, height, width]], jnp.float32)
    return jnp.broadcast_to(ids, (batch, 6))


def denoise_xl(
    unet_apply,
    sched: sched_ops.EulerAncestralSchedule,
    rng: jax.Array,
    latents: jnp.ndarray,
    context: jnp.ndarray,            # [2B, L, C]
    pooled: jnp.ndarray,             # [2B, D]
    time_ids: jnp.ndarray,           # [2B, 6]
    guidance_scale: float,
    *,
    collect_trajectory: bool = False,
):
    """Euler-Ancestral CFG loop (ancestral noise from ``rng`` per step)."""

    def step(carry, i):
        lat, key = carry
        key, nkey = jax.random.split(key)
        scaled = sched_ops.ea_scale_model_input(sched, lat, i)
        lat_in = jnp.concatenate([scaled, scaled], axis=0)
        eps = unet_apply(lat_in, sched.timesteps[i], context, pooled, time_ids)
        eps = sd.cfg_combine(eps.astype(jnp.float32), guidance_scale)
        noise = jax.random.normal(nkey, lat.shape, jnp.float32)
        nxt = sched_ops.ea_step(sched, eps, i, lat, noise)
        return (nxt, key), (lat if collect_trajectory else None)

    (final, _), traj = jax.lax.scan(
        step, (latents, rng), jnp.arange(sched.num_steps))
    if collect_trajectory:
        traj = jnp.concatenate([traj, final[None]], axis=0)
    return final, traj


class Text2ImgXL:
    """SDXL txt2img with optional T2I-Adapter conditioning.

    ``denoising_end`` truncates the sampling loop at a fraction of the
    schedule (the reference's ``StableDiffusionXLCustomPipeline``
    denoising-window support, ``ip_adapter/custom_pipelines.py:17-398``) —
    used for base/refiner-style splits.
    """

    def __init__(self, bundle: Bundle, num_steps: int = 30,
                 guidance_scale: Optional[float] = None,
                 denoising_end: Optional[float] = None):
        self.bundle = bundle
        cfg = bundle.cfg
        if denoising_end is not None:
            num_steps_run = max(1, int(round(num_steps * denoising_end)))
        else:
            num_steps_run = num_steps
        # "lcm": guidance-free few-step consistency sampling for
        # LCM-LoRA-XL-merged weights (models/lora.py merges
        # latent-consistency/lcm-lora-sdxl through the same port
        # mapping) — the SDXL serving route past the CFG structural
        # ceiling, mirroring sd.Text2Img's LCM leg.
        self.is_lcm = cfg.pipeline.scheduler_type == "lcm"
        if self.is_lcm:
            if denoising_end is not None:
                raise ValueError("denoising_end is a base/refiner split "
                                 "of the CFG schedule; not defined for "
                                 "the LCM sampler")
            self.sched = sched_ops.make_sampler(cfg.scheduler, num_steps,
                                                kind="lcm")
        else:
            full = sched_ops.make_euler_ancestral_schedule(
                cfg.scheduler, num_steps)
            import dataclasses as _dc

            self.sched = _dc.replace(
                full,
                timesteps=full.timesteps[:num_steps_run],
                sigmas=full.sigmas[: num_steps_run + 1],
            )
        self.gs = (cfg.pipeline.guidance_scale if guidance_scale is None
                   else guidance_scale)
        self._run = jax.jit(self._run_impl)

    def _run_impl(self, unet_params, vae_params, rng, context, pooled,
                  adapter_feats):
        b = self.bundle
        cfg = b.cfg
        batch = context.shape[0] // 2
        lat_rng, anc_rng = jax.random.split(rng)
        lat = sd.seeded_latents(
            lat_rng, batch, cfg.pipeline.latent_height,
            cfg.pipeline.latent_width,
        ) * self.sched.init_noise_sigma
        time_ids = default_time_ids(cfg.pipeline.height, cfg.pipeline.width,
                                    context.shape[0])

        def unet_apply(x, t, ctx, pool, tids):
            kwargs = {}
            if adapter_feats is not None:
                reps = x.shape[0] // adapter_feats[0].shape[0]
                kwargs["level_residuals"] = tuple(
                    jnp.concatenate([f] * reps, axis=0) if reps > 1 else f
                    for f in adapter_feats)
            return b.unet.apply(
                {"params": unet_params}, x,
                jnp.broadcast_to(t[None], (x.shape[0],)), ctx,
                pooled_text=pool, time_ids=tids, **kwargs)

        if self.is_lcm:
            # CFG is distilled into LCM(-LoRA) weights: cond rows only,
            # one UNet eval per step (sd.lcm_denoise semantics)
            pooled_c, tids_c = pooled[batch:], time_ids[batch:]
            final = sd.lcm_denoise(
                lambda x, t, c: unet_apply(x, t, c, pooled_c, tids_c),
                self.sched, lat, context[batch:], anc_rng)
        else:
            final, _ = denoise_xl(unet_apply, self.sched, anc_rng, lat,
                                  context, pooled, time_ids, self.gs)
        img = sd.decode_with(b.vae, vae_params, cfg.vae.scaling_factor, final)
        return img, final

    def __call__(self, rng, prompt, negative_prompt=None, hint=None,
                 output_type: str = "image"):
        """``output_type="latent"`` returns (image, latents) — the noisy
        intermediate latent a refiner stage consumes when ``denoising_end``
        truncates the schedule."""
        b = self.bundle
        context, pooled = encode_prompts_xl(b, prompt, negative_prompt)
        feats = None
        if hint is not None and b.t2i_adapter is not None:
            t2i_fn = b.jitted(
                f"t2i_adapter_{id(b.t2i_adapter)}",
                lambda tp, x: b.t2i_adapter.apply({"params": tp}, x))
            feats = t2i_fn(b.t2i_adapter_params, hint[None])
        img, latents = self._run(b.unet_params, b.vae_params, rng, context,
                                 pooled, feats)
        if output_type == "latent":
            return img, latents
        return img
