"""Final composed-scene pass: ControlNet + IP embeds + frozen-latent
replacement.

Equivalent of the reference's ``final_image_generation``
(``models/pipelines.py:592-857``), SD1.5 branch:

- start from the composed trajectory's t=T slot (``latents = latents_all[0]``,
  ``:602``);
- each step: ControlNet forward on the collage lineart (text-only context —
  the reference's ``CNAttnProcessor`` drops IP tokens,
  ``ip_adapter/attention_processor.py:861-925``) → residuals into the
  IP-equipped UNet (``:770-816``), CFG, DDIM step;
- for ``index < frozen_steps``: replace the masked region with the composed
  trajectory ``latents_all[index+1]`` (``:833-834``) — here a
  ``jnp.where`` on the step index inside the scan;
- optional latent guidance on the overall layout (the dormant reference
  feature, §3.3) with per-character attention transfer.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..ops import scheduler as sched_ops
from . import sd
from .bundle import Bundle
from .guidance import GuidanceInputs, guidance_update, make_energy_fn


def make_final_pipeline(
    bundle: Bundle,
    num_steps: int,
    *,
    use_ip: bool = True,
    use_controlnet: bool = True,
    guided: bool = False,
    guidance_scale: Optional[float] = None,
    controlnet_scale: float = 1.0,
    control_guidance_start: float = 0.0,
    control_guidance_end: float = 1.0,
    cfg_cutoff_fraction: Optional[float] = None,
    deepcache_interval: Optional[int] = None,
    controlnet_interval: Optional[int] = None,
):
    """Build the jitted final-pass runner.

    ``controlnet_interval``: run the ControlNet forward only every N-th
    step and reuse the last residuals in between (the structure signal is
    a fixed image; its residuals vary smoothly with t — same premise as
    DeepCache). The ``controlnet_keep`` window factor is applied per step
    outside the cache, so the start/end gating stays exact.

    ``cfg_cutoff_fraction``: run CFG (2× UNet *and* ControlNet batch) only
    for the first ``ceil(frac·steps)`` steps, then cond-only (see
    :func:`..pipelines.character.make_character_pipeline`).

    ``deepcache_interval``: DeepCache on the UNet (full forward every N-th
    step, shallow + cached deep feature between). ControlNet still runs
    every step — its shallow residuals feed the fresh skip connections;
    only its deep residuals go unused on cached steps.

    Returns ``run(params, latents_all, frozen_mask, frozen_steps, context,
    cn_context, cond_image, ip_scale, gin) -> (final_latents, trajectory)``
    where ``params = (unet_params, controlnet_params)``.

    ``frozen_steps`` is a traced int32 so the frozen ratio can change
    without recompiling (reference computes it per turn,
    ``theatergen.py:336-337``).
    """
    cfg = bundle.cfg
    gcfg = cfg.guidance
    unet = bundle.unet_ip if use_ip else bundle.unet
    sched = sched_ops.make_sampler(
        cfg.scheduler, num_steps, kind=cfg.pipeline.scheduler_type,
        fast_after_steps=cfg.pipeline.fast_after_steps,
        fast_rate=cfg.pipeline.fast_rate)
    gs = cfg.pipeline.guidance_scale if guidance_scale is None else guidance_scale
    text_len = cfg.text.max_length
    # LCM(-LoRA): CFG is distilled into the weights — cond-only every step
    is_lcm = cfg.pipeline.scheduler_type == "lcm"

    use_dc = deepcache_interval is not None and deepcache_interval > 1
    use_cnc = (use_controlnet and controlnet_interval is not None
               and controlnet_interval > 1)

    def run(unet_params, controlnet_params, latents_all, frozen_mask,
            frozen_steps, context, cn_context, cond_image, ip_scale,
            gin: Optional[GuidanceInputs] = None, rng=None,
            extra_cond: Optional[dict] = None,
            adapter_feats: Optional[tuple] = None):
        fm = jnp.clip(frozen_mask, 0.0, 1.0)[None, :, :, None]  # [1,h,w,1]

        def unet_apply(x, t, ctx, down_res=None, mid_res=None, capture=False,
                       **kw):
            kwargs = dict(ip_scale=ip_scale) if use_ip else {}
            kwargs.update(kw)
            if extra_cond:
                # SDXL micro-conditioning; cond-only passes (guidance) use a
                # batch-1 input — take the trailing (cond) rows
                kwargs.update({k: v[-x.shape[0]:] for k, v in
                               extra_cond.items()})
            if adapter_feats is not None:
                reps = x.shape[0] // adapter_feats[0].shape[0]
                kwargs["level_residuals"] = tuple(
                    jnp.concatenate([f] * reps, axis=0) if reps > 1 else f
                    for f in adapter_feats)
            if down_res is not None:
                kwargs.update(down_residuals=down_res, mid_residual=mid_res)
            if capture:
                return unet.apply(
                    {"params": unet_params}, x,
                    jnp.broadcast_to(t[None], (x.shape[0],)), ctx,
                    capture_keys=gcfg.attn_keys, mutable=["attn"], **kwargs,
                )
            return unet.apply(
                {"params": unet_params}, x,
                jnp.broadcast_to(t[None], (x.shape[0],)), ctx, **kwargs,
            )

        if guided:
            cond_context = context[1:2]
            energy = make_energy_fn(
                lambda lat, t, ctx: unet_apply(lat, t, ctx, capture=True)[1]["attn"],
                gcfg, text_len,
                latent_hw=(cfg.pipeline.latent_height,
                           cfg.pipeline.latent_width),
            )

        cond_pair = jnp.concatenate([cond_image[None]] * 2, axis=0)

        def cn_forward(lat_in, t, cn_ctx, cond):
            return bundle.controlnet.apply(
                {"params": controlnet_params}, lat_in,
                jnp.broadcast_to(t[None], (lat_in.shape[0],)),
                cn_ctx, cond, controlnet_scale,
            )

        def make_step(cfg_on: bool):
            def step(carry, i):
                lat, gloss, cache, cn_cache = carry
                if guided:
                    lat, gloss = jax.lax.cond(
                        i < gcfg.guidance_steps,
                        lambda l, gl: guidance_update(
                            energy, sched, gcfg, l, i, cond_context, gin,
                            prev_loss=gl,
                        ),
                        lambda l, gl: (l, gl),
                        lat, gloss,
                    )
                t = sched.timesteps[i]
                scaled = sched.scale_model_input(lat, i)
                if cfg_on:
                    lat_in = jnp.concatenate([scaled, scaled], axis=0)
                    ctx, cn_ctx, cond = context, cn_context, cond_pair
                else:
                    lat_in, ctx = scaled, context[1:2]
                    cn_ctx, cond = cn_context[1:2], cond_image[None]
                cn_cache_out = cn_cache
                if use_controlnet:
                    # controlnet_keep window (reference models/pipelines.py:
                    # 725-731): conditioning active only inside
                    # [control_guidance_start, control_guidance_end]
                    frac = i.astype(jnp.float32) / max(sched.num_steps - 1, 1)
                    keep = jnp.logical_and(
                        frac >= control_guidance_start,
                        frac <= control_guidance_end).astype(jnp.float32)
                    if use_cnc:
                        down_res, mid_res = jax.lax.cond(
                            i % controlnet_interval == 0,
                            lambda c: cn_forward(lat_in, t, cn_ctx, cond),
                            lambda c: c,
                            cn_cache,
                        )
                        cn_cache_out = (down_res, mid_res)
                    else:
                        down_res, mid_res = cn_forward(lat_in, t, cn_ctx,
                                                       cond)
                    down_res = tuple(r * keep for r in down_res)
                    mid_res = mid_res * keep
                else:
                    down_res = mid_res = None
                if use_dc:
                    eps, cache_out = jax.lax.cond(
                        i % deepcache_interval == 0,
                        lambda c: unet_apply(lat_in, t, ctx, down_res,
                                             mid_res, return_deep_cache=True),
                        lambda c: (unet_apply(lat_in, t, ctx, down_res,
                                              mid_res, deep_cache=c), c),
                        cache,
                    )
                else:
                    eps, cache_out = unet_apply(lat_in, t, ctx, down_res,
                                                mid_res), cache
                if cfg_on:
                    eps = sd.cfg_combine(eps.astype(jnp.float32), gs)
                nxt = sched.step(eps.astype(jnp.float32), i, lat, rng)
                nxt = jnp.where(
                    i < frozen_steps,
                    latents_all[i + 1] * fm + nxt * (1.0 - fm),
                    nxt,
                )
                return (nxt, gloss, cache_out, cn_cache_out), lat
            return step

        cutoff = (0 if is_lcm else
                  sched_ops.cfg_cutoff_steps(sched.num_steps,
                                             cfg_cutoff_fraction))

        cache0 = None
        if use_dc:
            # zeros placeholder, never read: step 0 is always a full step
            cache_sd = jax.eval_shape(
                lambda l: unet_apply(
                    jnp.concatenate([l, l], axis=0), sched.timesteps[0],
                    context, return_deep_cache=True)[1],
                latents_all[0])
            cache0 = jnp.zeros(cache_sd.shape, cache_sd.dtype)
        cn_cache0 = None
        if use_cnc:
            # zeros placeholder for step 0 (always a compute step)
            lat0 = latents_all[0]
            lat0_in = (jnp.concatenate([lat0, lat0], axis=0)
                       if cutoff > 0 else lat0)
            cn_sd = jax.eval_shape(
                cn_forward, lat0_in, sched.timesteps[0],
                cn_context if cutoff > 0 else cn_context[1:2],
                cond_pair if cutoff > 0 else cond_image[None])
            cn_cache0 = jax.tree.map(
                lambda s: jnp.zeros(s.shape, s.dtype), cn_sd)

        b = latents_all.shape[1]
        carry = (latents_all[0], jnp.float32(jnp.inf), cache0, cn_cache0)
        traj = None
        if cutoff > 0:      # don't trace the 2×-batch CFG body when dead
            carry, traj = jax.lax.scan(make_step(True), carry,
                                       jnp.arange(cutoff))
        if cutoff < sched.num_steps:
            # cond-only phase: keep the cond rows of the batched caches
            lat_c, gloss_c, cache_c, cnc_c = carry
            if use_dc:
                cache_c = cache_c[b:]
            if use_cnc and cutoff > 0:
                cnc_c = jax.tree.map(lambda r: r[b:], cnc_c)
            carry = (lat_c, gloss_c, cache_c, cnc_c)
            carry, traj2 = jax.lax.scan(
                make_step(False), carry, jnp.arange(cutoff, sched.num_steps))
            traj = (traj2 if traj is None
                    else jnp.concatenate([traj, traj2], axis=0))
        final = carry[0]
        trajectory = jnp.concatenate([traj, final[None]], axis=0)
        return final, trajectory

    return jax.jit(run), sched
