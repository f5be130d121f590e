"""Per-character generation: IP-conditioned DDIM with optional latent
guidance and reference-attention capture.

Equivalent of the reference's ``generate_semantic_guidance``
(``models/pipelines.py:175-490``) — the per-character denoise that:
- conditions on an IP-Adapter image prompt from the character database
  (scale 0.4 on DB hit, 0.0 on miss — ``:183-199``; here ``ip_scale`` is a
  traced scalar so one compiled program serves both);
- runs the latent-guidance energy step (the reference's dormant
  ``latent_backward_guidance``, §3.3 — a required feature here);
- stacks the full per-step latent trajectory on device (the reference
  offloads to CPU every step, ``:449-453``);
- captures the guidance-key cross-attention maps of the character's word
  token each step, for the attention-transfer loss in the final pass
  (``utils/guidance.py:150-242``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops import scheduler as sched_ops
from . import sd
from .bundle import Bundle
from .guidance import GuidanceInputs, guidance_update, make_energy_fn


@dataclasses.dataclass
class CharacterResult:
    latents: jnp.ndarray                 # [1, h, w, 4] final
    trajectory: jnp.ndarray              # [S+1, 1, h, w, 4]
    ref_attn: Optional[Tuple[jnp.ndarray, ...]]  # per key [S, heads, HW]


jax.tree_util.register_dataclass(
    CharacterResult, data_fields=["latents", "trajectory", "ref_attn"],
    meta_fields=[],
)


def uncond_ip_features(bundle: Bundle) -> Optional[jnp.ndarray]:
    """Features for the unconditional IP branch: the base variant projects
    zero *embeddings* (``ip_adapter/ip_adapter.py:149-151``), but the plus/
    full variants run the vision encoder on a BLACK image and use those
    (non-zero) features (``:313-317``)."""
    if getattr(bundle, "ip_variant", "base") == "base" or bundle.vision is None:
        return None
    size = bundle.cfg.vision.image_size
    return encode_ip_image(bundle, jnp.zeros((1, size, size, 3)))


def ip_context(
    bundle: Bundle,
    text_context: jnp.ndarray,          # [2, 77, C] uncond ++ cond
    image_embeds: jnp.ndarray,          # [1, D] embeds or [1, N, D] tokens
    uncond_features: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Append IP tokens to the text context: cond row gets the projected
    image tokens, uncond row the projection of zeros (base) or of the
    black-image features (plus/full — pass ``uncond_features``)
    (reference ``IPAdapter.get_image_embeds`` + concat,
    ``ip_adapter/ip_adapter.py:142-153``, ``models/pipelines.py:246-247``)."""
    proj_fn = bundle.jitted(
        f"image_proj_{id(bundle.image_proj)}",
        lambda p, e: bundle.image_proj.apply({"params": p}, e))
    proj = lambda e: proj_fn(bundle.image_proj_params, e)
    cond_tokens = proj(image_embeds)
    if uncond_features is None:
        uncond_features = jnp.zeros_like(image_embeds)
    uncond_tokens = proj(uncond_features)
    ip_tokens = jnp.concatenate([uncond_tokens, cond_tokens], axis=0)
    return jnp.concatenate([text_context, ip_tokens.astype(text_context.dtype)],
                           axis=1)


def encode_ip_image(bundle: Bundle, image: jnp.ndarray) -> jnp.ndarray:
    """RGB [0,1] NHWC → CLIP features for the IP projector.

    "base"/"full" variants use the projected CLS embedding
    (``ip_adapter/ip_adapter.py:147-152``); "plus" uses the penultimate
    patch tokens fed to the Resampler (``:284-299``)."""
    size = bundle.cfg.vision.image_size
    want_patches = getattr(bundle, "ip_variant", "base") == "plus"

    def fwd(p, img):
        # CLIP normalization
        mean = jnp.array([0.48145466, 0.4578275, 0.40821073])
        std = jnp.array([0.26862954, 0.26130258, 0.27577711])
        img = jax.image.resize(img, (img.shape[0], size, size, 3),
                               "bilinear")
        img = (img - mean) / std
        embeds, _, patch_tokens = bundle.vision.apply({"params": p}, img)
        return patch_tokens if want_patches else embeds

    key = f"encode_ip_image_{id(bundle.vision)}_{want_patches}_{size}"
    return bundle.jitted(key, fwd)(bundle.vision_params, image)


def make_character_pipeline(
    bundle: Bundle,
    num_steps: int,
    *,
    use_ip: bool = True,
    guided: bool = False,
    capture_ref_attn: bool = False,
    guidance_scale: Optional[float] = None,
    cfg_cutoff_fraction: Optional[float] = None,
    deepcache_interval: Optional[int] = None,
):
    """Build the jitted per-character runner.

    Returns ``run(unet_params, input_latents, context, ip_scale, gin)
    -> CharacterResult`` (pass ``gin=None`` when ``guided=False``).
    Params are explicit args (never closed over — multi-GB constants).

    ``cfg_cutoff_fraction``: run classifier-free guidance (2× UNet batch)
    only for the first ``ceil(frac·steps)`` steps, then cond-only — CFG has
    little late-step effect (arXiv 2404.02747), so the tail costs half.
    ``None`` / ``1.0`` ≡ exact CFG. Latent guidance and attention capture
    stay live in both phases.

    ``deepcache_interval``: DeepCache (arXiv 2312.00858) — full UNet every
    N-th step, shallow blocks + cached deep feature in between. Ref-attn
    maps on cached steps reuse the last full step's maps (the captured
    layers live in the skipped deep blocks; attention is temporally smooth
    — the premise DeepCache itself rests on). The latent-guidance energy
    loop always runs the full UNet, so guidance stays exact.
    """
    cfg = bundle.cfg
    gcfg = cfg.guidance
    unet = bundle.unet_ip if use_ip else bundle.unet
    sched = sched_ops.make_sampler(
        cfg.scheduler, num_steps, kind=cfg.pipeline.scheduler_type,
        fast_after_steps=cfg.pipeline.fast_after_steps,
        fast_rate=cfg.pipeline.fast_rate,
    )
    gs = cfg.pipeline.guidance_scale if guidance_scale is None else guidance_scale
    text_len = cfg.text.max_length
    # LCM(-LoRA) checkpoints distill CFG into the weights: every step is
    # cond-only (one UNet eval), so the whole run is the "cutoff" phase
    is_lcm = cfg.pipeline.scheduler_type == "lcm"

    use_dc = deepcache_interval is not None and deepcache_interval > 1

    def run(unet_params, input_latents, context, ip_scale,
            gin: Optional[GuidanceInputs] = None, rng=None,
            extra_cond: Optional[dict] = None) -> CharacterResult:
        def unet_apply(x, t, ctx, capture=False, **kw):
            kwargs = dict(ip_scale=ip_scale) if use_ip else {}
            kwargs.update(kw)
            if extra_cond:
                # SDXL micro-conditioning; cond-only passes (guidance) use a
                # batch-1 input — take the trailing (cond) rows
                kwargs.update({k: v[-x.shape[0]:] for k, v in
                               extra_cond.items()})
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

        from ..ops import guidance as guidance_ops

        def compute_ref(state, cond_idx):
            maps = guidance_ops.attn_collection_to_maps(
                state["attn"], gcfg.attn_keys, cond_batch_index=cond_idx,
                text_len=text_len,
            )
            word = gin.word_token[0] if gin is not None else 0
            return tuple(m[:, :, word] for m in maps)  # [heads, HW] each

        if guided:
            cond_context = context[1:2]
            energy = make_energy_fn(
                lambda lat, t, ctx: unet_apply(lat, t, ctx, capture=True)[1]["attn"],
                gcfg, text_len,
                latent_hw=(cfg.pipeline.latent_height,
                           cfg.pipeline.latent_width),
            )

        def make_step(cfg_on: bool):
            def step(carry, i):
                lat, gloss, cache, ref_prev = carry
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
                scaled = sched.scale_model_input(lat, i)
                if cfg_on:
                    lat_in = jnp.concatenate([scaled, scaled], axis=0)
                    ctx, cond_idx = context, 1
                else:
                    lat_in, ctx, cond_idx = scaled, context[1:2], 0
                t = sched.timesteps[i]

                def forward_full(cache, ref_prev):
                    if capture_ref_attn:
                        out, state = unet_apply(
                            lat_in, t, ctx, capture=True,
                            return_deep_cache=use_dc)
                        eps, cache = out if use_dc else (out, cache)
                        return eps, cache, compute_ref(state, cond_idx)
                    if use_dc:
                        eps, cache = unet_apply(lat_in, t, ctx,
                                                return_deep_cache=True)
                        return eps, cache, ref_prev
                    return unet_apply(lat_in, t, ctx), cache, ref_prev

                if use_dc:
                    eps, cache, ref = jax.lax.cond(
                        i % deepcache_interval == 0,
                        forward_full,
                        lambda c, r: (unet_apply(lat_in, t, ctx,
                                                 deep_cache=c), c, r),
                        cache, ref_prev,
                    )
                else:
                    eps, cache, ref = forward_full(cache, ref_prev)
                if cfg_on:
                    eps = sd.cfg_combine(eps.astype(jnp.float32), gs)
                nxt = sched.step(eps.astype(jnp.float32), i, lat, rng)
                return (nxt, gloss, cache, ref), (lat, ref)
            return step

        # zeros placeholders, never read: step 0 is always a full step
        cache0 = None
        if use_dc:
            cache_sd = jax.eval_shape(
                lambda l: unet_apply(
                    jnp.concatenate([l, l], axis=0), sched.timesteps[0],
                    context, return_deep_cache=True)[1],
                input_latents)
            cache0 = jnp.zeros(cache_sd.shape, cache_sd.dtype)
        ref0 = None
        if capture_ref_attn:
            ref_sd = jax.eval_shape(
                lambda l: compute_ref(unet_apply(
                    jnp.concatenate([l, l], axis=0), sched.timesteps[0],
                    context, capture=True)[1], 1),
                input_latents)
            ref0 = jax.tree.map(lambda s: jnp.zeros(s.shape, s.dtype),
                                ref_sd)

        cutoff = (0 if is_lcm else
                  sched_ops.cfg_cutoff_steps(sched.num_steps,
                                             cfg_cutoff_fraction))
        b = input_latents.shape[0]
        carry = (input_latents, jnp.float32(jnp.inf), cache0, ref0)
        traj = refs = None
        if cutoff > 0:      # don't trace the 2×-batch CFG body when dead
            carry, (traj, refs) = jax.lax.scan(
                make_step(True), carry, jnp.arange(cutoff))
        if cutoff < sched.num_steps:
            if use_dc:
                # cond-only phase: keep the cond rows of the batched cache
                lat_c, gloss_c, cache_c, ref_c = carry
                carry = (lat_c, gloss_c, cache_c[b:], ref_c)
            carry, (traj2, refs2) = jax.lax.scan(
                make_step(False), carry,
                jnp.arange(cutoff, sched.num_steps))
            traj = (traj2 if traj is None
                    else jnp.concatenate([traj, traj2], axis=0))
            if refs2 is not None:
                refs = refs2 if refs is None else jax.tree.map(
                    lambda a, b: jnp.concatenate([a, b], axis=0),
                    refs, refs2)
        final = carry[0]
        trajectory = jnp.concatenate([traj, final[None]], axis=0)
        return CharacterResult(final, trajectory, refs)

    return jax.jit(run), sched
