"""Latent guidance: energy descent on the DDIM latents via ``jax.grad``.

TPU-native replacement for the reference's torch-autograd guidance step
(``latent_backward_guidance``, ``models/pipelines.py:62-128``): at selected
steps, run a cond-only UNet forward with attention capture at the guidance
keys, evaluate :func:`..ops.guidance.compute_ca_loss`, differentiate w.r.t.
the latents, and descend scaled by ``sqrt(1 - alpha_prod_t)``
(``models/pipelines.py:106-119``).  The iterate-until-threshold loop is a
``lax.while_loop`` with the reference's per-step ``max_iter`` schedule
(``theatergen.py:296,300``).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..config import GuidanceConfig
from ..ops import guidance as guidance_ops
from ..ops import scheduler as sched_ops


@dataclasses.dataclass(frozen=True)
class GuidanceInputs:
    """Static-shape guidance problem for one generation run.

    Padded to ``max_objects`` (``obj_valid`` masks the padding) — SURVEY.md
    §7 "variable object counts under jit".
    """

    boxes: jnp.ndarray          # [K, 4]
    token_pos: jnp.ndarray      # [K, P]
    token_valid: jnp.ndarray    # [K, P]
    obj_valid: jnp.ndarray      # [K]
    word_token: jnp.ndarray     # [K]
    # optional per-key reference maps for the attention-transfer loss:
    # [K, heads, HW] (step-aggregated) or [S, K, heads, HW] (per-step —
    # the reference matches the saved attention at the SAME timestep,
    # utils/guidance.py:220-233; guidance_update slices the step axis)
    ref_attn_maps: Optional[Tuple[jnp.ndarray, ...]] = None


jax.tree_util.register_dataclass(
    GuidanceInputs,
    data_fields=["boxes", "token_pos", "token_valid", "obj_valid",
                 "word_token", "ref_attn_maps"],
    meta_fields=[],
)


def make_energy_fn(
    unet_capture_apply: Callable[..., Any],
    gcfg: GuidanceConfig,
    text_len: int,
    latent_hw=None,
):
    """Build ``energy(latents, t, cond_context, gin) -> loss``.

    ``unet_capture_apply(latents, t, context) -> attn_state`` must run the
    UNet cond-only with ``capture_keys=gcfg.attn_keys`` and
    ``mutable=['attn']``, returning the sown collection.
    """

    def energy(latents, t, cond_context, gin: GuidanceInputs):
        attn_state = unet_capture_apply(latents, t, cond_context)
        maps = guidance_ops.attn_collection_to_maps(
            attn_state, gcfg.attn_keys, cond_batch_index=0, text_len=text_len
        )
        return guidance_ops.compute_ca_loss(
            maps, gin.boxes, gin.token_pos, gin.token_valid, gin.obj_valid,
            ref_attn_maps=(list(gin.ref_attn_maps)
                           if gin.ref_attn_maps is not None else None),
            word_token=gin.word_token,
            fg_top_p=gcfg.fg_top_p, bg_top_p=gcfg.bg_top_p,
            fg_weight=gcfg.fg_weight, bg_weight=gcfg.bg_weight,
            ref_ca_loss_weight=gcfg.ref_ca_loss_weight,
            latent_hw=latent_hw,
        )

    return energy


def guidance_update(
    energy_fn,
    sched,                       # sched_ops.Sampler or DDIMSchedule
    gcfg: GuidanceConfig,
    latents: jnp.ndarray,        # [1, h, w, 4]
    step_index: jnp.ndarray,
    cond_context: jnp.ndarray,   # [1, L, C]
    gin: GuidanceInputs,
    prev_loss: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Iterated energy descent at one DDIM step.

    Loop semantics of ``latent_backward_guidance``
    (``models/pipelines.py:96-124``): repeat while
    ``loss > loss_threshold * loss_scale`` and ``iter < max_iter[index]``;
    each iteration takes one gradient step scaled by
    ``sqrt(1 - alpha_prod_t)`` and ``loss_scale``.  ``prev_loss`` carries
    across steps like the reference's threaded ``loss`` variable
    (``models/pipelines.py:76``): once guidance converges below the
    threshold it stays off for the remaining steps.

    Returns (latents, final_loss).
    """
    t = sched.timesteps[step_index]
    if gin.ref_attn_maps is not None and any(
            m.ndim == 4 for m in gin.ref_attn_maps):
        # per-step reference maps: select this step's saved attention
        # (reference semantics, utils/guidance.py:220-233).  Clip guards a
        # reference trajectory shorter than this pass's schedule.
        gin = dataclasses.replace(
            gin,
            ref_attn_maps=tuple(
                m[jnp.clip(step_index, 0, m.shape[0] - 1)]
                if m.ndim == 4 else m
                for m in gin.ref_attn_maps),
        )
    if hasattr(sched, "guidance_step_scale"):
        scale = sched.guidance_step_scale(step_index)
    else:
        scale = sched_ops.guidance_step_scale(sched, step_index)
    max_iter_table = jnp.asarray(gcfg.max_iter, jnp.int32)
    max_it = max_iter_table[jnp.clip(step_index, 0, len(gcfg.max_iter) - 1)]

    def scaled_energy(lat):
        # the UNet expects scheduler-scaled inputs (identity for DDIM,
        # 1/sqrt(sigma^2+1) for Euler-Ancestral) — the reference applies
        # scale_model_input before its guidance forward
        # (models/pipelines.py:87-90)
        if hasattr(sched, "scale_model_input"):
            lat = sched.scale_model_input(lat, step_index)
        return energy_fn(lat, t, cond_context, gin) * gcfg.loss_scale

    grad_fn = jax.value_and_grad(scaled_energy)

    def cond(carry):
        _, loss, i = carry
        return jnp.logical_and(
            loss > gcfg.loss_threshold * gcfg.loss_scale, i < max_it
        )

    def body(carry):
        lat, _, i = carry
        loss, grad = grad_fn(lat)
        lat = lat - scale * grad
        return lat, loss, i + 1

    init_loss = (jnp.float32(jnp.inf) if prev_loss is None
                 else prev_loss.astype(jnp.float32))
    lat, loss, _ = jax.lax.while_loop(
        cond, body, (latents, init_loss, jnp.int32(0))
    )
    return lat, loss
