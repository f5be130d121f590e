"""Latent seeding, blending, composition, alignment, and the pixel collage.

TPU-native re-design of the reference's host-side composition machinery
(``utils/latents.py``, SURVEY.md §2.4).  Everything here is traceable and
object-batched: per-object lists become a padded leading axis of static
size ``max_objects`` (padded slots carry empty masks and are no-ops), the
per-object Python loops become ``vmap`` / ``scan``, and the PIL crop/resize
collage becomes ``jax.image.scale_and_translate`` with traced boxes — so
multi-character composition runs inside one jitted program with no host
round-trips.

Conventions: latents are NHWC ``[B, h, w, 4]``; trajectories are
``[S+1, B, h, w, 4]``; boxes are normalized ``[x0, y0, x1, y1]``.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from . import geometry as G


def unscaled_latents(rng: jax.Array, shape, dtype=jnp.float32) -> jnp.ndarray:
    """Seeded unit-normal noise (reference ``get_unscaled_latents``,
    ``utils/latents.py:138-149``; fp32 then cast, as there)."""
    return jax.random.normal(rng, shape, jnp.float32).astype(dtype)


def blend_latents(latents_bg: jnp.ndarray, latents_fg: jnp.ndarray,
                  fg_mask: jnp.ndarray, fg_blending_ratio: float = 0.1
                  ) -> jnp.ndarray:
    """Variance-preserving fg/bg noise blend inside the mask
    (reference ``blend_latents``, ``utils/latents.py:156-166``)."""
    r = fg_blending_ratio
    mask = fg_mask[..., None]  # [h, w, 1] over NHWC channels
    blended = latents_bg * jnp.sqrt(1.0 - r) + latents_fg * jnp.sqrt(r)
    return latents_bg * (1.0 - mask) + blended * mask


def input_latents_for_boxes(
    rng_bg: jax.Array,
    rng_fg: jax.Array,
    boxes: jnp.ndarray,          # [K, 4] normalized (padded slots arbitrary)
    h: int, w: int,
    *,
    fg_blending_ratio: float = 0.1,
    init_noise_sigma: float = 1.0,
    channels: int = 4,
    bg_noise: Optional[jnp.ndarray] = None,
    fg_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Shared bg noise + per-box fg-blended noise for all K objects at once
    (reference ``get_input_latents_list``, ``utils/latents.py:257-295``:
    same bg generator, one fg generator per object).

    ``bg_noise [1, h, w, C]`` / ``fg_noise [K, 1, h, w, C]`` override the
    seeded draws with externally supplied unit-normal noise — the
    reference-noise injection hook for golden parity against the torch
    reference, whose ``torch.manual_seed`` streams jax can't reproduce
    (SURVEY §7 "RNG parity"; see ``theatergen_tpu/eval/goldens.py``).

    Returns ``(per_object [K, 1, h, w, C], bg [1, h, w, C])``.
    """
    bg = (unscaled_latents(rng_bg, (1, h, w, channels))
          if bg_noise is None else jnp.asarray(bg_noise, jnp.float32))
    k = boxes.shape[0]
    fg = (unscaled_latents(rng_fg, (k, 1, h, w, channels))
          if fg_noise is None else jnp.asarray(fg_noise, jnp.float32))
    masks = jax.vmap(lambda b: G.box_mask(b, h, w))(boxes)  # [K, h, w]

    def blend_one(fg_i, mask_i):
        return blend_latents(bg, fg_i, mask_i, fg_blending_ratio)

    per_obj = jax.vmap(blend_one)(fg, masks)
    return per_obj * init_noise_sigma, bg * init_noise_sigma


def compose_trajectories(
    trajectories: jnp.ndarray,     # [K, S+1, B, h, w, C]
    masks: jnp.ndarray,            # [K, h, w] binary at latent scale
    latents_bg: jnp.ndarray,       # [B, h, w, C] t=T noise
    *,
    compose_box_to_bg: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Masked merge of per-object latent trajectories, largest mask first.

    Reference ``compose_latents`` (``utils/latents.py:169-218``):
    - t=T slot starts from fresh bg noise; optionally box-masked copies of
      each object's own t=T noise (``compose_box_to_bg``);
    - all steps merged under per-object masks in descending-mask-size order
      (so smaller characters stay on top);
    - ``foreground_indices`` labels each latent pixel with (object idx + 1).

    The sort is done with a static-length ``fori_loop`` over a permutation
    — jit-safe for padded object slots (empty masks are no-ops).
    """
    k, s1 = trajectories.shape[0], trajectories.shape[1]
    sizes = jnp.sum(masks, axis=(1, 2))
    order = jnp.argsort(-sizes)  # largest first

    composed = jnp.zeros_like(trajectories[0])          # [S+1, B, h, w, C]
    composed = composed.at[0].set(latents_bg)
    fg_idx = jnp.zeros(masks.shape[-2:], jnp.int32)

    if compose_box_to_bg:
        def box_body(j, comp0):
            i = order[j]
            box = G.mask_to_box(masks[i])  # pixel box, enlarge-by-one
            h_, w_ = masks.shape[-2:]
            bm = G.box_mask(
                box.astype(jnp.float32) / jnp.array([w_, h_, w_, h_]), h_, w_
            )[..., None]
            # padded (empty-mask) slots would fall back to the full-image
            # box and wipe the background with their zero trajectories
            bm = bm * (sizes[i] > 0).astype(bm.dtype)
            return comp0 * (1 - bm) + trajectories[i, 0] * bm

        comp0 = jax.lax.fori_loop(0, k, box_body, composed[0])
        composed = composed.at[0].set(comp0)

    def body(j, carry):
        comp, fgi = carry
        i = order[j]
        m = masks[i]
        me = m[None, None, :, :, None]
        comp = comp * (1 - me) + trajectories[i] * me
        fgi = jnp.where(m > 0, i + 1, fgi)
        return comp, fgi

    composed, fg_idx = jax.lax.fori_loop(0, k, body, (composed, fg_idx))
    return composed, fg_idx


def align_with_boxes(
    trajectories: jnp.ndarray,     # [K, S+1, B, h, w, C]
    masks: jnp.ndarray,            # [K, h, w]
    boxes: jnp.ndarray,            # [K, 4] normalized layout boxes
    *,
    horizontal_only: bool = False,
    base: int = 8,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shift each object's trajectory/mask so its mask mass-center lands on
    its layout-box center (reference ``align_with_bboxes``,
    ``utils/latents.py:220-240``).

    Offsets are snapped to 1/``base`` of the canvas like the reference's
    ``offset_normalized`` path (``utils/utils.py:150-153``) so shifts stay
    aligned across latent / attention resolutions.  Returns
    (trajectories, masks, offsets ``[K, 2]`` normalized (x, y)).
    """
    h, w = masks.shape[-2:]

    def one(traj, mask, box):
        cx, cy = G.mask_center(mask, normalize=True)
        tx = (box[0] + box[2]) / 2 - cx
        ty = (box[1] + box[3]) / 2 - cy
        if horizontal_only:
            ty = jnp.zeros_like(ty)
        # snap to base grid, then scale to this resolution
        dx = jnp.round(tx * base).astype(jnp.int32) * (w // base)
        dy = jnp.round(ty * base).astype(jnp.int32) * (h // base)
        traj = G.shift2d(traj, dy, dx)
        mask = G.shift2d(mask, dy, dx)
        return traj, mask, jnp.stack([tx, ty])

    return jax.vmap(one)(trajectories, masks, boxes)


def collage_images(
    images: jnp.ndarray,       # [K, H, W, 3] per-character renders in [0,1]
    masks: jnp.ndarray,        # [K, H, W] pixel-scale character masks
    boxes: jnp.ndarray,        # [K, 4] normalized layout boxes
    valid: Optional[jnp.ndarray] = None,   # [K] bool for padded slots
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Build the mid-image collage: crop each character to its mask bbox,
    rescale into its layout box, paste onto a black canvas; union mask.

    Reference ``prepare_mid_image`` (``utils/latents.py:48-135``) does this
    on host with PIL crops; here each paste is one
    ``jax.image.scale_and_translate`` (output coords: ``o = i*scale + t``)
    with traced boxes, so the collage is jittable and batched.

    Returns (collage [H, W, 3], union_mask [H, W]).
    """
    k, h, w = masks.shape[0], masks.shape[1], masks.shape[2]
    if valid is None:
        valid = jnp.ones((k,), bool)

    def paste(carry, inp):
        canvas, union = carry
        img, mask, box, ok = inp
        src = G.mask_to_box(mask).astype(jnp.float32)     # [x0, y0, x1, y1] px
        sw = jnp.maximum(src[2] - src[0], 1.0)
        sh = jnp.maximum(src[3] - src[1], 1.0)
        tx0, ty0 = box[0] * w, box[1] * h
        tw = jnp.maximum((box[2] - box[0]) * w, 1.0)
        th = jnp.maximum((box[3] - box[1]) * h, 1.0)
        scale = jnp.stack([th / sh, tw / sw])              # (y, x)
        trans = jnp.stack([ty0 - src[1] * scale[0], tx0 - src[0] * scale[1]])
        img_m = img * mask[..., None]
        warped = jax.image.scale_and_translate(
            img_m, (h, w, 3), (0, 1), scale, trans, method="linear"
        )
        wmask = jax.image.scale_and_translate(
            mask[..., None].astype(jnp.float32), (h, w, 1), (0, 1), scale,
            trans, method="linear",
        )[..., 0]
        wmask = (wmask > 0.5).astype(jnp.float32) * ok
        canvas = canvas * (1 - wmask[..., None]) + warped * wmask[..., None]
        union = jnp.maximum(union, wmask)
        return (canvas, union), None

    init = (jnp.zeros((h, w, 3), images.dtype), jnp.zeros((h, w), jnp.float32))
    (canvas, union), _ = jax.lax.scan(
        paste, init, (images, masks, boxes, valid.astype(jnp.float32))
    )
    return canvas, union
