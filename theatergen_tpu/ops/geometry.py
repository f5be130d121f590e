"""Box / mask geometry as jit-friendly XLA ops.

TPU-native re-design of the reference's host-side numpy/torch helpers
(``utils/utils.py``): every function here is traceable — masks are built by
comparing ``broadcasted_iota`` grids against (possibly traced) box
coordinates instead of Python slicing, and integer shifts use pad +
``dynamic_slice`` instead of data-dependent slice assignment.  This lets box
masking, composition and alignment live *inside* jitted pipelines with no
host round-trips (SURVEY.md §7 "host/device choreography").

Boxes are ``[x_min, y_min, x_max, y_max]`` in normalized [0,1] coordinates
unless noted, matching the reference convention (``utils/utils.py:17-42``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def centered_box(box: jnp.ndarray, horizontal_only: bool = True,
                 vertical_center: float = 0.5) -> jnp.ndarray:
    """Recenter a normalized box (reference ``get_centered_box``,
    ``utils/utils.py:17-42``).  Used to place a single character mid-canvas
    before per-character generation (``theatergen.py:348-355``)."""
    x0, y0, x1, y1 = box[..., 0], box[..., 1], box[..., 2], box[..., 3]
    w = x1 - x0
    nx0, nx1 = 0.5 - w / 2, 0.5 + w / 2
    if horizontal_only:
        return jnp.stack([nx0, y0, nx1, y1], axis=-1)
    h = y1 - y0
    ny0, ny1 = vertical_center - h / 2, vertical_center + h / 2
    return jnp.stack([nx0, ny0, nx1, ny1], axis=-1)


def scale_box(box: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Normalized box → integer pixel box with shift-invariant size rounding
    (reference ``scale_proportion``, ``utils/utils.py:55-68``)."""
    x0 = jnp.round(box[..., 0] * w)
    y0 = jnp.round(box[..., 1] * h)
    bw = jnp.round((box[..., 2] - box[..., 0]) * w)
    bh = jnp.round((box[..., 3] - box[..., 1]) * h)
    x1 = jnp.clip(x0 + bw, 0, w)
    y1 = jnp.clip(y0 + bh, 0, h)
    x0 = jnp.clip(x0, 0, w)
    y0 = jnp.clip(y0, 0, h)
    return jnp.stack([x0, y0, x1, y1], axis=-1).astype(jnp.int32)


def box_mask(box: jnp.ndarray, h: int, w: int, dtype=jnp.float32) -> jnp.ndarray:
    """Normalized box → ``[h, w]`` {0,1} mask (reference
    ``proportion_to_mask``, ``utils/utils.py:46-53``), built from iota
    comparisons so the box may be a traced value."""
    ibox = scale_box(box, h, w)
    rows = jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (h, w), 1)
    m = (
        (rows >= ibox[..., 1, None, None]) & (rows < ibox[..., 3, None, None])
        & (cols >= ibox[..., 0, None, None]) & (cols < ibox[..., 2, None, None])
    )
    return m.astype(dtype)


def mask_to_box(mask: jnp.ndarray, enlarge_by_one: bool = True) -> jnp.ndarray:
    """Tight integer pixel box around a binary mask (reference
    ``binary_mask_to_box``, ``utils/utils.py:70-88``).  Returns
    ``[x0, y0, x1, y1]`` int32; an empty mask yields the full-image box."""
    h, w = mask.shape[-2], mask.shape[-1]
    any_ = jnp.any(mask > 0)
    rows = jnp.any(mask > 0, axis=-1)
    cols = jnp.any(mask > 0, axis=-2)
    ridx = jax.lax.broadcasted_iota(jnp.int32, (h, 1), 0).squeeze(-1)
    cidx = jax.lax.broadcasted_iota(jnp.int32, (w, 1), 0).squeeze(-1)
    big = jnp.int32(10**9)
    y0 = jnp.min(jnp.where(rows, ridx, big))
    y1 = jnp.max(jnp.where(rows, ridx, -big))
    x0 = jnp.min(jnp.where(cols, cidx, big))
    x1 = jnp.max(jnp.where(cols, cidx, -big))
    if enlarge_by_one:
        y0, x0 = jnp.maximum(y0 - 1, 0), jnp.maximum(x0 - 1, 0)
        y1, x1 = jnp.minimum(y1 + 1, h), jnp.minimum(x1 + 1, w)
    box = jnp.stack([x0, y0, x1, y1])
    fallback = jnp.array([0, 0, w, h], jnp.int32)
    return jnp.where(any_, box, fallback).astype(jnp.int32)


def mask_center(mask: jnp.ndarray, normalize: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mass center (x, y) of a mask (reference ``binary_mask_to_center``,
    ``utils/utils.py:100-119``); empty mask → geometric center."""
    h, w = mask.shape[-2], mask.shape[-1]
    m = mask.astype(jnp.float32)
    total = jnp.sum(m, axis=(-2, -1))
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    safe = jnp.maximum(total, 1e-6)
    x = jnp.sum(m * xs, axis=(-2, -1)) / safe
    y = jnp.sum(m * ys, axis=(-2, -1)) / safe
    x = jnp.where(total > 0, x, (w - 1) / 2.0)
    y = jnp.where(total > 0, y, (h - 1) / 2.0)
    if normalize:
        x, y = x / w, y / h
    return x, y


def iou(mask: jnp.ndarray, masks: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """IoU of ``mask [h,w]`` against ``masks [n,h,w]`` (reference
    ``utils/utils.py:122-129``)."""
    a = mask[None].astype(bool)
    b = masks.astype(bool)
    inter = jnp.sum(a & b, axis=(1, 2))
    union = jnp.sum(a | b, axis=(1, 2))
    return inter / (union + eps)


def box_iou(a: jnp.ndarray, b: jnp.ndarray, eps: float = 1e-6) -> jnp.ndarray:
    """IoU between two normalized boxes (broadcastable)."""
    x0 = jnp.maximum(a[..., 0], b[..., 0])
    y0 = jnp.maximum(a[..., 1], b[..., 1])
    x1 = jnp.minimum(a[..., 2], b[..., 2])
    y1 = jnp.minimum(a[..., 3], b[..., 3])
    inter = jnp.clip(x1 - x0, 0) * jnp.clip(y1 - y0, 0)
    area_a = jnp.clip(a[..., 2] - a[..., 0], 0) * jnp.clip(a[..., 3] - a[..., 1], 0)
    area_b = jnp.clip(b[..., 2] - b[..., 0], 0) * jnp.clip(b[..., 3] - b[..., 1], 0)
    return inter / (area_a + area_b - inter + eps)


def shift2d(x: jnp.ndarray, dy: jnp.ndarray, dx: jnp.ndarray) -> jnp.ndarray:
    """Shift the trailing two dims by integer offsets, zero-filling.

    Traceable replacement for the reference's slice-assignment shifter
    (``utils/utils.py:143-178``): pad by (H, W) on each side, then
    ``dynamic_slice`` at ``(H - dy, W - dx)``.  Positive ``dy``/``dx`` move
    content down/right.  Works for any leading batch dims.
    """
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [(h, h), (w, w)]
    xp = jnp.pad(x, pad)
    start = [jnp.int32(0)] * (x.ndim - 2) + [
        jnp.clip(h - dy, 0, 2 * h).astype(jnp.int32),
        jnp.clip(w - dx, 0, 2 * w).astype(jnp.int32),
    ]
    return jax.lax.dynamic_slice(xp, start, x.shape)


def downsample_max(mask: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Max-pool a mask down to ``(out_h, out_w)`` (reference
    ``utils/latents.py:22-30`` uses adaptive max-pool for 512→64 masks)."""
    h, w = mask.shape[-2], mask.shape[-1]
    assert h % out_h == 0 and w % out_w == 0, (h, w, out_h, out_w)
    fh, fw = h // out_h, w // out_w
    shape = mask.shape[:-2] + (out_h, fh, out_w, fw)
    return jnp.max(mask.reshape(shape), axis=(-3, -1))


def upsample_nearest(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Nearest-neighbour upsample of the trailing two dims."""
    h, w = x.shape[-2], x.shape[-1]
    assert out_h % h == 0 and out_w % w == 0, (h, w, out_h, out_w)
    x = jnp.repeat(x, out_h // h, axis=-2)
    return jnp.repeat(x, out_w // w, axis=-1)


def resize_bilinear(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Bilinear resize of the trailing two spatial dims (NCHW or HW)."""
    out_shape = img.shape[:-2] + (out_h, out_w)
    return jax.image.resize(img, out_shape, method="bilinear")


def paste_region(canvas: jnp.ndarray, patch: jnp.ndarray, y0: jnp.ndarray,
                 x0: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Paste ``patch [..., ph, pw]`` onto ``canvas`` at ``(y0, x0)`` under
    ``mask [ph, pw]`` — the collage primitive behind ``prepare_mid_image``
    (reference ``utils/latents.py:48-135``), expressed as shift + where."""
    ph, pw = patch.shape[-2], patch.shape[-1]
    h, w = canvas.shape[-2], canvas.shape[-1]
    pad = [(0, 0)] * (patch.ndim - 2) + [(0, h - ph), (0, w - pw)]
    patch_f = jnp.pad(patch, pad)
    mask_f = jnp.pad(mask, [(0, h - ph), (0, w - pw)])
    patch_s = shift2d(patch_f, y0, x0)
    mask_s = shift2d(mask_f.astype(patch_f.dtype), y0, x0)
    return canvas * (1 - mask_s) + patch_s * mask_s
