"""Cross-attention guidance energies (LMD-style), fully jit/grad-safe.

Re-design of the reference's loss stack (``utils/guidance.py``, SURVEY.md
§2.5) for XLA:

- variable-length per-object token positions become padded index arrays
  with validity masks;
- the dynamic ``topk(k = mask_area * top_p)`` becomes a sort + traced-k
  prefix mean (no dynamic shapes);
- the per-object/ per-key Python loops become ``vmap`` over a static
  ``max_objects`` axis and a static tuple of guidance keys.

These energies are differentiated w.r.t. latents by the guidance step
(:mod:`..pipelines.guidance`), replacing torch autograd
(``models/pipelines.py:62-128``) with ``jax.grad`` inside the scan.

Attention maps are ``[heads, HW, T]`` — the cond-branch cross-attention
probabilities for one guidance key (the sown ``"attn"`` collection entries,
reshaped).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from . import geometry as G


def map_shape(hw: int, latent_hw=None):
    """(h, w) of a flattened attention map.  Square by default; with the
    latent aspect ratio given, solve h*w = hw with h/w = lat_h/lat_w
    (non-square canvases)."""
    if latent_hw is None:
        h = w = int(round(hw ** 0.5))
    else:
        lh, lw = latent_hw
        h = int(round((hw * lh / lw) ** 0.5))
        w = hw // max(h, 1)
    assert h * w == hw, (hw, latent_hw)
    return h, w


def topk_mean(x: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """Mean of the k largest entries along the last axis, with traced k.

    ``sort`` + prefix mask instead of ``top_k`` so ``k`` may depend on a
    traced mask area (reference ``utils/guidance.py:137-139`` computes
    ``k = mask.sum() * top_p`` at runtime).
    """
    n = x.shape[-1]
    k = jnp.clip(k, 1, n).astype(jnp.int32)
    sorted_desc = -jnp.sort(-x, axis=-1)
    idx = jax.lax.broadcasted_iota(jnp.int32, sorted_desc.shape, sorted_desc.ndim - 1)
    take = (idx < k).astype(x.dtype)
    return jnp.sum(sorted_desc * take, axis=-1) / k.astype(x.dtype)


def box_ca_loss_single_key(
    attn: jnp.ndarray,            # [heads, HW, T] fp32 probabilities
    boxes: jnp.ndarray,           # [K, 4] normalized
    token_pos: jnp.ndarray,       # [K, P] int token indices (padded)
    token_valid: jnp.ndarray,     # [K, P] bool
    obj_valid: jnp.ndarray,       # [K] bool
    *,
    fg_top_p: float = 0.2,
    bg_top_p: float = 0.2,
    fg_weight: float = 1.0,
    bg_weight: float = 1.0,
    latent_hw=None,
) -> jnp.ndarray:
    """Max-based in/out-box attention loss for one guidance key.

    Semantics of ``add_ca_loss_per_attn_map_to_loss`` (max-based branch,
    ``utils/guidance.py:131-144``): top-k attention inside the object's box
    should be ~1 (weight ``fg_weight``), top-k outside ~0 (``bg_weight``);
    summed over heads, averaged over the object's token positions.
    """
    heads, hw, t = attn.shape
    h, w = map_shape(hw, latent_hw)

    def per_object(box, pos, pos_valid, ok):
        mask = G.box_mask(box, h, w).reshape(hw)
        k_fg = jnp.maximum(jnp.sum(mask) * fg_top_p, 1.0)
        k_bg = jnp.maximum(jnp.sum(1 - mask) * bg_top_p, 1.0)

        def per_token(p, pv):
            ca = attn[:, :, p]                       # [heads, HW]
            fg = (1.0 - topk_mean(ca * mask[None], k_fg)).sum() * fg_weight
            bg = topk_mean(ca * (1 - mask)[None], k_bg).sum() * bg_weight
            return (fg + bg) * pv

        tok_losses = jax.vmap(per_token)(pos, pos_valid.astype(attn.dtype))
        n = jnp.maximum(jnp.sum(pos_valid), 1)
        return jnp.sum(tok_losses) / n * ok

    losses = jax.vmap(per_object)(
        boxes, token_pos, token_valid, obj_valid.astype(attn.dtype)
    )
    return jnp.sum(losses)


def ref_ca_transfer_loss_single_key(
    attn: jnp.ndarray,            # [heads, HW, T] current maps
    ref_attn: jnp.ndarray,        # [K, heads, HW] per-object reference maps
    boxes: jnp.ndarray,           # [K, 4]
    word_token: jnp.ndarray,      # [K] the word token index per object
    obj_valid: jnp.ndarray,       # [K] bool
    eps: float = 1e-5,
    latent_hw=None,
) -> jnp.ndarray:
    """Attention-transfer L1 between normalized masked maps.

    Semantics of ``add_ref_ca_loss_per_attn_map_to_lossv2``
    (``utils/guidance.py:220-242``): both the current map at the object's
    word token and the saved single-character reference map are masked to
    the object's box, normalized to sum 1 over space, and compared with an
    L1 summed over space and averaged over heads.
    """
    heads, hw, t = attn.shape
    h, w = map_shape(hw, latent_hw)

    def per_object(ref, box, wt, ok):
        mask = G.box_mask(box, h, w).reshape(1, hw)
        cur = attn[:, :, wt] * mask
        cur = cur / (jnp.sum(cur, axis=-1, keepdims=True) + eps)
        r = ref * mask
        r = r / (jnp.sum(r, axis=-1, keepdims=True) + eps)
        return jnp.mean(jnp.sum(jnp.abs(cur - r), axis=-1)) * ok

    losses = jax.vmap(per_object)(
        ref_attn, boxes, word_token, obj_valid.astype(attn.dtype)
    )
    return jnp.sum(losses)


def compute_ca_loss(
    attn_maps: Sequence[jnp.ndarray],          # one [heads, HW, T] per key
    boxes: jnp.ndarray,
    token_pos: jnp.ndarray,
    token_valid: jnp.ndarray,
    obj_valid: jnp.ndarray,
    *,
    ref_attn_maps: Optional[Sequence[jnp.ndarray]] = None,  # [K, heads, HW] per key
    word_token: Optional[jnp.ndarray] = None,
    fg_top_p: float = 0.2,
    bg_top_p: float = 0.2,
    fg_weight: float = 1.0,
    bg_weight: float = 1.0,
    ref_ca_loss_weight: float = 1.0,
    latent_hw=None,
) -> jnp.ndarray:
    """Total guidance energy over all guidance keys.

    Mirrors ``compute_ca_lossv3`` (``utils/guidance.py:244-286``): box loss
    summed over keys and normalized by (objects × keys); plus the weighted
    reference-transfer loss under the same normalization.
    """
    num_keys = len(attn_maps)
    n_obj = jnp.maximum(jnp.sum(obj_valid), 1).astype(jnp.float32)
    loss = jnp.float32(0.0)
    for attn in attn_maps:
        loss = loss + box_ca_loss_single_key(
            attn, boxes, token_pos, token_valid, obj_valid,
            fg_top_p=fg_top_p, bg_top_p=bg_top_p,
            fg_weight=fg_weight, bg_weight=bg_weight, latent_hw=latent_hw,
        )
    loss = loss / (n_obj * num_keys)

    if ref_attn_maps is not None:
        assert word_token is not None
        ref_loss = jnp.float32(0.0)
        for attn, ref in zip(attn_maps, ref_attn_maps):
            ref_loss = ref_loss + ref_ca_transfer_loss_single_key(
                attn, ref, boxes, word_token, obj_valid, latent_hw=latent_hw
            )
        loss = loss + ref_ca_loss_weight * ref_loss / (n_obj * num_keys)
    return loss


def attn_collection_to_maps(
    attn_state: Dict, capture_keys: Sequence[Tuple[str, int, int, int]],
    cond_batch_index: int = 1, text_len: Optional[int] = None,
) -> list:
    """Extract ``[heads, HW, T]`` cond-branch maps from the UNet's sown
    ``"attn"`` collection, ordered like ``capture_keys``.

    The sown probs are ``[B, heads, HW, Lk]`` with B = [uncond, cond] (CFG
    stack); guidance reads the cond branch only (the reference runs a
    cond-only forward for guidance, ``models/pipelines.py:90``).
    """
    flat = {}

    def walk(tree, path):
        if isinstance(tree, dict):
            for k, v in tree.items():
                walk(v, path + (k,))
        else:
            probs = tree[0] if isinstance(tree, (tuple, list)) else tree
            flat["/".join(path)] = probs

    walk(attn_state, ())

    def key_to_module(key):
        place, block, attn_idx, layer = key
        if place == "mid":
            mod = "mid_block_attentions_0"
        else:
            mod = f"{place}_blocks_{block}_attentions_{attn_idx}"
        return f"{mod}/transformer_blocks_{layer}/"

    maps = []
    for key in capture_keys:
        frag = key_to_module(key)
        match = [v for p, v in flat.items() if frag in p]
        assert match, (key, list(flat))
        probs = match[0]                       # [B, heads, HW, Lk]
        m = probs[cond_batch_index].astype(jnp.float32)
        if text_len is not None:
            m = m[..., :text_len]
        maps.append(m)
    return maps
