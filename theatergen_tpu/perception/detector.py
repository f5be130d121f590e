"""Open-vocabulary character detection for the detect-and-regenerate loop.

The reference calls GroundingDINO on every generated character image
(``utils/detector.py:5-21``: ``predict_with_classes`` with box_threshold
0.3 / text_threshold 0.25, keep the highest-confidence box) and regenerates
with shifted seeds when detection fails (``theatergen.py:98-160``).

TPU-native design: the generation pipeline *already* computes cross-
attention maps for the character's word token (captured at the guidance
keys), and those maps localize the character — so the primary detector is
attention-based and free.  A CLIP box-scorer verifies the crop matches the
phrase, playing DINO's confidence-threshold role.  A ported GroundingDINO
can be plugged behind the same interface later (``DetectorBackend``).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Protocol, Sequence, Tuple

import jax
import jax.numpy as jnp

from ..ops import geometry as G


@dataclasses.dataclass
class Detection:
    box: jnp.ndarray        # [4] normalized [x0, y0, x1, y1]
    confidence: jnp.ndarray  # scalar
    ok: jnp.ndarray          # bool scalar


jax.tree_util.register_dataclass(
    Detection, data_fields=["box", "confidence", "ok"], meta_fields=[]
)


def attention_detect(
    attn_maps: Sequence[jnp.ndarray],   # per key [heads, HW, T] or [heads, HW]
    word_token: Optional[jnp.ndarray] = None,
    *,
    mass_threshold: float = 0.5,
    min_area: float = 0.001,
    out_hw: int = 64,
    gaussian_sigma: float = 0.0,
) -> Detection:
    """Localize a character from its word-token cross-attention mass.

    Aggregates the guidance-key maps (mean over heads/keys, upsampled to a
    common grid), binarizes at ``mass_threshold`` × max, and returns the
    bounding box.  ``ok`` when the box holds enough attention mass and area
    — the analogue of DINO's thresholded confidence
    (``utils/detector.py:14-20``).
    """
    agg = jnp.zeros((out_hw, out_hw), jnp.float32)
    for m in attn_maps:
        if word_token is not None and m.ndim == 3:
            m = m[:, :, word_token]
        m = jnp.mean(m.astype(jnp.float32), axis=0)     # [HW]
        side = int(round(m.shape[0] ** 0.5))
        m2 = m.reshape(side, side)
        agg = agg + G.resize_bilinear(m2, out_hw, out_hw)
    if gaussian_sigma > 0:
        # smooth before thresholding (reference gaussian-filters attention
        # before SAM prompting, theatergen.py:31-33)
        from ..ops.lineart import gaussian_blur

        agg = gaussian_blur(agg, gaussian_sigma)
    agg = agg / (jnp.max(agg) + 1e-8)
    binary = (agg > mass_threshold).astype(jnp.float32)
    box_px = G.mask_to_box(binary, enlarge_by_one=False).astype(jnp.float32)
    box = box_px / out_hw
    area = (box[2] - box[0]) * (box[3] - box[1])
    inside = jnp.sum(agg * binary) / (jnp.sum(agg) + 1e-8)
    ok = jnp.logical_and(area > min_area, inside > 0.25)
    return Detection(box=box, confidence=inside, ok=ok)


class DetectorBackend(Protocol):
    def __call__(self, image: jnp.ndarray, phrase: str) -> Detection: ...


class ClipBoxScorer:
    """Score a crop against a phrase with a PAIRED CLIP embedder (both
    towers in one joint space — see eval.cmig.ClipEmbedder) — the
    verification half of detection (plays the role of DINO's text
    threshold).  Comparing embeddings of unrelated models is meaningless,
    so this takes an embedder, not the generation bundle."""

    def __init__(self, embedder):
        self.embedder = embedder

    def score(self, image: jnp.ndarray, box: jnp.ndarray, phrase: str
              ) -> float:
        """Cosine similarity between the box crop and the phrase."""
        import numpy as np

        from ..eval.metrics import cosine_similarity, crop

        crop_img = crop(np.asarray(image), np.asarray(box))
        img_e = self.embedder.embed_images([crop_img])
        txt_e = self.embedder.embed_texts([phrase])
        return float(cosine_similarity(img_e, txt_e)[0])


def detect_from_attention_and_sam(
    attn_maps, word_token, sam_segment_fn=None, image=None,
) -> Tuple[Detection, Optional[jnp.ndarray]]:
    """Full detection: attention proposal, optionally refined by a SAM box
    prompt (mirrors the reference's DINO-box → SAM-refine chain,
    ``theatergen.py:162-182``)."""
    det = attention_detect(attn_maps, word_token)
    mask = None
    if sam_segment_fn is not None and image is not None:
        masks, _ = sam_segment_fn(image, det.box)
        mask = masks[0]
    return det, mask
