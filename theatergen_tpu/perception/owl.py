"""OWL-ViT-style open-vocabulary detector.

The reference detects characters with GroundingDINO
(``utils/detector.py:5-21``).  GroundingDINO's deformable-DETR machinery
(multi-scale deformable attention = data-dependent bilinear gathers) maps
poorly onto the MXU; the TPU-native open-vocabulary detector of equivalent
capability is the OWL-ViT recipe — a CLIP ViT backbone whose *patch tokens*
get a box-regression head and a class head scored against text query
embeddings.  Dense, static-shaped, MXU-friendly, and pretrained weights
exist (google/owlvit-*, originally JAX) for porting via
:mod:`..models.weights`-style mapping.

Behind the same ``detect(image, phrase) -> (box, conf, ok)`` interface as
the CLIP sliding-box scorer; thresholds mirror the reference's
box_threshold=0.3 semantics.
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..config import CLIPTextConfig, CLIPVisionConfig
from ..models.clip import CLIPTextEncoder, CLIPVisionEncoder


class OwlHeads(nn.Module):
    """Per-patch box + class-embedding heads over ViT patch tokens."""

    query_dim: int

    @nn.compact
    def __call__(self, patch_tokens: jnp.ndarray):
        """[B, N, D] → (boxes [B, N, 4] in cxcywh-normalized,
        class_embeds [B, N, Q])."""
        x = nn.LayerNorm(name="norm")(patch_tokens)
        h = nn.Dense(x.shape[-1], name="box_mlp_1")(x)
        h = nn.gelu(approximate=False, x=h)
        h = nn.Dense(x.shape[-1], name="box_mlp_2")(h)
        h = nn.gelu(approximate=False, x=h)
        boxes = nn.sigmoid(nn.Dense(4, name="box_head")(h))
        class_embeds = nn.Dense(self.query_dim, name="class_head")(x)
        return boxes, class_embeds


class OwlDetector(nn.Module):
    """Vision tower + heads; text queries come from a paired text tower."""

    vision_cfg: CLIPVisionConfig
    text_cfg: CLIPTextConfig

    def setup(self):
        self.vision = CLIPVisionEncoder(self.vision_cfg)
        self.text = CLIPTextEncoder(self.text_cfg)
        self.heads = OwlHeads(self.text_cfg.projection_dim)
        self.logit_scale = self.param(
            "logit_scale", nn.initializers.constant(2.0), ())
        self.logit_shift = self.param(
            "logit_shift", nn.initializers.zeros, ())

    def image_features(self, pixels: jnp.ndarray):
        """[B, S, S, 3] → (boxes [B, N, 4] xyxy-normalized, class embeds)."""
        _, _, tokens = self.vision(pixels)
        patch_tokens = tokens[:, 1:]     # drop CLS
        boxes_cxcywh, class_embeds = self.heads(patch_tokens)
        cx, cy, w, h = jnp.split(boxes_cxcywh, 4, axis=-1)
        boxes = jnp.concatenate(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        boxes = jnp.clip(boxes, 0.0, 1.0)
        return boxes, class_embeds

    def text_queries(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self.text(input_ids)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True)
                         + 1e-8)

    def __call__(self, pixels: jnp.ndarray, input_ids: jnp.ndarray):
        """→ (boxes [B, N, 4], logits [B, N, Q])."""
        boxes, class_embeds = self.image_features(pixels)
        queries = self.text_queries(input_ids)
        ce = class_embeds / (jnp.linalg.norm(class_embeds, axis=-1,
                                             keepdims=True) + 1e-8)
        logits = jnp.einsum("bnd,qd->bnq", ce, queries)
        logits = logits * jnp.exp(self.logit_scale) + self.logit_shift
        return boxes, logits


CLIP_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


class OwlBackend:
    """``detect(image, phrase)`` backend wrapping an OwlDetector."""

    def __init__(self, detector: OwlDetector, params, tokenizer,
                 max_length: int = 16, box_threshold: float = 0.3):
        self.detector = detector
        self.params = params
        self.tokenizer = tokenizer
        self.max_length = max_length
        self.box_threshold = box_threshold  # utils/detector.py:14
        self._fwd = jax.jit(
            lambda p, img, ids: detector.apply({"params": p}, img, ids))

    def _detect(self, image: np.ndarray, phrase: str):
        """Shared preprocessing + forward: CLIP-normalized pixels (the
        vision tower is CLIP; raw [0,1] inputs would be out of
        distribution for ported weights) → (boxes [N,4], probs [N])."""
        size = self.detector.vision_cfg.image_size
        img = jax.image.resize(jnp.asarray(image, jnp.float32),
                               (size, size, 3), "bilinear")
        img = ((img - CLIP_MEAN) / CLIP_STD)[None]
        ids = jnp.asarray(self.tokenizer([phrase],
                                         max_length=self.max_length))
        boxes, logits = self._fwd(self.params, img, ids)
        return np.asarray(boxes[0]), np.asarray(jax.nn.sigmoid(logits[0, :, 0]))

    def __call__(self, image: np.ndarray, phrase: str
                 ) -> Tuple[np.ndarray, float, bool]:
        boxes, probs = self._detect(image, phrase)
        best = int(np.argmax(probs))
        conf = float(probs[best])
        return boxes[best], conf, conf > self.box_threshold

    def count_instances(self, image: np.ndarray, phrase: str,
                        max_n: int = 8, iou_nms: float = 0.5) -> int:
        boxes, probs = self._detect(image, phrase)
        order = np.argsort(-probs)
        picked: List[np.ndarray] = []
        for i in order:
            if probs[i] <= self.box_threshold or len(picked) >= max_n:
                break
            if all(_iou(boxes[i], p) < iou_nms for p in picked):
                picked.append(boxes[i])
        return len(picked)


def _iou(a, b, eps=1e-6):
    x0, y0 = max(a[0], b[0]), max(a[1], b[1])
    x1, y1 = min(a[2], b[2]), min(a[3], b[3])
    inter = max(x1 - x0, 0) * max(y1 - y0, 0)
    union = ((a[2] - a[0]) * (a[3] - a[1])
             + (b[2] - b[0]) * (b[3] - b[1]) - inter)
    return inter / (union + eps)
