"""OWL-ViT open-vocabulary detector (checkpoint-faithful flax port).

The reference detects characters with GroundingDINO
(``utils/detector.py:5-21``).  GroundingDINO's deformable-DETR machinery
(multi-scale deformable attention = data-dependent bilinear gathers) maps
poorly onto the MXU; the TPU-native open-vocabulary detector of equivalent
capability is OWL-ViT — a CLIP ViT backbone whose *patch tokens* get a
box-regression head and a class head scored against text query embeddings.
Dense, static-shaped, MXU-friendly.

This module matches ``transformers.OwlViTForObjectDetection`` semantics
exactly (golden-tested in ``tests/test_owl.py``) so google/owlvit-*
checkpoints load through :func:`..models.weights.port_owl`:

- vision tower: CLIP ViT; the detection features are the post-LN token
  sequence with the class token *multiplied into* every patch token, then
  an extra LayerNorm (HF ``image_embedder``).
- box head: 3-layer GELU MLP whose logits are biased by each patch's grid
  position/size before the sigmoid (HF ``compute_box_bias``).
- class head: per-patch class embedding cosine-scored against normalized
  text queries, with per-patch learned logit shift and ELU(+1) scale.

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


def box_bias(num_patches: int) -> np.ndarray:
    """Static per-patch box-logit bias: each patch's prediction starts at
    its own grid cell (center = the patch center, size = one patch).
    Matches HF ``OwlViTForObjectDetection.compute_box_bias``."""
    # np.meshgrid default 'xy' == torch indexing="xy": [i, j] = (x_j, y_i),
    # row-major flatten matches the patch-token order
    r = np.arange(1, num_patches + 1, dtype=np.float32)
    xx, yy = np.meshgrid(r, r)
    coords = np.stack([xx, yy], axis=-1).reshape(-1, 2) / num_patches
    coords = np.clip(coords, 0.0, 1.0)
    coord_bias = np.log(coords + 1e-4) - np.log1p(-coords + 1e-4)
    size = np.full_like(coords, 1.0 / num_patches)
    size_bias = np.log(size + 1e-4) - np.log1p(-size + 1e-4)
    return np.concatenate([coord_bias, size_bias], axis=-1)   # [N, 4]


class OwlBoxHead(nn.Module):
    """HF ``OwlViTBoxPredictionHead``: dense→gelu→dense→gelu→dense(4)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        width = x.shape[-1]
        h = nn.Dense(width, name="dense0")(x)
        h = nn.gelu(approximate=False, x=h)
        h = nn.Dense(width, name="dense1")(h)
        h = nn.gelu(approximate=False, x=h)
        return nn.Dense(4, name="dense2")(h)


class OwlClassHead(nn.Module):
    """HF ``OwlViTClassPredictionHead``: cosine logits against normalized
    text queries, with learned per-patch shift and ELU(+1) scale."""

    out_dim: int

    @nn.compact
    def __call__(self, image_feats: jnp.ndarray, query_embeds: jnp.ndarray
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        ce = nn.Dense(self.out_dim, name="dense0")(image_feats)
        ce_n = ce / (jnp.linalg.norm(ce, axis=-1, keepdims=True) + 1e-6)
        q_n = query_embeds / (jnp.linalg.norm(query_embeds, axis=-1,
                                              keepdims=True) + 1e-6)
        logits = jnp.einsum("bpd,qd->bpq", ce_n, q_n)
        shift = nn.Dense(1, name="logit_shift")(image_feats)
        scale = nn.elu(nn.Dense(1, name="logit_scale")(image_feats)) + 1.0
        return (logits + shift) * scale, ce


class OwlDetector(nn.Module):
    """Vision tower + detection heads; text queries from the paired text
    tower (HF ``OwlViTForObjectDetection``)."""

    vision_cfg: CLIPVisionConfig
    text_cfg: CLIPTextConfig

    def setup(self):
        self.vision = CLIPVisionEncoder(self.vision_cfg)
        self.text = CLIPTextEncoder(self.text_cfg)
        # the class-token-merged feature LayerNorm (HF ``layer_norm``)
        self.layer_norm = nn.LayerNorm(
            epsilon=self.vision_cfg.layer_norm_eps)
        self.box_head = OwlBoxHead()
        self.class_head = OwlClassHead(self.text_cfg.hidden_size)
        n = self.vision_cfg.image_size // self.vision_cfg.patch_size
        self._box_bias = box_bias(n)

    def image_features(self, pixels: jnp.ndarray):
        """[B, S, S, 3] → (boxes [B, N, 4] xyxy-normalized, feats)."""
        _, _, _, tokens = self.vision(pixels, return_tokens=True)
        # merge the class token into every patch token (HF image_embedder)
        feats = self.layer_norm(tokens[:, 1:] * tokens[:, :1])
        pred = self.box_head(feats) + jnp.asarray(self._box_bias)
        boxes_cxcywh = nn.sigmoid(pred)
        cx, cy, w, h = jnp.split(boxes_cxcywh, 4, axis=-1)
        boxes = jnp.concatenate(
            [cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2], axis=-1)
        boxes = jnp.clip(boxes, 0.0, 1.0)
        return boxes, feats

    def text_queries(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        _, pooled = self.text(input_ids)
        return pooled / (jnp.linalg.norm(pooled, axis=-1, keepdims=True)
                         + 1e-6)

    def __call__(self, pixels: jnp.ndarray, input_ids: jnp.ndarray):
        """→ (boxes [B, N, 4] xyxy-normalized, logits [B, N, Q])."""
        boxes, feats = self.image_features(pixels)
        logits, _ = self.class_head(feats, self.text_queries(input_ids))
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
