"""Character database: the cross-turn identity memory.

The reference persists one PNG per character id under
``database_{ver}/{task}/{dialogue}/{obj_id}.png`` — written after a new
character's first generation (``models/pipelines.py:476-477``), read as the
IP-Adapter reference on later turns (``:183-199``), and deleted before a
detection-failure retry (``theatergen.py:158-159``).  This is the state
that must survive restarts (SURVEY.md §5 checkpoint/resume).

TPU-native addition: a ``.npy`` CLIP-embedding sidecar per PNG so DB hits
skip the ViT-H image encoder entirely (the north-star's "store CLIP-H
embeddings alongside PNGs").
"""

from __future__ import annotations

import os
from typing import Optional, Tuple

import numpy as np


class CharacterDB:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _png(self, obj_id) -> str:
        return os.path.join(self.root, f"{obj_id}.png")

    def _emb(self, obj_id) -> str:
        return os.path.join(self.root, f"{obj_id}.npy")

    def has(self, obj_id) -> bool:
        return os.path.exists(self._png(obj_id))

    def load_image(self, obj_id) -> Optional[np.ndarray]:
        """[H, W, 3] float32 in [0,1], or None."""
        if not self.has(obj_id):
            return None
        from PIL import Image

        img = Image.open(self._png(obj_id)).convert("RGB")
        return np.asarray(img, np.float32) / 255.0

    def load_embedding(self, obj_id) -> Optional[np.ndarray]:
        p = self._emb(obj_id)
        if os.path.exists(p):
            return np.load(p)
        return None

    def save(self, obj_id, image: np.ndarray,
             embedding: Optional[np.ndarray] = None) -> None:
        """image [H, W, 3] in [0,1]."""
        from PIL import Image

        arr = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(self._png(obj_id))
        if embedding is not None:
            np.save(self._emb(obj_id), np.asarray(embedding))

    def delete(self, obj_id) -> None:
        """Remove a freshly-written character before a regeneration retry
        (reference ``theatergen.py:158-159``)."""
        for p in (self._png(obj_id), self._emb(obj_id)):
            if os.path.exists(p):
                os.remove(p)

    def lookup(self, obj_id) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], bool]:
        """(image, embedding, hit)."""
        img = self.load_image(obj_id)
        return img, self.load_embedding(obj_id), img is not None
