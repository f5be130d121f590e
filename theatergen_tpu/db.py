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


def _store_key(obj_id) -> int:
    if isinstance(obj_id, (int, np.integer)):
        return int(obj_id)
    import hashlib

    return int(hashlib.md5(str(obj_id).encode()).hexdigest()[:15], 16)


class CharacterDB:
    def __init__(self, root: str, use_native: bool = True):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self._native = None
        self._use_native = use_native

    def _store(self, dim: int):
        """Native single-file embedding store (theatergen_tpu.runtime.store);
        lazy-opened at the first embedding's dimensionality."""
        if not self._use_native:
            return None
        if self._native is None:
            try:
                from .runtime.store import EmbeddingStore, available

                if available():
                    self._native = EmbeddingStore(
                        os.path.join(self.root, "embeddings.bin"), dim)
            except Exception:
                self._use_native = False
        return self._native

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
            arr = np.load(p)
            store = self._store(arr.shape[-1])
            if store is not None and _store_key(obj_id) not in store:
                store.put(_store_key(obj_id), arr.reshape(-1))
            return arr
        if self._native is not None:
            hit = self._native.get(_store_key(obj_id))
            if hit is not None:
                return hit
        # a native store may exist from a previous run with unknown dim;
        # open it dimension-agnostically
        bin_path = os.path.join(self.root, "embeddings.bin")
        if self._native is None and self._use_native and os.path.exists(bin_path):
            try:
                from .runtime.store import EmbeddingStore, available

                if available():
                    self._native = EmbeddingStore(bin_path, 0)
                    self._native.dim = self._native._lib.ts_dim(self._native._h)
                    return self._native.get(_store_key(obj_id))
            except Exception:
                self._use_native = False
        return None

    def save(self, obj_id, image: np.ndarray,
             embedding: Optional[np.ndarray] = None) -> None:
        """image [H, W, 3] in [0,1]."""
        from PIL import Image

        arr = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(self._png(obj_id))
        if embedding is not None:
            emb = np.asarray(embedding, np.float32).reshape(-1)
            store = self._store(emb.shape[0])
            if store is not None:
                store.put(_store_key(obj_id), emb)
            else:
                np.save(self._emb(obj_id), emb)

    def delete(self, obj_id) -> None:
        """Remove a freshly-written character before a regeneration retry
        (reference ``theatergen.py:158-159``)."""
        for p in (self._png(obj_id), self._emb(obj_id)):
            if os.path.exists(p):
                os.remove(p)
        if self._native is not None:
            self._native.delete(_store_key(obj_id))

    def lookup(self, obj_id) -> Tuple[Optional[np.ndarray], Optional[np.ndarray], bool]:
        """(image, embedding, hit)."""
        img = self.load_image(obj_id)
        return img, self.load_embedding(obj_id), img is not None
