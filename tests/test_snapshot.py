"""Native bundle snapshots: orbax save/restore of assembled param trees
(serving cold-start skips checkpoint conversion; see models/snapshot.py)."""

import jax
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.models.snapshot import (
    load_bundle_snapshot, save_bundle_snapshot,
)
from theatergen_tpu.pipelines.bundle import init_bundle


def test_bundle_snapshot_roundtrip(tmp_path):
    cfg = tiny_config()
    # key(1): the restore path inits its skeleton with key(0), so equality
    # below proves the snapshot params actually replaced the placeholders
    b = init_bundle(cfg, jax.random.key(1), with_ip=True,
                    with_controlnet=True, with_vision=True)
    snap = str(tmp_path / "snap")
    fields = save_bundle_snapshot(b, snap)
    assert {"unet_params", "unet_ip_params", "vae_params", "text_params",
            "vision_params", "controlnet_params"} <= set(fields)

    b2 = load_bundle_snapshot(cfg, snap)
    assert b2.controlnet is not None and b2.vision is not None
    for f in fields:
        jax.tree.map(
            lambda a, c: np.testing.assert_array_equal(np.asarray(a),
                                                       np.asarray(c)),
            getattr(b, f), getattr(b2, f))

    # same params → bit-identical generation
    from theatergen_tpu.pipelines import sd

    img1 = np.asarray(sd.Text2Img(b, num_steps=2)(jax.random.key(7),
                                                  "a red knight"))
    img2 = np.asarray(sd.Text2Img(b2, num_steps=2)(jax.random.key(7),
                                                   "a red knight"))
    np.testing.assert_array_equal(img1, img2)

    with pytest.raises(FileExistsError):
        save_bundle_snapshot(b, snap)


def test_snapshot_rejects_unknown_fields(tmp_path):
    import json
    import os

    cfg = tiny_config()
    b = init_bundle(cfg, jax.random.key(0))
    snap = str(tmp_path / "snap")
    save_bundle_snapshot(b, snap)
    meta_path = os.path.join(snap, "bundle_meta.json")
    meta = json.load(open(meta_path))
    meta["fields"].append("exotic_params")
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="unknown fields"):
        load_bundle_snapshot(cfg, snap)
