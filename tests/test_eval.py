"""Evaluation metrics + tree driver."""

import json
import os

import jax
import numpy as np
import pytest

from theatergen_tpu.eval import metrics as M


def test_cosine_and_logit():
    a = np.array([[1.0, 0.0]])
    b = np.array([[1.0, 0.0]])
    c = np.array([[0.0, 1.0]])
    assert M.cosine_similarity(a, b)[0] == pytest.approx(1.0)
    assert M.cosine_similarity(a, c)[0] == pytest.approx(0.0)
    assert M.clip_logit(a, b)[0] == pytest.approx(100.0)


def test_save_load_safetensors_roundtrip(tmp_path):
    from theatergen_tpu.models.weights import (
        load_safetensors, save_safetensors,
    )

    rng = np.random.RandomState(0)
    tensors = {
        "a.weight": rng.randn(3, 4).astype(np.float32),
        "b.bias": rng.randn(7).astype(np.float16),
        "c.ids": np.arange(5, dtype=np.int64),
    }
    p = str(tmp_path / "t.safetensors")
    save_safetensors(p, tensors)
    back = load_safetensors(p)
    assert set(back) == set(tensors)
    for k in tensors:
        np.testing.assert_array_equal(back[k], tensors[k])


def test_clip_embedder_from_weights_dir(tmp_path):
    """Ported eval towers load from a weights dir and reproduce torch
    image embeddings (the CCS/TIS embedding space)."""
    import torch
    from transformers import (
        CLIPTextModelWithProjection, CLIPVisionModelWithProjection,
    )
    from transformers import CLIPTextConfig as HFT
    from transformers import CLIPVisionConfig as HFV

    from theatergen_tpu.config import CLIPTextConfig, CLIPVisionConfig
    from theatergen_tpu.eval.cmig import ClipEmbedder
    from theatergen_tpu.models.weights import save_safetensors

    torch.manual_seed(0)
    tt = CLIPTextModelWithProjection(HFT(
        vocab_size=1024, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        max_position_embeddings=16, projection_dim=32)).eval()
    tv = CLIPVisionModelWithProjection(HFV(
        image_size=32, patch_size=16, hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2,
        projection_dim=32)).eval()
    save_safetensors(str(tmp_path / "eval_clip_text.safetensors"),
                     {k: v.numpy() for k, v in tt.state_dict().items()})
    save_safetensors(str(tmp_path / "eval_clip_vision.safetensors"),
                     {k: v.numpy() for k, v in tv.state_dict().items()})

    from theatergen_tpu.utils.tokenizer import load_tokenizer

    # explicit tokenizer: the dir has no BPE assets, and from_weights_dir
    # refuses the silent hash-tokenizer fallback (garbage scores)
    with pytest.raises(FileNotFoundError):
        ClipEmbedder.from_weights_dir(
            str(tmp_path),
            tcfg=CLIPTextConfig(vocab_size=1024, hidden_size=32,
                                intermediate_size=64, num_layers=2,
                                num_heads=2, max_length=16,
                                projection_dim=32,
                                use_text_projection=True),
            vcfg=CLIPVisionConfig(image_size=32, patch_size=16,
                                  hidden_size=32, intermediate_size=64,
                                  num_layers=2, num_heads=2,
                                  projection_dim=32))

    emb = ClipEmbedder.from_weights_dir(
        str(tmp_path),
        tokenizer=load_tokenizer(None, 1024),
        tcfg=CLIPTextConfig(vocab_size=1024, hidden_size=32,
                            intermediate_size=64, num_layers=2, num_heads=2,
                            max_length=16, projection_dim=32,
                            use_text_projection=True),
        vcfg=CLIPVisionConfig(image_size=32, patch_size=16, hidden_size=32,
                              intermediate_size=64, num_layers=2,
                              num_heads=2, projection_dim=32))

    rng = np.random.RandomState(1)
    img = rng.rand(32, 32, 3).astype(np.float32)
    ours = emb.embed_images([img])
    mean = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
    std = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)
    timg = torch.from_numpy(
        ((img - mean) / std).transpose(2, 0, 1)[None])
    with torch.no_grad():
        theirs = tv(timg).image_embeds.numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)

    te = emb.embed_texts(["a cat", "a dog"])
    assert te.shape == (2, 32)
    assert np.isfinite(te).all()


def test_frechet_distance_properties():
    rng = np.random.RandomState(0)
    x = rng.randn(500, 8)
    y = rng.randn(500, 8)
    same = M.frechet_distance(x, x)
    near = M.frechet_distance(x, y)
    far = M.frechet_distance(x, y + 5.0)
    assert abs(same) < 1e-3
    assert near < far
    assert far > 25 * 8 * 0.9  # dominated by the mean shift ||5||² per dim


def test_sqrtm_newton_schulz():
    rng = np.random.RandomState(1)
    a = rng.randn(6, 6)
    spd = a @ a.T + 6 * np.eye(6)
    r = M._sqrtm_newton_schulz(spd)
    np.testing.assert_allclose(r @ r, spd, atol=1e-3)


def test_spatial_relation_parsing():
    assert M.parse_spatial_relation("a cat to the left of a dog") == "left"
    assert M.parse_spatial_relation("a bird above the house") == "top"
    assert M.parse_spatial_relation("a ball under the table") == "bottom"
    assert M.parse_spatial_relation("a vase in the middle of a table") == "middle"
    assert M.parse_spatial_relation("a cat and a dog") is None


def test_check_spatial():
    left_box = [0.0, 0.2, 0.3, 0.8]
    right_box = [0.6, 0.2, 0.9, 0.8]
    assert M.check_spatial("left", left_box, right_box)
    assert not M.check_spatial("left", right_box, left_box)
    assert M.check_spatial("right", right_box, left_box)
    top = [0.2, 0.0, 0.6, 0.3]
    bot = [0.2, 0.6, 0.6, 0.9]
    assert M.check_spatial("top", top, bot)
    assert M.check_spatial("bottom", bot, top)


def test_crop_bounds():
    img = np.arange(64 * 64 * 3, dtype=np.float32).reshape(64, 64, 3)
    c = M.crop(img, [0.25, 0.25, 0.75, 0.75])
    assert c.shape == (32, 32, 3)
    # degenerate box still yields at least ~8px
    c2 = M.crop(img, [0.5, 0.5, 0.5, 0.5])
    assert c2.shape[0] >= 1 and c2.shape[1] >= 1


def test_evaluate_tree_end_to_end(tmp_path):
    """Drive the full eval pipeline over a synthetic image tree."""
    from PIL import Image

    from theatergen_tpu.eval.cmig import ClipEmbedder, evaluate_tree

    dataset = {
        "d0": {
            "turn 1": {
                "caption": "a red square to the left of a blue square",
                "objects": [["a red square", [50, 150, 150, 150], 0],
                            ["a blue square", [300, 150, 150, 150], 1]],
            },
            "turn 2": {
                "caption": "the red square again",
                "objects": [["a red square", [200, 150, 150, 150], 0]],
            },
        }
    }
    rng = np.random.RandomState(0)
    for turn in ("turn 1", "turn 2"):
        d = tmp_path / "d0" / turn
        d.mkdir(parents=True)
        img = (rng.rand(64, 64, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(d / "img_0.png")

    embedder = ClipEmbedder.eval_default(jax.random.key(0), tiny=True)
    out = evaluate_tree(str(tmp_path), dataset, embedder,
                        csv_path=str(tmp_path / "scores.csv"))
    # the default detector is the CLIP sliding scorer, so every
    # detector-derived accuracy carries its provenance suffix
    assert set(out) == {"ACCS", "ATIS", "AFID", "CLIP_FD", "spatial_clipdet",
                        "attribute_clipdet", "negative_clipdet",
                        "numeracy_clipdet"}
    assert np.isfinite(out["ATIS"])
    # no InceptionV3 weights given → the reference AFID statistic is
    # explicitly absent, not silently replaced by the CLIP Fréchet
    assert np.isnan(out["AFID"])
    assert os.path.exists(tmp_path / "scores.csv")

    # validated=False marks every metric as meaningless
    out_u = evaluate_tree(str(tmp_path), dataset, embedder, validated=False)
    assert all(k.endswith("_UNVALIDATED") for k in out_u)


def test_count_instances_nms(monkeypatch):
    """Numeracy counting: distinct above-threshold boxes after NMS."""
    import jax

    from theatergen_tpu.eval.cmig import ClipEmbedder, ClipSlidingDetector

    embedder = ClipEmbedder.eval_default(jax.random.key(0), tiny=True)
    det = ClipSlidingDetector(embedder, threshold=0.5)
    # stub the scoring: two spatially distinct candidates above threshold
    cands = det.candidates
    scores = np.full(len(cands), -1.0, np.float32)
    # pick two far-apart candidate boxes
    far = [i for i in range(len(cands))
           if cands[i][0] < 0.2 or cands[i][2] > 0.8][:2]
    scores[far[0]] = 0.9
    scores[far[1]] = 0.8
    det._scores = lambda image, phrase: scores
    img = np.zeros((32, 32, 3), np.float32)
    assert det.count_instances(img, "cat") >= 1
    # overlapping duplicates suppressed: same box twice counts once
    scores2 = np.full(len(cands), -1.0, np.float32)
    scores2[far[0]] = 0.9
    det._scores = lambda image, phrase: scores2
    assert det.count_instances(img, "cat") == 1


def test_eval_spatial_reference_semantics():
    """Reference-faithful named-object spatial rules
    (eval_extra.py:51-185): relation regexes in priority order, extreme
    box picked, last-word name match, all-objects-detected gate."""
    from theatergen_tpu.eval.metrics import eval_spatial_reference

    cat = ("a grey cat", [0.1, 0.4, 0.3, 0.6])
    dog = ("a brown dog", [0.6, 0.4, 0.9, 0.6])
    # "cat to the right of dog": leftmost detection must be the dog → False
    assert eval_spatial_reference(
        [cat, dog], "a grey cat to the right of a brown dog", 2) is False
    # dog to the right of cat: leftmost is the cat → True
    assert eval_spatial_reference(
        [cat, dog], "a brown dog to the right of a grey cat", 2) is True
    # left-of: rightmost must be the named second object
    assert eval_spatial_reference(
        [cat, dog], "a grey cat to the left of a brown dog", 2) is True
    # vertical: "A to the top of B" → bottom-most is B
    top = ("a bird", [0.4, 0.1, 0.6, 0.3])
    bot = ("a fish", [0.4, 0.7, 0.6, 0.9])
    assert eval_spatial_reference(
        [top, bot], "a bird to the top of a fish", 2) is True
    assert eval_spatial_reference(
        [top, bot], "a fish to the top of a bird", 2) is False
    assert eval_spatial_reference(
        [top, bot], "a fish below a bird", 2) is True   # bird IS topmost
    assert eval_spatial_reference(
        [bot, top], "a fish below a bird", 2) is True   # order-insensitive
    assert eval_spatial_reference(
        [top, bot], "a bird below a fish", 2) is False  # topmost is bird
    # missing detection fails the turn outright
    assert eval_spatial_reference(
        [cat], "a grey cat to the left of a brown dog", 2) is False
    # middle: center distance below ~300/512
    close = [("a", [0.4, 0.4, 0.5, 0.5]), ("b", [0.5, 0.5, 0.6, 0.6])]
    assert eval_spatial_reference(
        close, "a in the middle of the room with b", 2) is True
    # no known relation → not scored
    assert eval_spatial_reference(
        [cat, dog], "a cat and a dog in a park", 2) is None


def test_evaluate_tree_inception_afid(tmp_path):
    """With a fid_embedder the AFID slot is the InceptionV3 Fréchet
    (reference eval.py:66-94), independent of the CLIP feature space."""
    from PIL import Image

    from theatergen_tpu.eval.cmig import ClipEmbedder, evaluate_tree
    from theatergen_tpu.eval.inception import InceptionEmbedder

    dataset = {
        "d0": {
            "turn 1": {"caption": "a thing",
                       "objects": [["a thing", [100, 100, 200, 200], 0]]},
            "turn 2": {"caption": "a thing again",
                       "objects": [["a thing", [150, 100, 200, 200], 0]]},
            "turn 3": {"caption": "a thing once more",
                       "objects": [["a thing", [120, 140, 200, 200], 0]]},
        }
    }
    rng = np.random.RandomState(1)
    for turn in ("turn 1", "turn 2", "turn 3"):
        d = tmp_path / "d0" / turn
        d.mkdir(parents=True)
        Image.fromarray((rng.rand(48, 48, 3) * 255).astype(np.uint8)).save(
            d / "img_0.png")

    embedder = ClipEmbedder.eval_default(jax.random.key(0), tiny=True)

    class _AlwaysDetect:
        def __call__(self, image, phrase):
            return np.array([0.2, 0.2, 0.8, 0.8]), 1.0, True

    fid = InceptionEmbedder.random_init(jax.random.key(1), size=96)
    out = evaluate_tree(str(tmp_path), dataset, embedder,
                        detector=_AlwaysDetect(), fid_embedder=fid)
    assert np.isfinite(out["AFID"])
    assert np.isfinite(out["CLIP_FD"])
    assert out["AFID"] != out["CLIP_FD"]
