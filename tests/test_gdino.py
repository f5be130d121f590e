"""Golden tests: GroundingDINO port vs transformers, tiny random configs.

Same strategy as tests/test_sam_hf.py: a tiny random torch
``GroundingDinoForObjectDetection`` state dict ports through
``models/weights.py::port_grounding_dino`` and the flax
``GroundingDinoForDetection`` must reproduce the torch logits/boxes —
covering the Swin backbone, BERT tower, deformable attention (grid-sample
parity), fusion/enhancer encoder, query selection, and decoder refinement.
"""

import numpy as np
import pytest
import torch

from theatergen_tpu.models.weights import port_grounding_dino
from theatergen_tpu.perception.gdino import (
    GroundingDinoForDetection, prepare_text_inputs, tiny_gdino_config,
)
from theatergen_tpu.perception.swin import SwinBackbone

transformers = pytest.importorskip("transformers")
from transformers import GroundingDinoForObjectDetection  # noqa: E402
from transformers.models.grounding_dino.configuration_grounding_dino import (  # noqa: E402
    GroundingDinoConfig,
)
from transformers.models.grounding_dino.modeling_grounding_dino import (  # noqa: E402
    generate_masks_with_special_tokens_and_transfer_map,
)

CFG = tiny_gdino_config()
# "[CLS] w w . w w w . [SEP]"-shaped prompt over the tiny vocab
INPUT_IDS = np.array([[101, 5, 6, 1012, 7, 8, 9, 1012, 102]], np.int64)


def torch_tiny_gdino() -> GroundingDinoForObjectDetection:
    cfg = GroundingDinoConfig(
        backbone_config={
            "model_type": "swin",
            "image_size": CFG.swin.image_size,
            "patch_size": CFG.swin.patch_size,
            "embed_dim": CFG.swin.embed_dim,
            "depths": list(CFG.swin.depths),
            "num_heads": list(CFG.swin.num_heads),
            "window_size": CFG.swin.window_size,
            "out_indices": list(CFG.swin.out_stages),
        },
        text_config={
            "model_type": "bert",
            "vocab_size": CFG.bert.vocab_size,
            "hidden_size": CFG.bert.hidden_size,
            "num_hidden_layers": CFG.bert.num_layers,
            "num_attention_heads": CFG.bert.num_heads,
            "intermediate_size": CFG.bert.intermediate_size,
            "max_position_embeddings": CFG.bert.max_position_embeddings,
        },
        d_model=CFG.d_model,
        num_queries=CFG.num_queries,
        encoder_layers=CFG.encoder_layers,
        decoder_layers=CFG.decoder_layers,
        encoder_attention_heads=CFG.encoder_attention_heads,
        decoder_attention_heads=CFG.decoder_attention_heads,
        encoder_ffn_dim=CFG.encoder_ffn_dim,
        decoder_ffn_dim=CFG.decoder_ffn_dim,
        num_feature_levels=CFG.num_feature_levels,
        max_text_len=CFG.max_text_len,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = GroundingDinoForObjectDetection(cfg)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.08, 0.08)
        model.tie_weights()
    return model.eval()


@pytest.fixture(scope="module")
def pair():
    tm = torch_tiny_gdino()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = port_grounding_dino(sd)
    return tm, params


def test_text_mask_parity():
    t_mask, t_pos = generate_masks_with_special_tokens_and_transfer_map(
        torch.from_numpy(INPUT_IDS))
    j_mask, j_pos = prepare_text_inputs(INPUT_IDS)
    np.testing.assert_array_equal(j_mask, t_mask.numpy())
    np.testing.assert_array_equal(j_pos, t_pos.numpy())


def test_port_covers_all_leaves(pair):
    import jax

    _, params = pair
    jm = GroundingDinoForDetection(CFG)
    mask, pos = prepare_text_inputs(INPUT_IDS)
    ref = jm.init(
        jax.random.key(0),
        np.zeros((1, CFG.image_size, CFG.image_size, 3), np.float32),
        INPUT_IDS, mask, pos)["params"]
    ref_paths = {"/".join(str(k.key) for k in p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {"/".join(str(k.key) for k in p): v.shape
                 for p, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert set(got_paths) == set(ref_paths), (
        sorted(set(ref_paths) - set(got_paths))[:8],
        sorted(set(got_paths) - set(ref_paths))[:8])
    for k in ref_paths:
        assert got_paths[k] == ref_paths[k], (k, got_paths[k], ref_paths[k])


def test_swin_backbone_parity(pair):
    tm, params = pair
    rng = np.random.RandomState(1)
    pixels = rng.randn(1, CFG.image_size, CFG.image_size, 3).astype(
        np.float32) * 0.5

    with torch.no_grad():
        t_maps = tm.model.backbone.conv_encoder.model(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))).feature_maps

    j_maps = SwinBackbone(CFG.swin).apply(
        {"params": params["backbone"]}, pixels)
    assert len(j_maps) == len(t_maps)
    for jm_, tm_ in zip(j_maps, t_maps):
        np.testing.assert_allclose(
            np.asarray(jm_).transpose(0, 3, 1, 2), tm_.numpy(),
            atol=3e-5, rtol=1e-4)


def test_full_forward_parity(pair):
    tm, params = pair
    rng = np.random.RandomState(2)
    pixels = rng.randn(1, CFG.image_size, CFG.image_size, 3).astype(
        np.float32) * 0.5
    ids = torch.from_numpy(INPUT_IDS)

    with torch.no_grad():
        t_out = tm(pixel_values=torch.from_numpy(
            pixels.transpose(0, 3, 1, 2)), input_ids=ids)
    t_logits = t_out.logits.numpy()          # [1, Q, max_text_len]
    t_boxes = t_out.pred_boxes.numpy()       # [1, Q, 4]

    mask, pos = prepare_text_inputs(INPUT_IDS)
    j_logits, j_boxes = GroundingDinoForDetection(CFG).apply(
        {"params": params}, pixels, INPUT_IDS, mask, pos)
    j_logits = np.asarray(j_logits)
    j_boxes = np.asarray(j_boxes)

    # -inf padding columns must agree exactly
    finite = np.isfinite(t_logits)
    np.testing.assert_array_equal(np.isfinite(j_logits), finite)
    np.testing.assert_allclose(j_logits[finite], t_logits[finite],
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(j_boxes, t_boxes, atol=2e-4, rtol=1e-3)


def test_level_shapes_track_ceil_merging():
    """Patch merging pads odd resolutions up — level_shapes must agree
    with the actual backbone output shapes (regression: floor-division
    shapes broke odd intermediate sizes)."""
    import dataclasses

    import jax

    from theatergen_tpu.perception.gdino import GroundingDinoConfig
    from theatergen_tpu.perception.swin import SwinConfig

    swin = SwinConfig(image_size=72, patch_size=4, embed_dim=8,
                      depths=(1, 1, 1), num_heads=(2, 2, 2), window_size=4,
                      out_stages=(1, 2, 3))
    cfg = dataclasses.replace(tiny_gdino_config(), swin=swin, image_size=72,
                              num_feature_levels=4)
    # 72/4 = 18 → 9 → ceil(9/2) = 5; extra conv level ceil(5/2) = 3
    assert cfg.level_shapes == ((18, 18), (9, 9), (5, 5), (3, 3))

    maps = SwinBackbone(swin).apply(
        {"params": SwinBackbone(swin).init(
            jax.random.key(0), np.zeros((1, 72, 72, 3), np.float32)
        )["params"]},
        np.zeros((1, 72, 72, 3), np.float32))
    got = tuple((m.shape[1], m.shape[2]) for m in maps)
    assert got == cfg.level_shapes[:3]


def test_position_net_fourier_ordering():
    """Box Fourier features follow GLIGEN's (freq, sin|cos, coord) layout
    so ported position_net weights line up (regression: coord-major
    ordering was a silent permutation)."""
    import torch

    from theatergen_tpu.models.ip_adapter import PositionNet

    def torch_fourier(boxes, num_freqs=8):
        emb = 100 ** (torch.arange(num_freqs) / num_freqs)
        emb = emb[None, None, None] * boxes.unsqueeze(-1)
        emb = torch.stack((emb.sin(), emb.cos()), dim=-1)
        return emb.permute(0, 1, 3, 4, 2).reshape(
            boxes.shape[0], boxes.shape[1], num_freqs * 2 * 4)

    import jax
    import jax.numpy as jnp

    boxes = np.array([[[0.1, 0.2, 0.7, 0.9]]], np.float32)
    ref = torch_fourier(torch.from_numpy(boxes)).numpy()   # [1, 1, 64]

    # make linears_0 a slice-selector (identity over the xyxy features,
    # zero over the phrase slice) and read its captured output: it equals
    # the module's internal fourier layout exactly
    net = PositionNet(out_dim=8, text_dim=4, fourier_freqs=8)
    params = net.init(jax.random.key(0), boxes, np.ones((1, 1), np.float32),
                      np.zeros((1, 1, 4), np.float32))["params"]
    k = np.zeros((4 + 64, 512), np.float32)
    k[4:, :64] = np.eye(64)
    params = dict(params)
    params["linears_0"] = {"kernel": jnp.asarray(k), "bias": jnp.zeros(512)}
    _, inter = net.apply({"params": params}, jnp.asarray(boxes),
                         jnp.ones((1, 1)), jnp.zeros((1, 1, 4)),
                         capture_intermediates=True)
    dense_out = np.asarray(
        inter["intermediates"]["linears_0"]["__call__"][0])
    np.testing.assert_allclose(dense_out[..., :64], ref,
                               atol=1e-5, rtol=1e-5)


def test_wordpiece_matches_bert_tokenizer(tmp_path):
    from transformers import BertTokenizer

    from theatergen_tpu.perception.gdino import WordPieceTokenizer

    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", ".", ",", "a", "cat",
             "knight", "drag", "##on", "fore", "##st", "in", "the"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    theirs = BertTokenizer(str(path), do_lower_case=True)
    ours = WordPieceTokenizer(str(path))
    for text in ["a cat.", "A DRAGON in the forest.", "the knight,",
                 "zebra."]:
        assert ours.encode(text) == theirs.encode(text), text


def test_detector_backend(pair, tmp_path):
    """Backend end-to-end on the tiny model: Detection contract + one
    compiled shape across phrases."""
    from theatergen_tpu.perception.gdino import (
        GroundingDinoBackend, WordPieceTokenizer,
    )

    _, params = pair
    vocab = ["[PAD]"] + [f"t{i}" for i in range(1, 100)] + ["[UNK]", "[CLS]",
                                                            "[SEP]"]
    vocab += [f"u{i}" for i in range(len(vocab), 1012)] + ["."] + \
        [f"v{i}" for i in range(1013, 1029)] + ["?"]
    vocab += ["cat", "dog"]
    path = tmp_path / "vocab.txt"
    path.write_text("\n".join(vocab) + "\n")
    tok = WordPieceTokenizer(str(path))
    assert tok.cls == 101 and tok.sep == 102 and tok.vocab["."] == 1012

    backend = GroundingDinoBackend(CFG, params, tok)
    rng = np.random.RandomState(3)
    img = rng.rand(48, 48, 3).astype(np.float32)   # non-native size → resize
    det = backend(img, "cat")
    box = np.asarray(det.box)
    assert box.shape == (4,)
    assert (box >= 0).all() and (box <= 1).all()
    assert np.isfinite(float(det.confidence))
    det2 = backend(img, "dog cat")   # longer phrase, same compiled shape
    assert np.asarray(det2.box).shape == (4,)

    # batched detection (one forward for the whole character batch) must
    # reproduce the per-image path exactly
    import jax.numpy as jnp

    img2 = rng.rand(48, 48, 3).astype(np.float32)
    batch = backend.detect_batch(jnp.stack([jnp.asarray(img),
                                            jnp.asarray(img2)]),
                                 ["cat", "dog cat"])
    assert np.asarray(batch.box).shape == (2, 4)
    d2 = backend(img2, "dog cat")
    np.testing.assert_allclose(np.asarray(batch.box[0]),
                               np.asarray(det.box), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch.box[1]),
                               np.asarray(d2.box), atol=1e-5)
    np.testing.assert_allclose(np.asarray(batch.confidence),
                               [float(det.confidence),
                                float(d2.confidence)], atol=1e-5)
    assert (np.asarray(batch.ok)
            == [bool(det.ok), bool(d2.ok)]).all()
