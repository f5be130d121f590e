"""Golden tests: checkpoint-faithful SAM port vs transformers' SamModel.

A tiny random torch ``SamModel`` state dict is ported through
``models/weights.py::port_sam`` and the flax ``SamHF`` must reproduce the
torch outputs — validating both the architecture math (windowed attention,
decomposed rel-pos, two-way decoder, upscaling) and the checkpoint name
mapping, the same strategy as tests/test_torch_parity.py (SURVEY §4b).
"""

import numpy as np
import pytest
import torch

from theatergen_tpu.models.weights import port_sam
from theatergen_tpu.perception.sam_hf import (
    SamHF, SamVisionEncoder, preprocess, tiny_sam_hf_config,
)

transformers = pytest.importorskip("transformers")
from transformers import SamConfig, SamModel  # noqa: E402
from transformers.models.sam.configuration_sam import (  # noqa: E402
    SamMaskDecoderConfig, SamPromptEncoderConfig, SamVisionConfig,
)

CFG = tiny_sam_hf_config()


def torch_tiny_sam() -> SamModel:
    cfg = SamConfig(
        vision_config=SamVisionConfig(
            hidden_size=CFG.hidden_size,
            num_hidden_layers=CFG.num_layers,
            num_attention_heads=CFG.num_heads,
            image_size=CFG.image_size,
            patch_size=CFG.patch_size,
            window_size=CFG.window_size,
            global_attn_indexes=list(CFG.global_attn_indexes),
            output_channels=CFG.output_channels,
            num_pos_feats=CFG.num_pos_feats,
        ),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=CFG.prompt_hidden_size,
            image_size=CFG.image_size,
            patch_size=CFG.patch_size,
            mask_input_channels=CFG.mask_input_channels,
        ),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=CFG.decoder_hidden_size,
            num_attention_heads=CFG.decoder_num_heads,
            mlp_dim=CFG.decoder_mlp_dim,
            iou_head_hidden_dim=CFG.iou_head_hidden_dim,
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = SamModel(cfg)
    # _init_weights zeroes rel-pos/pos-embed; randomize everything so the
    # parity test actually exercises those terms.
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-0.08, 0.08)
        model.shared_image_embedding.positional_embedding.normal_(0.0, 1.0)
        model._tie_weights()
    return model.eval()


@pytest.fixture(scope="module")
def pair():
    tm = torch_tiny_sam()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = port_sam(sd)
    return tm, params


def test_port_covers_all_leaves(pair):
    import jax

    _, params = pair
    jm = SamHF(CFG)
    ref = jm.init(jax.random.key(0),
                  np.zeros((1, CFG.image_size, CFG.image_size, 3), np.float32),
                  np.zeros((1, 1, 4), np.float32))["params"]
    ref_paths = {"/".join(str(k.key) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(ref)[0]}
    got_paths = {"/".join(str(k.key) for k in p)
                 for p, _ in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert got_paths == ref_paths, (
        sorted(ref_paths - got_paths), sorted(got_paths - ref_paths))
    # shapes must agree leaf-by-leaf
    for path, leaf in jax.tree_util.tree_flatten_with_path(ref)[0]:
        node = params
        for k in path:
            node = node[k.key]
        assert node.shape == leaf.shape, (path, node.shape, leaf.shape)


def test_vision_encoder_parity(pair):
    tm, params = pair
    rng = np.random.RandomState(1)
    img01 = rng.rand(2, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    pixels = np.asarray(preprocess(img01))

    with torch.no_grad():
        t_out = tm.vision_encoder(
            torch.from_numpy(pixels.transpose(0, 3, 1, 2))
        ).last_hidden_state.numpy()       # [B, C, g, g]

    j_out = SamVisionEncoder(CFG).apply(
        {"params": params["vision_encoder"]}, pixels)
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, atol=2e-5, rtol=1e-4)


def test_full_forward_parity(pair):
    tm, params = pair
    rng = np.random.RandomState(2)
    img01 = rng.rand(1, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    pixels = np.asarray(preprocess(img01))
    boxes = np.array([[[4.0, 6.0, 40.0, 50.0],
                       [10.0, 12.0, 30.0, 44.0]]], np.float32)

    with torch.no_grad():
        t = tm(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
               input_boxes=torch.from_numpy(boxes))
    t_masks = t.pred_masks.numpy()        # [1, 2, 3, 4g, 4g]
    t_iou = t.iou_scores.numpy()          # [1, 2, 3]

    j_masks, j_iou = SamHF(CFG).apply({"params": params}, pixels, boxes)
    np.testing.assert_allclose(np.asarray(j_iou), t_iou, atol=3e-5, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(j_masks), t_masks,
                               atol=5e-4, rtol=1e-3)


def test_single_mask_output(pair):
    _, params = pair
    rng = np.random.RandomState(3)
    img01 = rng.rand(1, CFG.image_size, CFG.image_size, 3).astype(np.float32)
    boxes = np.array([[[8.0, 8.0, 56.0, 56.0]]], np.float32)
    masks, iou = SamHF(CFG).apply(
        {"params": params}, np.asarray(preprocess(img01)), boxes,
        multimask=False)
    g = CFG.grid_size
    assert masks.shape == (1, 1, 1, 4 * g, 4 * g)
    assert iou.shape == (1, 1, 1)
