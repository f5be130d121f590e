"""Full-size-config golden parity vs the installed transformers.

The tiny golden tests (test_sam_hf.py, test_gdino.py, test_torch_parity.py)
validate architecture math; these validate the ``models/weights.py`` port
mapping at the EXACT configurations real checkpoints use (random weights,
reduced image sizes where spatial extent doesn't affect the mapping) —
so the first machine with egress loads real safetensors without shape or
name drift (VERDICT r2 missing #1):

- SD1.5 CLIP ViT-L text encoder   (``generate.py:78``: runwayml UNet pipe)
- SDXL OpenCLIP bigG text enc 2   (``generate.py:103-133`` xl branch)
- IP-Adapter CLIP ViT-H image enc (``generate.py:61``, ip_adapter.py:78-80)
- eval CLIP ViT-B/32 both towers  (``CMIGBench/eval/eval.py:286``)
- SAM ViT-base                    (``models/sam.py:15-22``)
- GroundingDINO-tiny              (``generate.py:139-141``)

All slow-tier (conftest auto-marks this file).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import theatergen_tpu.models.weights as W
from theatergen_tpu.config import CLIPTextConfig, CLIPVisionConfig
from theatergen_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder

transformers = pytest.importorskip("transformers")
import torch  # noqa: E402


def _randomize(model, scale=0.03):
    torch.manual_seed(0)
    with torch.no_grad():
        for p in model.parameters():
            p.uniform_(-scale, scale)
    return model.eval()


def test_sd15_clip_vitl_text_fullsize():
    """runwayml/stable-diffusion-v1-5 text_encoder config: ViT-L/14."""
    from transformers import CLIPTextConfig as HFText
    from transformers import CLIPTextModel

    hf = _randomize(CLIPTextModel(HFText(
        vocab_size=49408, hidden_size=768, intermediate_size=3072,
        num_hidden_layers=12, num_attention_heads=12,
        max_position_embeddings=77, hidden_act="quick_gelu",
        attn_implementation="eager")))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = W.port_clip_text(sd)

    cfg = CLIPTextConfig()  # SD1.5 defaults
    ids = np.zeros((2, 77), np.int64)
    ids[0, :5] = [49406, 320, 1125, 525, 49407]
    ids[1, :3] = [49406, 2368, 49407]
    h, p = CLIPTextEncoder(cfg).apply({"params": params},
                                      jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        t = hf(input_ids=torch.from_numpy(ids))
    np.testing.assert_allclose(np.asarray(h), t.last_hidden_state.numpy(),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(p), t.pooler_output.numpy(),
                               atol=2e-4)


@pytest.mark.parametrize("name,vcfg,hf_kw", [
    ("vit_h14_ip", CLIPVisionConfig(), dict(
        hidden_size=1280, intermediate_size=5120, num_hidden_layers=32,
        num_attention_heads=16, image_size=224, patch_size=14,
        projection_dim=1024)),
    ("vit_b32_eval", CLIPVisionConfig.vit_b32(), dict(
        hidden_size=768, intermediate_size=3072, num_hidden_layers=12,
        num_attention_heads=12, image_size=224, patch_size=32,
        projection_dim=512)),
])
def test_clip_vision_fullsize(name, vcfg, hf_kw):
    from transformers import CLIPVisionConfig as HFVision
    from transformers import CLIPVisionModelWithProjection

    hf = _randomize(CLIPVisionModelWithProjection(HFVision(
        hidden_act="quick_gelu", attn_implementation="eager", **hf_kw)))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = W.port_clip_vision(sd)

    rng = np.random.RandomState(0)
    pix = rng.randn(1, vcfg.image_size, vcfg.image_size, 3).astype(np.float32)
    embeds, pooled, penult = CLIPVisionEncoder(vcfg).apply(
        {"params": params}, jnp.asarray(pix))
    with torch.no_grad():
        t = hf(pixel_values=torch.from_numpy(pix.transpose(0, 3, 1, 2)),
               output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(embeds),
                               t.image_embeds.numpy(), atol=5e-4)
    # penultimate tokens feed the IP-Adapter-Plus Resampler
    # (ip_adapter/ip_adapter.py:284-299 uses hidden_states[-2])
    np.testing.assert_allclose(np.asarray(penult),
                               t.hidden_states[-2].numpy(), atol=5e-4)


def test_eval_clip_b32_text_fullsize():
    """openai/clip-vit-base-patch32 text tower WITH projection (the eval
    embedder pairs it with the b32 vision tower)."""
    from transformers import CLIPTextConfig as HFText
    from transformers import CLIPTextModelWithProjection

    hf = _randomize(CLIPTextModelWithProjection(HFText(
        vocab_size=49408, hidden_size=512, intermediate_size=2048,
        num_hidden_layers=12, num_attention_heads=8,
        max_position_embeddings=77, projection_dim=512,
        hidden_act="quick_gelu", attn_implementation="eager")))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = W.port_clip_text(sd)

    cfg = CLIPTextConfig(hidden_size=512, intermediate_size=2048,
                         num_heads=8, projection_dim=512,
                         use_text_projection=True)
    ids = np.zeros((1, 77), np.int64)
    ids[0, :6] = [49406, 320, 2368, 530, 533, 49407]
    _, p = CLIPTextEncoder(cfg).apply({"params": params},
                                      jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        t = hf(input_ids=torch.from_numpy(ids))
    np.testing.assert_allclose(np.asarray(p), t.text_embeds.numpy(),
                               atol=2e-4)


def test_sdxl_clip_bigg_text_fullsize():
    """SDXL text_encoder_2 (laion OpenCLIP bigG in HF CLIP format,
    ``sdxl_config().text2``): hidden 1280, 32 layers, gelu, WITH
    projection — SDXL conditions on both the penultimate hidden state
    and the projected pooled embed."""
    from transformers import CLIPTextConfig as HFText
    from transformers import CLIPTextModelWithProjection

    hf = _randomize(CLIPTextModelWithProjection(HFText(
        vocab_size=49408, hidden_size=1280, intermediate_size=5120,
        num_hidden_layers=32, num_attention_heads=20,
        max_position_embeddings=77, projection_dim=1280,
        hidden_act="gelu", attn_implementation="eager")))
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = W.port_clip_text(sd)

    from theatergen_tpu.config import sdxl_config

    cfg = sdxl_config().text2
    ids = np.zeros((2, 77), np.int64)
    ids[0, :6] = [49406, 320, 2368, 530, 533, 49407]
    ids[1, :3] = [49406, 1125, 49407]
    h, p = CLIPTextEncoder(cfg).apply({"params": params},
                                      jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        t = hf(input_ids=torch.from_numpy(ids), output_hidden_states=True)
    np.testing.assert_allclose(np.asarray(p), t.text_embeds.numpy(),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(h), t.last_hidden_state.numpy(),
                               atol=5e-4)


def test_sam_vit_base_fullsize():
    """facebook/sam-vit-base dims; image_size 256 (the 1024 default only
    scales the pos-embed grid the port resizes anyway)."""
    import dataclasses

    from transformers import SamConfig, SamModel
    from transformers.models.sam.configuration_sam import (
        SamMaskDecoderConfig, SamPromptEncoderConfig, SamVisionConfig,
    )

    from theatergen_tpu.perception.sam_hf import SamHF, SamHFConfig, preprocess

    cfg = dataclasses.replace(SamHFConfig(), image_size=256)
    hf_cfg = SamConfig(
        vision_config=SamVisionConfig(
            hidden_size=cfg.hidden_size, num_hidden_layers=cfg.num_layers,
            num_attention_heads=cfg.num_heads, image_size=cfg.image_size,
            patch_size=cfg.patch_size, window_size=cfg.window_size,
            global_attn_indexes=list(cfg.global_attn_indexes),
            output_channels=cfg.output_channels,
            num_pos_feats=cfg.num_pos_feats),
        prompt_encoder_config=SamPromptEncoderConfig(
            hidden_size=cfg.prompt_hidden_size, image_size=cfg.image_size,
            patch_size=cfg.patch_size,
            mask_input_channels=cfg.mask_input_channels),
        mask_decoder_config=SamMaskDecoderConfig(
            hidden_size=cfg.decoder_hidden_size,
            num_attention_heads=cfg.decoder_num_heads,
            mlp_dim=cfg.decoder_mlp_dim),
        attn_implementation="eager")
    torch.manual_seed(0)
    tm = SamModel(hf_cfg)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.03, 0.03)
        tm.shared_image_embedding.positional_embedding.normal_(0.0, 1.0)
        tm._tie_weights()
    tm.eval()

    params = W.port_sam({k: v.numpy() for k, v in tm.state_dict().items()})
    rng = np.random.RandomState(1)
    img01 = rng.rand(1, cfg.image_size, cfg.image_size, 3).astype(np.float32)
    pixels = np.asarray(preprocess(img01))
    boxes = np.array([[[20.0, 30.0, 180.0, 220.0]]], np.float32)
    with torch.no_grad():
        t = tm(pixel_values=torch.from_numpy(pixels.transpose(0, 3, 1, 2)),
               input_boxes=torch.from_numpy(boxes))
    j_masks, j_iou = SamHF(cfg).apply({"params": params}, pixels, boxes)
    np.testing.assert_allclose(np.asarray(j_iou), t.iou_scores.numpy(),
                               atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(j_masks), t.pred_masks.numpy(),
                               atol=2e-3, rtol=1e-2)


def test_gdino_tiny_checkpoint_config_reduced_image():
    """IDEA-Research/grounding-dino-tiny REAL dims (Swin-T backbone,
    BERT-base text, d_model 256, 6+6 layers, 900 queries) at image_size
    224 — the mapping sees every real channel/layer shape."""
    import dataclasses

    from transformers import GroundingDinoForObjectDetection
    from transformers.models.grounding_dino.configuration_grounding_dino import (
        GroundingDinoConfig as HFGDConfig,
    )

    from theatergen_tpu.perception.gdino import (
        GroundingDinoConfig, GroundingDinoForDetection, prepare_text_inputs,
    )

    # 224 is the smallest square where the multi-level proposal count
    # (1045) still covers the real 900 queries' top-k
    cfg = dataclasses.replace(
        GroundingDinoConfig(),
        image_size=224,
        swin=dataclasses.replace(GroundingDinoConfig().swin, image_size=224),
    )
    hf_cfg = HFGDConfig(
        backbone_config={
            "model_type": "swin", "image_size": 224,
            "patch_size": cfg.swin.patch_size,
            "embed_dim": cfg.swin.embed_dim,
            "depths": list(cfg.swin.depths),
            "num_heads": list(cfg.swin.num_heads),
            "window_size": cfg.swin.window_size,
            "out_indices": list(cfg.swin.out_stages),
        },
        text_config={
            "model_type": "bert", "vocab_size": cfg.bert.vocab_size,
            "hidden_size": cfg.bert.hidden_size,
            "num_hidden_layers": cfg.bert.num_layers,
            "num_attention_heads": cfg.bert.num_heads,
            "intermediate_size": cfg.bert.intermediate_size,
            "max_position_embeddings": cfg.bert.max_position_embeddings,
        },
        d_model=cfg.d_model, num_queries=cfg.num_queries,
        encoder_layers=cfg.encoder_layers, decoder_layers=cfg.decoder_layers,
        encoder_attention_heads=cfg.encoder_attention_heads,
        decoder_attention_heads=cfg.decoder_attention_heads,
        encoder_ffn_dim=cfg.encoder_ffn_dim,
        decoder_ffn_dim=cfg.decoder_ffn_dim,
        num_feature_levels=cfg.num_feature_levels,
        max_text_len=cfg.max_text_len,
        attn_implementation="eager")
    torch.manual_seed(0)
    tm = GroundingDinoForObjectDetection(hf_cfg)
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.02, 0.02)
        tm.tie_weights()
    tm.eval()

    params = W.port_grounding_dino(
        {k: v.numpy() for k, v in tm.state_dict().items()})
    ids = np.array([[101, 1037, 2417, 5810, 1012, 102]], np.int64)
    rng = np.random.RandomState(2)
    pix = rng.randn(1, 224, 224, 3).astype(np.float32) * 0.5
    self_mask, pos = prepare_text_inputs(ids)
    j_logits, j_boxes = GroundingDinoForDetection(cfg).apply(
        {"params": params}, jnp.asarray(pix), jnp.asarray(ids),
        jnp.asarray(self_mask), jnp.asarray(pos))
    with torch.no_grad():
        t = tm(pixel_values=torch.from_numpy(
                   pix.transpose(0, 3, 1, 2)).contiguous(),
               input_ids=torch.from_numpy(ids))
    jb, tb = np.asarray(j_boxes)[0], t.pred_boxes.numpy()[0]
    jl, tl = np.asarray(j_logits)[0], t.logits.numpy()[0]
    # Random weights leave hundreds of proposals near-tied at the top-900
    # cutoff, so torch and XLA select/order slightly different query SETS
    # (fp accumulation-order ties) — compare permutation-robustly:
    # (a) every torch box has a matching flax box (set equality)
    d = np.abs(tb[:, None, :] - jb[None, :, :]).max(-1)   # [Q, Q]
    nn = d.min(1)
    assert np.percentile(nn, 95) < 1e-3, np.percentile(nn, 95)
    assert nn.mean() < 5e-3, nn.mean()
    # (b) the detection the backend actually consumes — the max-logit
    # query — agrees exactly in box and score
    jq, tq = jl.max(-1).argmax(), tl.max(-1).argmax()
    np.testing.assert_allclose(jb[jq], tb[tq], atol=1e-5)
    np.testing.assert_allclose(jl.max(), tl.max(), atol=1e-5)
