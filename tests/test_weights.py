"""Checkpoint porting: round-trip our param trees through synthetic
diffusers-shaped state dicts and verify structural + numeric identity."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.models import weights as W
from theatergen_tpu.models.clip import CLIPTextEncoder
from theatergen_tpu.models.unet import UNet2DCondition
from theatergen_tpu.models.vae import AutoencoderKL


CFG = tiny_config()


def flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(flatten(v, prefix + (k,)))
        else:
            out["/".join(prefix + (k,))] = np.asarray(v)
    return out


def unet_path_to_diffusers(path: str, arr: np.ndarray):
    """Inverse of weights.port_unet's name mapping (test-only)."""
    p = path
    p = re.sub(r"^encoder/", "", p)
    p = re.sub(r"^mid/", "", p)
    p = re.sub(r"mid_block_(resnets|attentions)_(\d+)", r"mid_block.\1.\2", p)
    p = re.sub(r"(down|up)_blocks_(\d+)_(resnets|attentions|downsamplers|upsamplers)_(\d+)",
               r"\1_blocks.\2.\3.\4", p)
    p = re.sub(r"transformer_blocks_(\d+)", r"transformer_blocks.\1", p)
    p = p.replace("/norm/scale", ".weight").replace("/norm/bias", ".bias")
    p = p.replace("net_0/proj", "net.0.proj").replace("net_2", "net.2")
    p = p.replace("ff/", "ff.")
    p = p.replace("to_out_0", "to_out.0")
    p = re.sub(r"(attn\d)/", r"\1.", p)
    p = p.replace("/kernel", ".weight").replace("/bias", ".bias")
    p = p.replace("/scale", ".weight")
    p = p.replace("/", ".")

    if arr.ndim == 4:  # conv kernel flax [kh,kw,I,O] → torch [O,I,kh,kw]
        if "proj_in" in p or "proj_out" in p:
            # SD1.5 stores these as 1×1 convs
            return p, np.transpose(arr, (3, 2, 0, 1))
        return p, np.transpose(arr, (3, 2, 0, 1))
    if (arr.ndim == 2 and p.endswith(".weight")
            and "token_embedding" not in p and "position_embedding" not in p):
        return p, np.transpose(arr)
    return p, arr


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet2DCondition(CFG.unet)
    params = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, CFG.text.max_length, CFG.unet.cross_attention_dim)),
    )["params"]
    return unet, params


def test_port_unet_round_trip(unet_and_params):
    unet, params = unet_and_params
    flat = flatten(params)
    sd = {}
    for path, arr in flat.items():
        name, t = unet_path_to_diffusers(path, arr)
        sd[name] = t
    ported = W.port_unet(sd)
    flat_ported = flatten(ported)
    missing = set(flat) - set(flat_ported)
    extra = set(flat_ported) - set(flat)
    assert not missing, f"missing after port: {sorted(missing)[:8]}"
    assert not extra, f"extra after port: {sorted(extra)[:8]}"
    for k in flat:
        np.testing.assert_allclose(flat_ported[k], flat[k], rtol=1e-6,
                                   err_msg=k)
    # the ported tree must actually run
    out = unet.apply(
        {"params": ported}, jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, CFG.text.max_length, CFG.unet.cross_attention_dim)),
    )
    assert out.shape == (1, 8, 8, 4)


def test_port_vae_round_trip():
    vae = AutoencoderKL(CFG.vae)
    img = jnp.zeros((1, 16, 16, 3))
    params = vae.init(jax.random.key(0), img)["params"]
    flat = flatten(params)
    sd = {}
    for path, arr in flat.items():
        p = path
        p = re.sub(r"(down|up)_blocks_(\d+)_(resnets|downsamplers|upsamplers)_(\d+)",
                   r"\1_blocks.\2.\3.\4", p)
        p = re.sub(r"mid_(resnets|attentions)_(\d+)", r"mid_block.\1.\2", p)
        p = p.replace("/norm/scale", ".weight").replace("/norm/bias", ".bias")
        p = p.replace("to_out_0", "to_out.0")
        p = p.replace("/kernel", ".weight").replace("/bias", ".bias")
        p = p.replace("/scale", ".weight")
        p = p.replace("encoder/quant_conv", "quant_conv")
        p = p.replace("decoder/post_quant_conv", "post_quant_conv")
        p = p.replace("/", ".")
        if arr.ndim == 4:
            arr = np.transpose(arr, (3, 2, 0, 1))
        elif arr.ndim == 2 and p.endswith(".weight"):
            arr = np.transpose(arr)
        sd[p] = arr
    ported = W.port_vae(sd)
    flat_ported = flatten(ported)
    assert set(flat_ported) == set(flat), (
        sorted(set(flat) - set(flat_ported))[:8],
        sorted(set(flat_ported) - set(flat))[:8])
    for k in flat:
        np.testing.assert_allclose(flat_ported[k], flat[k], rtol=1e-6,
                                   err_msg=k)


def test_port_clip_text_round_trip():
    enc = CLIPTextEncoder(CFG.text)
    params = enc.init(jax.random.key(0),
                      jnp.zeros((1, 16), jnp.int32))["params"]
    flat = flatten(params)
    sd = {}
    for path, arr in flat.items():
        if path == "token_embedding/embedding":
            sd["text_model.embeddings.token_embedding.weight"] = arr
            continue
        if path == "position_embedding":
            sd["text_model.embeddings.position_embedding.weight"] = arr
            continue
        p = path
        p = re.sub(r"layers_(\d+)", r"encoder.layers.\1", p)
        p = p.replace("self_attn/", "self_attn.").replace("mlp/", "mlp.")
        p = p.replace("/kernel", ".weight").replace("/bias", ".bias")
        p = p.replace("/scale", ".weight")
        p = p.replace("/", ".")
        p = "text_model." + p
        if arr.ndim == 2 and p.endswith(".weight"):
            arr = np.transpose(arr)
        sd[p] = arr
    ported = W.port_clip_text(sd)
    flat_ported = flatten(ported)
    assert set(flat_ported) == set(flat), (
        sorted(set(flat) - set(flat_ported))[:8],
        sorted(set(flat_ported) - set(flat))[:8])
    for k in flat:
        np.testing.assert_allclose(flat_ported[k], flat[k], rtol=1e-6,
                                   err_msg=k)


def test_port_ip_adapter_installs_weights():
    import dataclasses as dc

    ip_cfg = dc.replace(CFG.unet, ip_num_tokens=4)
    unet = UNet2DCondition(ip_cfg)
    ctx_len = CFG.text.max_length + 4
    params = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, ctx_len, CFG.unet.cross_attention_dim)),
    )["params"]
    paths = W.cross_attention_paths(params)
    assert len(paths) > 0
    # build the reference-style group: indices 2i+1 over processors
    inner = CFG.unet.num_attention_heads * (
        CFG.unet.block_out_channels[0] // CFG.unet.num_attention_heads)
    sd = {}
    rng = np.random.RandomState(0)
    for i, path in enumerate(paths):
        node = params
        for p in path:
            node = node[p]
        d_in = node["to_k_ip"]["kernel"].shape[0]
        d_out = node["to_k_ip"]["kernel"].shape[1]
        sd[f"{2 * i + 1}.to_k_ip.weight"] = rng.randn(d_out, d_in).astype(np.float32)
        sd[f"{2 * i + 1}.to_v_ip.weight"] = rng.randn(d_out, d_in).astype(np.float32)
    new_params = W.port_ip_adapter(sd, params)
    node = new_params
    for p in paths[0]:
        node = node[p]
    np.testing.assert_allclose(
        node["to_k_ip"]["kernel"], sd["1.to_k_ip.weight"].T, rtol=1e-6)
    # untouched leaves stay identical
    f_old, f_new = flatten(params), flatten(new_params)
    changed = [k for k in f_old
               if not np.array_equal(f_old[k], f_new[k])]
    assert all("to_k_ip" in c or "to_v_ip" in c for c in changed)
    assert len(changed) == 2 * len(paths)


def test_port_image_proj():
    from theatergen_tpu.models.ip_adapter import ImageProjModel

    proj = ImageProjModel(CFG.ip_adapter)
    params = proj.init(jax.random.key(0),
                       jnp.zeros((1, CFG.ip_adapter.clip_embeddings_dim)))["params"]
    rng = np.random.RandomState(0)
    d_out = CFG.ip_adapter.cross_attention_dim * CFG.ip_adapter.num_tokens
    sd = {
        "image_proj.proj.weight": rng.randn(
            d_out, CFG.ip_adapter.clip_embeddings_dim).astype(np.float32),
        "image_proj.proj.bias": rng.randn(d_out).astype(np.float32),
        "image_proj.norm.weight": np.ones(
            CFG.ip_adapter.cross_attention_dim, np.float32),
        "image_proj.norm.bias": np.zeros(
            CFG.ip_adapter.cross_attention_dim, np.float32),
    }
    ported = W.port_image_proj(sd)
    out = proj.apply({"params": ported},
                     jnp.ones((1, CFG.ip_adapter.clip_embeddings_dim)))
    assert out.shape == (1, CFG.ip_adapter.num_tokens,
                         CFG.ip_adapter.cross_attention_dim)


def test_safetensors_reader(tmp_path):
    import json
    import struct

    a = np.arange(12, dtype=np.float32).reshape(3, 4)
    header = {"x": {"dtype": "F32", "shape": [3, 4],
                    "data_offsets": [0, 48]}}
    hb = json.dumps(header).encode()
    with open(tmp_path / "t.safetensors", "wb") as f:
        f.write(struct.pack("<Q", len(hb)))
        f.write(hb)
        f.write(a.tobytes())
    out = W.load_safetensors(str(tmp_path / "t.safetensors"))
    np.testing.assert_array_equal(out["x"], a)


def test_port_unet_add_embedding_rule():
    """SDXL add_embedding (text_time micro-conditioning MLP) ports too."""
    sd = {
        "add_embedding.linear_1.weight": np.ones((8, 4), np.float32),
        "add_embedding.linear_1.bias": np.zeros(8, np.float32),
        "add_embedding.linear_2.weight": np.ones((8, 8), np.float32),
        "add_embedding.linear_2.bias": np.zeros(8, np.float32),
    }
    ported = W.port_unet(sd)
    assert ported["add_embedding"]["linear_1"]["kernel"].shape == (4, 8)
    assert ported["add_embedding"]["linear_2"]["bias"].shape == (8,)


def test_merge_into_propagates_base_weights():
    dst = {"a": {"kernel": np.zeros(3), "to_k_ip": {"kernel": np.ones(2)}},
           "b": np.zeros(2)}
    src = {"a": {"kernel": np.full(3, 5.0)}, "b": np.full(2, 7.0)}
    out = W.merge_into(dst, src)
    np.testing.assert_array_equal(out["a"]["kernel"], np.full(3, 5.0))
    np.testing.assert_array_equal(out["a"]["to_k_ip"]["kernel"], np.ones(2))
    np.testing.assert_array_equal(out["b"], np.full(2, 7.0))


def test_port_controlnet_extras():
    sd = {
        "controlnet_down_blocks.0.weight": np.ones((8, 8, 1, 1), np.float32),
        "controlnet_down_blocks.0.bias": np.zeros(8, np.float32),
        "controlnet_mid_block.weight": np.ones((8, 8, 1, 1), np.float32),
        "controlnet_cond_embedding.conv_in.weight":
            np.ones((8, 3, 3, 3), np.float32),
        "controlnet_cond_embedding.blocks.1.weight":
            np.ones((8, 8, 3, 3), np.float32),
        "controlnet_cond_embedding.conv_out.bias": np.zeros(8, np.float32),
    }
    p = W.port_controlnet(sd)
    assert p["controlnet_down_blocks_0"]["kernel"].shape == (1, 1, 8, 8)
    assert p["controlnet_mid_block"]["kernel"].shape == (1, 1, 8, 8)
    assert p["controlnet_cond_embedding"]["conv_in"]["kernel"].shape == (3, 3, 3, 8)
    assert p["controlnet_cond_embedding"]["blocks_1"]["kernel"].shape == (3, 3, 8, 8)


def test_port_clip_vision_round_trip():
    from theatergen_tpu.models.clip import CLIPVisionEncoder

    enc = CLIPVisionEncoder(CFG.vision)
    params = enc.init(jax.random.key(0),
                      jnp.zeros((1, 32, 32, 3)))["params"]
    flat = flatten(params)
    sd = {}
    for path, arr in flat.items():
        if path == "class_embedding":
            sd["vision_model.embeddings.class_embedding"] = arr
            continue
        if path == "position_embedding":
            sd["vision_model.embeddings.position_embedding.weight"] = arr
            continue
        if path == "patch_embedding/kernel":
            sd["vision_model.embeddings.patch_embedding.weight"] = (
                np.transpose(arr, (3, 2, 0, 1)))
            continue
        if path == "visual_projection/kernel":
            sd["visual_projection.weight"] = np.transpose(arr)
            continue
        p = path
        p = re.sub(r"layers_(\d+)", r"encoder.layers.\1", p)
        p = p.replace("self_attn/", "self_attn.").replace("mlp/", "mlp.")
        p = p.replace("/kernel", ".weight").replace("/bias", ".bias")
        p = p.replace("/scale", ".weight")
        p = p.replace("/", ".")
        p = "vision_model." + p
        if arr.ndim == 2 and p.endswith(".weight"):
            arr = np.transpose(arr)
        sd[p] = arr
    ported = W.port_clip_vision(sd)
    flat_ported = flatten(ported)
    assert set(flat_ported) == set(flat), (
        sorted(set(flat) - set(flat_ported))[:8],
        sorted(set(flat_ported) - set(flat))[:8])
    for k in flat:
        np.testing.assert_allclose(flat_ported[k], flat[k], rtol=1e-6,
                                   err_msg=k)


def test_apply_lora_unet():
    """LoRA deltas merge into the right kernels: W' = W + scale*B@A."""
    from theatergen_tpu.models import lora as LR
    from theatergen_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(CFG.unet)
    params = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, CFG.text.max_length, CFG.unet.cross_attention_dim)),
    )["params"]
    mod = "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q"
    kernel = params["encoder"]["down_blocks_0_attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    in_f, out_f = kernel.shape
    rng = np.random.RandomState(0)
    A = rng.randn(2, in_f).astype(np.float32)   # [r, in]
    B = rng.randn(out_f, 2).astype(np.float32)  # [out, r]
    sd = {f"unet.{mod}.lora_A.weight": A, f"{mod}.lora_B.weight": B}
    merged = LR.apply_lora_unet(params, sd, scale=0.5)
    got = merged["encoder"]["down_blocks_0_attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    expect = np.asarray(kernel) + 0.5 * (B @ A).T
    np.testing.assert_allclose(np.asarray(got), expect, rtol=1e-5)
    # all other leaves untouched
    f_old = flatten(params)
    f_new = flatten(merged)
    changed = [k for k in f_old if not np.array_equal(f_old[k], f_new[k])]
    assert changed == ["encoder/down_blocks_0_attentions_0/"
                       "transformer_blocks_0/attn1/to_q/kernel"]
    # unmatched module raises
    with pytest.raises(ValueError):
        LR.apply_lora_unet(params, {"bogus.module.lora_A.weight": A,
                                    "bogus.module.lora_B.weight": B})
    # kohya aliases accepted
    sd2 = {f"{mod}.lora_down.weight": A, f"{mod}.lora_up.weight": B}
    merged2 = LR.apply_lora_unet(params, sd2, scale=0.5)
    np.testing.assert_allclose(
        np.asarray(flatten(merged2)[changed[0]]), expect, rtol=1e-5)


def test_kohya_module_name_conversion():
    from theatergen_tpu.models.lora import kohya_module_to_diffusers as f

    cases = {
        "down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q":
            "down_blocks.0.attentions.0.transformer_blocks.0.attn1.to_q",
        "down_blocks_1_attentions_0_transformer_blocks_0_ff_net_0_proj":
            "down_blocks.1.attentions.0.transformer_blocks.0.ff.net.0.proj",
        "mid_block_attentions_0_transformer_blocks_0_attn2_to_out_0":
            "mid_block.attentions.0.transformer_blocks.0.attn2.to_out.0",
        "up_blocks_1_resnets_2_time_emb_proj":
            "up_blocks.1.resnets.2.time_emb_proj",
        "down_blocks_0_downsamplers_0_conv":
            "down_blocks.0.downsamplers.0.conv",
        "up_blocks_0_upsamplers_0_conv": "up_blocks.0.upsamplers.0.conv",
        "down_blocks_0_resnets_1_conv_shortcut":
            "down_blocks.0.resnets.1.conv_shortcut",
        "mid_block_resnets_0_conv1": "mid_block.resnets.0.conv1",
        "down_blocks_2_attentions_1_proj_in":
            "down_blocks.2.attentions.1.proj_in",
    }
    for src, want in cases.items():
        assert f(src) == want, (src, f(src), want)


def test_apply_lora_kohya_alpha_and_conv():
    """Real kohya/webui files: lora_unet_ underscore names, per-module
    .alpha (effective scale alpha/rank), conv-layer 4-D factors (which
    LCM-LoRA trains), and lora_te_* entries that must be ignored."""
    from theatergen_tpu.models import lora as LR
    from theatergen_tpu.models.unet import UNet2DCondition

    unet = UNet2DCondition(CFG.unet)
    params = unet.init(
        jax.random.key(0), jnp.zeros((1, 8, 8, 4)), jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, CFG.text.max_length, CFG.unet.cross_attention_dim)),
    )["params"]
    rng = np.random.RandomState(1)

    q = params["encoder"]["down_blocks_0_attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    in_f, out_f = q.shape
    A = rng.randn(4, in_f).astype(np.float32)
    B = rng.randn(out_f, 4).astype(np.float32)

    conv = params["encoder"]["down_blocks_0_resnets_0"]["conv1"]["kernel"]
    kh, kw, cin, cout = conv.shape
    Ac = rng.randn(4, cin, kh, kw).astype(np.float32)
    Bc = rng.randn(cout, 4, 1, 1).astype(np.float32)

    base = "lora_unet_down_blocks_0_attentions_0_transformer_blocks_0_attn1_to_q"
    cbase = "lora_unet_down_blocks_0_resnets_0_conv1"
    sd = {
        f"{base}.lora_down.weight": A,
        f"{base}.lora_up.weight": B,
        f"{base}.alpha": np.float32(2.0),      # alpha/rank = 0.5
        f"{cbase}.lora_down.weight": Ac,
        f"{cbase}.lora_up.weight": Bc,
        # text-encoder entries must not reach the UNet merge
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_down.weight": rng.randn(4, 8).astype(np.float32),
        "lora_te_text_model_encoder_layers_0_self_attn_q_proj"
        ".lora_up.weight": rng.randn(8, 4).astype(np.float32),
    }
    merged = LR.apply_lora_unet(params, sd, scale=1.0)

    got_q = merged["encoder"]["down_blocks_0_attentions_0"][
        "transformer_blocks_0"]["attn1"]["to_q"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(got_q), np.asarray(q) + 0.5 * (B @ A).T, rtol=1e-5)

    got_c = merged["encoder"]["down_blocks_0_resnets_0"]["conv1"]["kernel"]
    delta_torch = np.tensordot(Bc[:, :, 0, 0], Ac, axes=(1, 0))
    np.testing.assert_allclose(
        np.asarray(got_c),
        np.asarray(conv) + np.transpose(delta_torch, (2, 3, 1, 0)),
        rtol=1e-5)

    changed = [k for k, v in flatten(params).items()
               if not np.array_equal(v, flatten(merged)[k])]
    assert sorted(changed) == [
        "encoder/down_blocks_0_attentions_0/transformer_blocks_0/attn1/"
        "to_q/kernel",
        "encoder/down_blocks_0_resnets_0/conv1/kernel",
    ]
