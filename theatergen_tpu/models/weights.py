"""Checkpoint porting: diffusers/HF torch state dicts → flax param trees.

The reference loads (SURVEY.md §2.12): SD1.5 UNet + CLIP ViT-L text encoder
(``generate.py:58,78``), sd-vae-ft-mse (``:59,77``), IP-Adapter image
encoder + ``ip-adapter_sd15.bin`` (``:61-62``), ControlNet v1.1 lineart
(``:63``), SAM (``models/sam.py:15-22``).  This module maps those
checkpoints onto our module trees:

- torch ``Conv2d`` kernels ``[O, I, kh, kw]`` → flax ``[kh, kw, I, O]``;
- torch ``Linear`` weights ``[O, I]`` → flax ``[I, O]``;
- norm ``weight/bias`` → ``scale/bias``;
- dotted diffusers names → our flattened module paths (rule table below).

The IP-Adapter checkpoint splits into an ``image_proj`` group (the
:class:`..models.ip_adapter.ImageProjModel`) and an ``ip_adapter`` group of
per-cross-attention ``to_k_ip/to_v_ip`` weights indexed over the UNet's
attention-processor order (reference ``ip_adapter/ip_adapter.py:127-140``);
:func:`port_ip_adapter` walks our UNet's cross-attention layers in the same
(down, up, mid-last) order — diffusers registers ``up_blocks`` before
``mid_block``, see :func:`cross_attention_paths`.

File loading supports ``.safetensors`` (via the ``safetensors`` package if
present, else a minimal built-in reader) and torch ``.bin`` pickles.
No real checkpoints ship in this environment; the mapping is exercised
against synthetically-shaped state dicts in ``tests/test_weights.py``.
"""

from __future__ import annotations

import json
import os
import re
import struct
from typing import Any, Dict, Optional

import numpy as np


# ------------------------------------------------------------------ loading

def load_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Minimal safetensors reader (header: u64 json-size + json + data)."""
    try:
        from safetensors.numpy import load_file  # type: ignore

        return dict(load_file(path))
    except Exception:
        pass
    dtypes = {
        "F32": np.float32, "F16": np.float16, "BF16": None,
        "I64": np.int64, "I32": np.int32, "U8": np.uint8, "BOOL": np.bool_,
    }
    out = {}
    with open(path, "rb") as f:
        n = struct.unpack("<Q", f.read(8))[0]
        header = json.loads(f.read(n))
        base = 8 + n
        data = f.read()
    for name, meta in header.items():
        if name == "__metadata__":
            continue
        dt = meta["dtype"]
        start, end = meta["data_offsets"]
        raw = data[start:end]
        if dt == "BF16":
            u16 = np.frombuffer(raw, np.uint16).astype(np.uint32) << 16
            arr = u16.view(np.float32)
        else:
            arr = np.frombuffer(raw, dtypes[dt])
        out[name] = arr.reshape(meta["shape"]).copy()
    return out


def save_safetensors(path: str, tensors: Dict[str, np.ndarray]) -> None:
    """Minimal safetensors writer (fp32/fp16/int dtypes), symmetric with
    :func:`load_safetensors`; used by tests and offline tooling."""
    dtype_names = {
        np.dtype(np.float32): "F32", np.dtype(np.float16): "F16",
        np.dtype(np.int64): "I64", np.dtype(np.int32): "I32",
        np.dtype(np.uint8): "U8", np.dtype(np.bool_): "BOOL",
    }
    header = {}
    offset = 0
    blobs = []
    for name in sorted(tensors):
        arr = np.ascontiguousarray(tensors[name])
        blob = arr.tobytes()
        header[name] = {
            "dtype": dtype_names[arr.dtype],
            "shape": list(arr.shape),
            "data_offsets": [offset, offset + len(blob)],
        }
        offset += len(blob)
        blobs.append(blob)
    hdr = json.dumps(header).encode()
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hdr)))
        f.write(hdr)
        for blob in blobs:
            f.write(blob)


def load_torch_bin(path: str) -> Dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    flat = {}

    def walk(prefix, obj):
        if isinstance(obj, dict):
            for k, v in obj.items():
                walk(f"{prefix}.{k}" if prefix else str(k), v)
        else:
            flat[prefix] = obj.float().numpy()

    walk("", sd)
    return flat


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    if path.endswith(".safetensors"):
        return load_safetensors(path)
    return load_torch_bin(path)


# ------------------------------------------------------------ tensor layout

def conv_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def dense_kernel(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (1, 0))


def set_path(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    node = tree
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


# --------------------------------------------------------------- UNet rules

_ATTN_INNER = [
    # (diffusers suffix regex, our suffix, kind)
    (r"attn(\d)\.to_q\.weight", r"attn\1/to_q/kernel", "dense"),
    (r"attn(\d)\.to_k\.weight", r"attn\1/to_k/kernel", "dense"),
    (r"attn(\d)\.to_v\.weight", r"attn\1/to_v/kernel", "dense"),
    (r"attn(\d)\.to_out\.0\.weight", r"attn\1/to_out_0/kernel", "dense"),
    (r"attn(\d)\.to_out\.0\.bias", r"attn\1/to_out_0/bias", "bias"),
    (r"attn(\d)\.processor\.to_k_ip\.weight", r"attn\1/to_k_ip/kernel", "dense"),
    (r"attn(\d)\.processor\.to_v_ip\.weight", r"attn\1/to_v_ip/kernel", "dense"),
    (r"ff\.net\.0\.proj\.weight", r"ff/net_0/proj/kernel", "dense"),
    (r"ff\.net\.0\.proj\.bias", r"ff/net_0/proj/bias", "bias"),
    (r"ff\.net\.2\.weight", r"ff/net_2/kernel", "dense"),
    (r"ff\.net\.2\.bias", r"ff/net_2/bias", "bias"),
    (r"norm(\d)\.weight", r"norm\1/scale", "raw"),
    (r"norm(\d)\.bias", r"norm\1/bias", "raw"),
]


def _convert_leaf(name: str, w: np.ndarray, kind: str) -> np.ndarray:
    if kind == "dense":
        return dense_kernel(w)
    if kind == "conv":
        return conv_kernel(w)
    return w


def _map_resnet(suffix: str) -> Optional[tuple]:
    table = [
        (r"norm1\.weight", "norm1/norm/scale", "raw"),
        (r"norm1\.bias", "norm1/norm/bias", "raw"),
        (r"norm2\.weight", "norm2/norm/scale", "raw"),
        (r"norm2\.bias", "norm2/norm/bias", "raw"),
        (r"conv1\.weight", "conv1/kernel", "conv"),
        (r"conv1\.bias", "conv1/bias", "raw"),
        (r"conv2\.weight", "conv2/kernel", "conv"),
        (r"conv2\.bias", "conv2/bias", "raw"),
        (r"time_emb_proj\.weight", "time_emb_proj/kernel", "dense"),
        (r"time_emb_proj\.bias", "time_emb_proj/bias", "raw"),
        (r"conv_shortcut\.weight", "conv_shortcut/kernel", "conv"),
        (r"conv_shortcut\.bias", "conv_shortcut/bias", "raw"),
    ]
    for rx, out, kind in table:
        if re.fullmatch(rx, suffix):
            return out, kind
    return None


def _map_transformer(suffix: str) -> Optional[tuple]:
    if re.fullmatch(r"norm\.weight", suffix):
        return "norm/norm/scale", "raw"
    if re.fullmatch(r"norm\.bias", suffix):
        return "norm/norm/bias", "raw"
    for proj in ("proj_in", "proj_out"):
        if suffix == f"{proj}.weight":
            return f"{proj}/kernel", "auto_conv"
        if suffix == f"{proj}.bias":
            return f"{proj}/bias", "raw"
    m = re.fullmatch(r"transformer_blocks\.(\d+)\.(.+)", suffix)
    if m:
        ti, inner = m.groups()
        for rx, out, kind in _ATTN_INNER:
            mm = re.fullmatch(rx, inner)
            if mm:
                return f"transformer_blocks_{ti}/{mm.expand(out)}", kind
        # transformer-block layer norms norm1/2/3 (LayerNorm, direct)
        mm = re.fullmatch(r"norm(\d)\.(weight|bias)", inner)
        if mm:
            n, wb = mm.groups()
            return (f"transformer_blocks_{ti}/norm{n}/"
                    f"{'scale' if wb == 'weight' else 'bias'}", "raw")
    return None


def port_unet(sd: Dict[str, np.ndarray], *, has_encoder_scope: bool = True
              ) -> Dict[str, Any]:
    """Diffusers UNet2DConditionModel state dict → our UNet param tree.

    ``has_encoder_scope``: our UNet nests conv_in/down blocks under
    ``encoder/`` and mid under ``mid/`` (shared with ControlNet)."""
    params: Dict[str, Any] = {}
    enc = "encoder/" if has_encoder_scope else ""
    mid = "mid/" if has_encoder_scope else ""

    for name, w in sd.items():
        out = None
        if name.startswith("conv_in."):
            leaf = name.split(".")[-1]
            out = (f"{enc}conv_in/{'kernel' if leaf == 'weight' else 'bias'}",
                   "conv" if leaf == "weight" else "raw")
        elif name.startswith("time_embedding.") or name.startswith("add_embedding."):
            m = re.fullmatch(
                r"(time|add)_embedding\.linear_(\d)\.(weight|bias)", name)
            if m:
                which, n, wb = m.groups()
                out = (f"{which}_embedding/linear_{n}/"
                       f"{'kernel' if wb == 'weight' else 'bias'}",
                       "dense" if wb == "weight" else "raw")
        elif name.startswith("conv_norm_out."):
            leaf = name.split(".")[-1]
            out = (f"conv_norm_out/norm/{'scale' if leaf == 'weight' else 'bias'}",
                   "raw")
        elif name.startswith("conv_out."):
            leaf = name.split(".")[-1]
            out = (f"conv_out/{'kernel' if leaf == 'weight' else 'bias'}",
                   "conv" if leaf == "weight" else "raw")
        else:
            m = re.fullmatch(
                r"(down|up)_blocks\.(\d+)\.(resnets|attentions|downsamplers|"
                r"upsamplers)\.(\d+)\.(.+)", name)
            if m:
                du, bi, kind_, li, suffix = m.groups()
                scope = enc if du == "down" else ""
                base = f"{scope}{du}_blocks_{bi}_{kind_}_{li}"
                if kind_ == "resnets":
                    r = _map_resnet(suffix)
                elif kind_ == "attentions":
                    r = _map_transformer(suffix)
                else:  # samplers
                    if suffix == "conv.weight":
                        r = ("conv/kernel", "conv")
                    elif suffix == "conv.bias":
                        r = ("conv/bias", "raw")
                    else:
                        r = None
                if r:
                    out = (f"{base}/{r[0]}", r[1])
            m = re.fullmatch(
                r"mid_block\.(resnets|attentions)\.(\d+)\.(.+)", name)
            if m:
                kind_, li, suffix = m.groups()
                base = f"{mid}mid_block_{kind_}_{li}"
                r = (_map_resnet(suffix) if kind_ == "resnets"
                     else _map_transformer(suffix))
                if r:
                    out = (f"{base}/{r[0]}", r[1])
        if out is None:
            continue
        path, kind = out
        if kind == "auto_conv":
            # proj_in/out may be Linear (newer) or 1×1 Conv (SD1.5)
            if w.ndim == 4:
                w2 = conv_kernel(w)
            else:
                w2 = dense_kernel(w)[None, None]
            set_path(params, path, w2)
        else:
            set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_vae(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Diffusers AutoencoderKL state dict → our VAE param tree."""
    params: Dict[str, Any] = {}

    def vae_attn(suffix):
        table = [
            (r"group_norm\.weight", "group_norm/norm/scale", "raw"),
            (r"group_norm\.bias", "group_norm/norm/bias", "raw"),
            (r"to_q\.weight", "to_q/kernel", "dense"),
            (r"to_q\.bias", "to_q/bias", "raw"),
            (r"to_k\.weight", "to_k/kernel", "dense"),
            (r"to_k\.bias", "to_k/bias", "raw"),
            (r"to_v\.weight", "to_v/kernel", "dense"),
            (r"to_v\.bias", "to_v/bias", "raw"),
            (r"to_out\.0\.weight", "to_out_0/kernel", "dense"),
            (r"to_out\.0\.bias", "to_out_0/bias", "raw"),
            # 2022-era exports (runwayml sd-v1-5 vae, sd-vae-ft-mse) carry
            # the deprecated AttentionBlock names; diffusers renames them
            # at load time (_convert_deprecated_attention_block), so the
            # on-hub files still use query/key/value/proj_attn
            (r"query\.weight", "to_q/kernel", "dense"),
            (r"query\.bias", "to_q/bias", "raw"),
            (r"key\.weight", "to_k/kernel", "dense"),
            (r"key\.bias", "to_k/bias", "raw"),
            (r"value\.weight", "to_v/kernel", "dense"),
            (r"value\.bias", "to_v/bias", "raw"),
            (r"proj_attn\.weight", "to_out_0/kernel", "dense"),
            (r"proj_attn\.bias", "to_out_0/bias", "raw"),
        ]
        for rx, out, kind in table:
            if re.fullmatch(rx, suffix):
                return out, kind
        return None

    for name, w in sd.items():
        out = None
        for side in ("encoder", "decoder"):
            if not name.startswith(side + "."):
                continue
            rest = name[len(side) + 1:]
            if rest.startswith("conv_in."):
                leaf = rest.split(".")[-1]
                out = (f"{side}/conv_in/{'kernel' if leaf == 'weight' else 'bias'}",
                       "conv" if leaf == "weight" else "raw")
            elif rest.startswith("conv_norm_out."):
                leaf = rest.split(".")[-1]
                out = (f"{side}/conv_norm_out/norm/"
                       f"{'scale' if leaf == 'weight' else 'bias'}", "raw")
            elif rest.startswith("conv_out."):
                leaf = rest.split(".")[-1]
                out = (f"{side}/conv_out/{'kernel' if leaf == 'weight' else 'bias'}",
                       "conv" if leaf == "weight" else "raw")
            else:
                m = re.fullmatch(
                    r"(down|up)_blocks\.(\d+)\.(resnets|downsamplers|"
                    r"upsamplers)\.(\d+)\.(.+)", rest)
                if m:
                    du, bi, kind_, li, suffix = m.groups()
                    base = f"{side}/{du}_blocks_{bi}_{kind_}_{li}"
                    if kind_ == "resnets":
                        r = _map_resnet(suffix)
                    else:
                        r = (("conv/kernel", "conv") if suffix == "conv.weight"
                             else ("conv/bias", "raw") if suffix == "conv.bias"
                             else None)
                    if r:
                        out = (f"{base}/{r[0]}", r[1])
                m = re.fullmatch(r"mid_block\.(resnets|attentions)\.(\d+)\.(.+)",
                                 rest)
                if m:
                    kind_, li, suffix = m.groups()
                    base = f"{side}/mid_{kind_}_{li}"
                    r = (_map_resnet(suffix) if kind_ == "resnets"
                         else vae_attn(suffix))
                    if r:
                        out = (f"{base}/{r[0]}", r[1])
        if name.startswith("quant_conv."):
            leaf = name.split(".")[-1]
            out = (f"encoder/quant_conv/{'kernel' if leaf == 'weight' else 'bias'}",
                   "conv" if leaf == "weight" else "raw")
        if name.startswith("post_quant_conv."):
            leaf = name.split(".")[-1]
            out = (f"decoder/post_quant_conv/"
                   f"{'kernel' if leaf == 'weight' else 'bias'}",
                   "conv" if leaf == "weight" else "raw")
        if out is None:
            continue
        path, kind = out
        set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_clip_text(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPTextModel state dict → our CLIPTextEncoder tree."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        name = name.replace("text_model.", "")
        out = None
        if name == "embeddings.token_embedding.weight":
            out = ("token_embedding/embedding", "raw")
        elif name == "embeddings.position_embedding.weight":
            out = ("position_embedding", "raw")
        elif name.startswith("encoder.layers."):
            m = re.fullmatch(
                r"encoder\.layers\.(\d+)\.(self_attn\.(?:q|k|v|out)_proj|"
                r"layer_norm\d|mlp\.fc\d)\.(weight|bias)", name)
            if m:
                li, mod, wb = m.groups()
                mod_path = mod.replace("mlp.", "mlp/").replace(
                    "self_attn.", "self_attn/")
                is_dense = "proj" in mod or "fc" in mod
                leaf = ("kernel" if wb == "weight" else "bias") if is_dense \
                    else ("scale" if wb == "weight" else "bias")
                kind = "dense" if (is_dense and wb == "weight") else "raw"
                out = (f"layers_{li}/{mod_path}/{leaf}", kind)
        elif name.startswith("final_layer_norm."):
            leaf = name.split(".")[-1]
            out = (f"final_layer_norm/{'scale' if leaf == 'weight' else 'bias'}",
                   "raw")
        elif name == "text_projection.weight":
            # CLIPTextModelWithProjection (SDXL tower 2, eval towers)
            out = ("text_projection/kernel", "dense")
        if out is None:
            continue
        path, kind = out
        set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_controlnet(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Diffusers ControlNetModel state dict → our ControlNet tree: the
    shared encoder/mid/time-embedding map through :func:`port_unet`; the
    zero-conv heads and the conditioning embedding map here."""
    params = port_unet(sd)
    for name, w in sd.items():
        out = None
        m = re.fullmatch(r"controlnet_down_blocks\.(\d+)\.(weight|bias)", name)
        if m:
            i, wb = m.groups()
            out = (f"controlnet_down_blocks_{i}/"
                   f"{'kernel' if wb == 'weight' else 'bias'}",
                   "conv" if wb == "weight" else "raw")
        m = re.fullmatch(r"controlnet_mid_block\.(weight|bias)", name)
        if m:
            wb = m.group(1)
            out = (f"controlnet_mid_block/"
                   f"{'kernel' if wb == 'weight' else 'bias'}",
                   "conv" if wb == "weight" else "raw")
        m = re.fullmatch(
            r"controlnet_cond_embedding\.(conv_in|conv_out|blocks\.(\d+))"
            r"\.(weight|bias)", name)
        if m:
            mod, bi, wb = m.group(1), m.group(2), m.group(3)
            mod_name = f"blocks_{bi}" if bi is not None else mod
            out = (f"controlnet_cond_embedding/{mod_name}/"
                   f"{'kernel' if wb == 'weight' else 'bias'}",
                   "conv" if wb == "weight" else "raw")
        if out is None:
            continue
        path, kind = out
        set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_clip_vision(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF CLIPVisionModelWithProjection state dict → CLIPVisionEncoder tree."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        name = name.replace("vision_model.", "")
        out = None
        if name == "embeddings.class_embedding":
            out = ("class_embedding", "raw")
        elif name == "embeddings.patch_embedding.weight":
            out = ("patch_embedding/kernel", "conv")
        elif name == "embeddings.position_embedding.weight":
            out = ("position_embedding", "raw")
        elif name.startswith(("pre_layrnorm.", "post_layernorm.")):
            mod, leaf = name.rsplit(".", 1)
            out = (f"{mod}/{'scale' if leaf == 'weight' else 'bias'}", "raw")
        elif name == "visual_projection.weight":
            out = ("visual_projection/kernel", "dense")
        elif name.startswith("encoder.layers."):
            m = re.fullmatch(
                r"encoder\.layers\.(\d+)\.(self_attn\.(?:q|k|v|out)_proj|"
                r"layer_norm\d|mlp\.fc\d)\.(weight|bias)", name)
            if m:
                li, mod, wb = m.groups()
                mod_path = mod.replace("mlp.", "mlp/").replace(
                    "self_attn.", "self_attn/")
                is_dense = "proj" in mod or "fc" in mod
                leaf = ("kernel" if wb == "weight" else "bias") if is_dense \
                    else ("scale" if wb == "weight" else "bias")
                kind = "dense" if (is_dense and wb == "weight") else "raw"
                out = (f"layers_{li}/{mod_path}/{leaf}", kind)
        if out is None:
            continue
        path, kind = out
        set_path(params, path, _convert_leaf(name, w, kind))
    return params


def merge_into(dst: Dict[str, Any], src: Dict[str, Any]) -> Dict[str, Any]:
    """Overwrite matching leaves of ``dst`` with ``src`` (used to propagate
    ported base-UNet weights into the IP-equipped UNet tree, whose extra
    to_k_ip/to_v_ip leaves keep their existing values)."""
    out = dict(dst)
    for key, val in src.items():
        if key in out and isinstance(out[key], dict) and isinstance(val, dict):
            out[key] = merge_into(out[key], val)
        else:
            out[key] = val
    return out


def port_image_proj(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """IP-Adapter ``image_proj`` group → ImageProjModel tree
    (``ip_adapter/ip_adapter.py:127-140`` group split)."""
    params: Dict[str, Any] = {}
    table = {
        "proj.weight": ("proj/kernel", "dense"),
        "proj.bias": ("proj/bias", "raw"),
        "norm.weight": ("norm/scale", "raw"),
        "norm.bias": ("norm/bias", "raw"),
    }
    for name, w in sd.items():
        name = name.replace("image_proj.", "")
        if name in table:
            path, kind = table[name]
            set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_mlp_proj(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """IPAdapterFull ``image_proj`` group → MLPProjModel tree.  The torch
    module is one Sequential (``ip_adapter/ip_adapter.py:50-64``), so the
    keys are positional: proj.0 / proj.2 Linears, proj.3 LayerNorm."""
    params: Dict[str, Any] = {}
    table = {
        "proj.0.weight": ("proj_0/kernel", "dense"),
        "proj.0.bias": ("proj_0/bias", "raw"),
        "proj.2.weight": ("proj_2/kernel", "dense"),
        "proj.2.bias": ("proj_2/bias", "raw"),
        "proj.3.weight": ("norm/scale", "raw"),
        "proj.3.bias": ("norm/bias", "raw"),
    }
    for name, w in sd.items():
        name = name.replace("image_proj.", "")
        if name in table:
            path, kind = table[name]
            set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_resampler(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """IP-Adapter-Plus ``image_proj`` group (the Perceiver Resampler,
    ``ip_adapter/resampler.py:81-147``) → our ``Resampler`` tree.

    torch module layout: ``latents`` [1, Q, D]; ``proj_in``/``proj_out``
    Linear; ``norm_out`` LayerNorm; ``layers.{i}.0`` PerceiverAttention
    (norm1/norm2 + bias-free to_q/to_kv/to_out) and ``layers.{i}.1``
    FeedForward Sequential (0: LayerNorm, 1: Linear, 3: Linear)."""
    params: Dict[str, Any] = {}
    for name, w in sd.items():
        name = name.replace("image_proj.", "")
        if name == "latents":
            params["latents"] = w[0]   # drop torch's broadcast axis
            continue
        out = None
        for mod in ("proj_in", "proj_out"):
            if name == f"{mod}.weight":
                out = (f"{mod}/kernel", "dense")
            elif name == f"{mod}.bias":
                out = (f"{mod}/bias", "raw")
        if name.startswith("norm_out."):
            leaf = name.split(".")[-1]
            out = (f"norm_out/{'scale' if leaf == 'weight' else 'bias'}",
                   "raw")
        m = re.fullmatch(r"layers\.(\d+)\.0\.(norm\d)\.(weight|bias)", name)
        if m:
            i, n, wb = m.groups()
            out = (f"layers_{i}_attn/{n}/"
                   f"{'scale' if wb == 'weight' else 'bias'}", "raw")
        m = re.fullmatch(r"layers\.(\d+)\.0\.(to_q|to_kv|to_out)\.weight",
                         name)
        if m:
            out = (f"layers_{m.group(1)}_attn/{m.group(2)}/kernel", "dense")
        m = re.fullmatch(r"layers\.(\d+)\.1\.0\.(weight|bias)", name)
        if m:
            out = (f"layers_{m.group(1)}_ff_norm/"
                   f"{'scale' if m.group(2) == 'weight' else 'bias'}", "raw")
        m = re.fullmatch(r"layers\.(\d+)\.1\.([13])\.weight", name)
        if m:
            ff = "1" if m.group(2) == "1" else "2"
            out = (f"layers_{m.group(1)}_ff_{ff}/kernel", "dense")
        if out is None:
            continue
        path, kind = out
        set_path(params, path, _convert_leaf(name, w, kind))
    return params


def cross_attention_paths(unet_params: Dict[str, Any]) -> list:
    """Our UNet's cross-attention (attn2) module paths in the diffusers
    attention-processor enumeration order — the order the ``ip_adapter``
    weight group is indexed by.

    That order is **down blocks, up blocks, mid block LAST**: diffusers'
    ``UNet2DConditionModel.attn_processors`` walks ``named_children()``
    in attribute-assignment order, and ``self.up_blocks = nn.ModuleList``
    is assigned (empty) *before* ``self.mid_block`` is built (reference
    fork ``ip_adapter/unet_2d_condition.py:460-461`` vs ``:532``; the
    group is then loaded positionally via
    ``ModuleList(attn_processors.values())``, ``ip_adapter.py:139``).
    ``tests/test_checkpoint_manifest.py`` pins this with position-stamped
    values over the real h94 index→hidden-size table."""
    paths = []

    def collect(scope_tree, prefix):
        found = []
        for key in sorted(scope_tree):
            m = re.fullmatch(r"(down|up)_blocks_(\d+)_attentions_(\d+)", key)
            if m:
                found.append((int(m.group(2)), int(m.group(3)), key))
        for _, _, key in sorted(found):
            node = scope_tree[key]
            for tb in sorted(k for k in node if k.startswith("transformer_blocks_")):
                if "attn2" in node[tb]:
                    paths.append(prefix + [key, tb, "attn2"])

    enc = unet_params.get("encoder", {})
    collect(enc, ["encoder"])         # down blocks
    collect(unet_params, [])          # up blocks
    mid = unet_params.get("mid", {})  # mid block last
    if "mid_block_attentions_0" in mid:
        node = mid["mid_block_attentions_0"]
        for tb in sorted(k for k in node if k.startswith("transformer_blocks_")):
            if "attn2" in node[tb]:
                paths.append(["mid", "mid_block_attentions_0", tb, "attn2"])
    return paths


def port_ip_adapter(ip_sd: Dict[str, np.ndarray], unet_params: Dict[str, Any]
                    ) -> Dict[str, Any]:
    """Install the ``ip_adapter`` weight group (``{idx}.to_k_ip.weight`` …)
    into an (IP-equipped) UNet param tree; returns the updated tree."""
    import jax

    tree = jax.tree_util.tree_map(lambda x: x, unet_params)  # shallow copy
    paths = cross_attention_paths(tree)
    # group keys like "1.to_k_ip.weight" → processor index 2*i+1
    by_idx: Dict[int, Dict[str, np.ndarray]] = {}
    for name, w in ip_sd.items():
        name = name.replace("ip_adapter.", "")
        m = re.fullmatch(r"(\d+)\.(to_[kv]_ip)\.weight", name)
        if m:
            by_idx.setdefault(int(m.group(1)), {})[m.group(2)] = w
    order = sorted(by_idx)
    assert len(order) == len(paths), (len(order), len(paths))
    for idx, path in zip(order, paths):
        node = tree
        for p in path:
            node = node[p]
        for kv, w in by_idx[idx].items():
            node[kv] = {"kernel": dense_kernel(w)}
    return tree


def convt_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d weight [in, out, kH, kW] → flax ConvTranspose
    kernel [kH, kW, in, out].  lax.conv_transpose cross-correlates the
    zero-dilated input while torch scatters the kernel as-is, so the
    spatial axes flip."""
    return np.transpose(w, (2, 3, 0, 1))[::-1, ::-1].copy()


def port_sam(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``SamModel`` state dict → ``perception.sam_hf.SamHF`` param tree.

    Covers the box-prompt inference path the reference uses
    (``models/sam.py:26-56``): vision encoder, prompt encoder (points +
    boxes + no-mask dense), two-way mask decoder.  The mask-input conv
    tower (``mask_embed``) has no flax counterpart (the reference never
    feeds dense mask prompts) and is skipped.
    """
    params: Dict[str, Any] = {}
    point_embeds: Dict[int, np.ndarray] = {}
    _SIMPLE = [
        # vision encoder
        (r"vision_encoder\.patch_embed\.projection\.weight",
         "vision_encoder/patch_embed/kernel", "conv"),
        (r"vision_encoder\.patch_embed\.projection\.bias",
         "vision_encoder/patch_embed/bias", "raw"),
        (r"vision_encoder\.pos_embed", "vision_encoder/pos_embed", "raw"),
        (r"vision_encoder\.neck\.conv(\d)\.weight",
         r"vision_encoder/neck_conv\1/kernel", "conv"),
        (r"vision_encoder\.neck\.layer_norm(\d)\.weight",
         r"vision_encoder/neck_ln\1/scale", "raw"),
        (r"vision_encoder\.neck\.layer_norm(\d)\.bias",
         r"vision_encoder/neck_ln\1/bias", "raw"),
        # shared fourier point embedding (tied buffer)
        (r"shared_image_embedding\.positional_embedding",
         "prompt_encoder/shared_embedding/positional_embedding", "raw"),
        # prompt encoder scalars
        (r"prompt_encoder\.not_a_point_embed\.weight",
         "prompt_encoder/not_a_point_embed", "squeeze"),
        (r"prompt_encoder\.no_mask_embed\.weight",
         "prompt_encoder/no_mask_embed", "squeeze"),
        # mask decoder tokens + upscaling + final norm
        (r"mask_decoder\.iou_token\.weight", "mask_decoder/iou_token", "raw"),
        (r"mask_decoder\.mask_tokens\.weight",
         "mask_decoder/mask_tokens", "raw"),
        (r"mask_decoder\.upscale_conv(\d)\.weight",
         r"mask_decoder/upscale_conv\1/kernel", "convt"),
        (r"mask_decoder\.upscale_conv(\d)\.bias",
         r"mask_decoder/upscale_conv\1/bias", "raw"),
        (r"mask_decoder\.upscale_layer_norm\.weight",
         "mask_decoder/upscale_layer_norm/scale", "raw"),
        (r"mask_decoder\.upscale_layer_norm\.bias",
         "mask_decoder/upscale_layer_norm/bias", "raw"),
        (r"mask_decoder\.transformer\.layer_norm_final_attn\.weight",
         "mask_decoder/layer_norm_final_attn/scale", "raw"),
        (r"mask_decoder\.transformer\.layer_norm_final_attn\.bias",
         "mask_decoder/layer_norm_final_attn/bias", "raw"),
    ]
    _ATTN = r"(q_proj|k_proj|v_proj|out_proj)"
    _RULES = [
        (r"vision_encoder\.layers\.(\d+)\.layer_norm(\d)\.(weight|bias)",
         lambda m: (f"vision_encoder/layers_{m.group(1)}/layer_norm"
                    f"{m.group(2)}/"
                    f"{'scale' if m.group(3) == 'weight' else 'bias'}", "raw")),
        (r"vision_encoder\.layers\.(\d+)\.attn\.(qkv|proj)\.(weight|bias)",
         lambda m: (f"vision_encoder/layers_{m.group(1)}/attn/{m.group(2)}/"
                    f"{'kernel' if m.group(3) == 'weight' else 'bias'}",
                    "dense" if m.group(3) == "weight" else "raw")),
        (r"vision_encoder\.layers\.(\d+)\.attn\.(rel_pos_[hw])",
         lambda m: (f"vision_encoder/layers_{m.group(1)}/attn/{m.group(2)}",
                    "raw")),
        (r"vision_encoder\.layers\.(\d+)\.mlp\.lin(\d)\.(weight|bias)",
         lambda m: (f"vision_encoder/layers_{m.group(1)}/mlp_lin{m.group(2)}/"
                    f"{'kernel' if m.group(3) == 'weight' else 'bias'}",
                    "dense" if m.group(3) == "weight" else "raw")),
        (r"mask_decoder\.transformer\.layers\.(\d+)\."
         r"(self_attn|cross_attn_token_to_image|cross_attn_image_to_token)\."
         + _ATTN + r"\.(weight|bias)",
         lambda m: (f"mask_decoder/layers_{m.group(1)}/{m.group(2)}/"
                    f"{m.group(3)}/"
                    f"{'kernel' if m.group(4) == 'weight' else 'bias'}",
                    "dense" if m.group(4) == "weight" else "raw")),
        (r"mask_decoder\.transformer\.layers\.(\d+)\.layer_norm(\d)\."
         r"(weight|bias)",
         lambda m: (f"mask_decoder/layers_{m.group(1)}/layer_norm"
                    f"{m.group(2)}/"
                    f"{'scale' if m.group(3) == 'weight' else 'bias'}", "raw")),
        (r"mask_decoder\.transformer\.layers\.(\d+)\.mlp\.lin(\d)\."
         r"(weight|bias)",
         lambda m: (f"mask_decoder/layers_{m.group(1)}/mlp_lin{m.group(2)}/"
                    f"{'kernel' if m.group(3) == 'weight' else 'bias'}",
                    "dense" if m.group(3) == "weight" else "raw")),
        (r"mask_decoder\.transformer\.final_attn_token_to_image\."
         + _ATTN + r"\.(weight|bias)",
         lambda m: (f"mask_decoder/final_attn_token_to_image/{m.group(1)}/"
                    f"{'kernel' if m.group(2) == 'weight' else 'bias'}",
                    "dense" if m.group(2) == "weight" else "raw")),
        (r"mask_decoder\.output_hypernetworks_mlps\.(\d+)\."
         r"(proj_in|proj_out|layers\.\d+)\.(weight|bias)",
         lambda m: (f"mask_decoder/hyper_mlps_{m.group(1)}/"
                    f"{m.group(2).replace('.', '_')}/"
                    f"{'kernel' if m.group(3) == 'weight' else 'bias'}",
                    "dense" if m.group(3) == "weight" else "raw")),
        (r"mask_decoder\.iou_prediction_head\."
         r"(proj_in|proj_out|layers\.\d+)\.(weight|bias)",
         lambda m: (f"mask_decoder/iou_prediction_head/"
                    f"{m.group(1).replace('.', '_')}/"
                    f"{'kernel' if m.group(2) == 'weight' else 'bias'}",
                    "dense" if m.group(2) == "weight" else "raw")),
    ]

    def convert(w, kind):
        if kind == "dense":
            return dense_kernel(w)
        if kind == "conv":
            return conv_kernel(w)
        if kind == "convt":
            return convt_kernel(w)
        if kind == "squeeze":
            return w.reshape(-1)
        return w

    for name, w in sd.items():
        m = re.fullmatch(r"prompt_encoder\.point_embed\.(\d+)\.weight", name)
        if m:
            point_embeds[int(m.group(1))] = w.reshape(-1)
            continue
        matched = False
        for rx, path, kind in _SIMPLE:
            m = re.fullmatch(rx, name)
            if m:
                set_path(params, m.expand(path) if "\\" in path else path,
                         convert(w, kind))
                matched = True
                break
        if matched:
            continue
        for rx, fn in _RULES:
            m = re.fullmatch(rx, name)
            if m:
                path, kind = fn(m)
                set_path(params, path, convert(w, kind))
                break
    if point_embeds:
        set_path(params, "prompt_encoder/point_embed",
                 np.stack([point_embeds[i] for i in sorted(point_embeds)]))
    return params


def port_lineart(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """lllyasviel/Annotators ``sk_model.pth`` Generator →
    ``ops.lineart.LineartGenerator`` tree (InstanceNorm has no params;
    ConvTranspose kernels flip via :func:`convt_kernel`)."""
    params: Dict[str, Any] = {}
    table = [
        (r"model0\.1\.(weight|bias)", "stem", "conv"),
        (r"model1\.0\.(weight|bias)", "down1", "conv"),
        (r"model1\.3\.(weight|bias)", "down2", "conv"),
        (r"model3\.0\.(weight|bias)", None, "convt0"),
        (r"model3\.3\.(weight|bias)", None, "convt1"),
        (r"model4\.1\.(weight|bias)", "head", "conv"),
    ]
    for name, w in sd.items():
        m = re.fullmatch(
            r"model2\.(\d+)\.conv_block\.(1|5)\.(weight|bias)", name)
        if m:
            conv = "conv1" if m.group(2) == "1" else "conv2"
            leaf = "kernel" if m.group(3) == "weight" else "bias"
            set_path(params, f"res_{m.group(1)}/{conv}/{leaf}",
                     conv_kernel(w) if leaf == "kernel" else w)
            continue
        for rx, mod, kind in table:
            m = re.fullmatch(rx, name)
            if not m:
                continue
            is_w = m.group(1) == "weight"
            if kind.startswith("convt"):
                idx = kind[-1]
                set_path(params, f"up{int(idx) + 1}_"
                                 f"{'kernel' if is_w else 'bias'}",
                         convt_kernel(w) if is_w else w)
            else:
                set_path(params, f"{mod}/{'kernel' if is_w else 'bias'}",
                         conv_kernel(w) if is_w else w)
            break
    return params


def port_owl(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``OwlViTForObjectDetection`` state dict →
    ``perception.owl.OwlDetector`` param tree.

    The towers are plain CLIP and route through :func:`port_clip_text` /
    :func:`port_clip_vision` (OwlViT spells the vision pre-norm
    ``pre_layernorm``; CLIP's HF tree has the ``pre_layrnorm`` typo our
    module names mirror).  The detection heads (box MLP, class head with
    logit shift/scale, merged-token ``layer_norm``) map here.  The
    contrastive ``owlvit.logit_scale`` scalar is not part of the
    detection path and is skipped.
    """
    text_sd: Dict[str, np.ndarray] = {}
    vision_sd: Dict[str, np.ndarray] = {}
    for name, w in sd.items():
        if name.startswith("owlvit.text_model."):
            text_sd[name[len("owlvit."):]] = w
        elif name == "owlvit.text_projection.weight":
            text_sd["text_projection.weight"] = w
        elif name.startswith("owlvit.vision_model."):
            vision_sd[name[len("owlvit."):].replace(
                "pre_layernorm.", "pre_layrnorm.")] = w
        elif name == "owlvit.visual_projection.weight":
            vision_sd[name[len("owlvit."):]] = w
    params: Dict[str, Any] = {
        "text": port_clip_text(text_sd),
        "vision": port_clip_vision(vision_sd),
    }
    for name, w in sd.items():
        out = None
        m = re.fullmatch(
            r"(box_head\.dense\d|class_head\.(?:dense0|logit_shift|"
            r"logit_scale))\.(weight|bias)", name)
        if m:
            mod, wb = m.group(1), m.group(2)
            out = (f"{mod.replace('.', '/')}/"
                   f"{'kernel' if wb == 'weight' else 'bias'}",
                   "dense" if wb == "weight" else "raw")
        elif name.startswith("layer_norm."):
            leaf = name.split(".")[-1]
            out = (f"layer_norm/{'scale' if leaf == 'weight' else 'bias'}",
                   "raw")
        if out is None:
            continue
        path, kind = out
        set_path(params, path, _convert_leaf(name, w, kind))
    return params


def port_grounding_dino(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """HF ``GroundingDinoForObjectDetection`` state dict →
    ``perception.gdino.GroundingDinoForDetection`` param tree.

    Covers the full inference path: Swin backbone, BERT text tower,
    input projections, feature-enhancer encoder, query selection, decoder
    with the shared bbox head.  Buffers (relative_position_index, BERT
    position_ids) and the tied ``bbox_embed.[1+]`` / decoder clones are
    skipped — ``bbox_embed.0`` is the single shared head.
    """
    params: Dict[str, Any] = {}

    def put(path: str, w: np.ndarray, kind: str = "raw") -> None:
        set_path(params, path, _convert_leaf(path, w, kind))

    def lin(prefix_t: str, prefix_j: str, name: str, w: np.ndarray) -> bool:
        m = re.fullmatch(rf"{re.escape(prefix_t)}\.(weight|bias)", name)
        if m:
            put(f"{prefix_j}/{'kernel' if m.group(1) == 'weight' else 'bias'}",
                w, "dense" if m.group(1) == "weight" else "raw")
            return True
        return False

    def ln(prefix_t: str, prefix_j: str, name: str, w: np.ndarray) -> bool:
        m = re.fullmatch(rf"{re.escape(prefix_t)}\.(weight|bias)", name)
        if m:
            put(f"{prefix_j}/{'scale' if m.group(1) == 'weight' else 'bias'}",
                w)
            return True
        return False

    def mha(prefix_t: str, prefix_j: str, name: str, w: np.ndarray) -> bool:
        for leaf in ("query", "key", "value", "out_proj"):
            if lin(f"{prefix_t}.{leaf}", f"{prefix_j}/{leaf}", name, w):
                return True
        return False

    def deform(prefix_t: str, prefix_j: str, name: str, w) -> bool:
        for leaf in ("sampling_offsets", "attention_weights", "value_proj",
                     "output_proj"):
            if lin(f"{prefix_t}.{leaf}", f"{prefix_j}/{leaf}", name, w):
                return True
        return False

    def mlp_head(prefix_t: str, prefix_j: str, name: str, w) -> bool:
        m = re.fullmatch(
            rf"{re.escape(prefix_t)}\.layers\.(\d+)\.(weight|bias)", name)
        if m:
            put(f"{prefix_j}/layers_{m.group(1)}/"
                f"{'kernel' if m.group(2) == 'weight' else 'bias'}",
                w, "dense" if m.group(2) == "weight" else "raw")
            return True
        return False

    for name, w in sd.items():
        if name.endswith((".relative_position_index", ".position_ids")):
            continue
        if name.startswith(("bbox_embed.", "class_embed.")):
            # bbox_embed.0 is the shared head (decoder clones are ties)
            mlp_head("bbox_embed.0", "bbox_embed", name, w)
            continue
        name = name.removeprefix("model.")

        # ------------------------------------------------ swin backbone
        if name.startswith("backbone.conv_encoder.model."):
            n = name.removeprefix("backbone.conv_encoder.model.")
            if n == "embeddings.patch_embeddings.projection.weight":
                put("backbone/patch_embed/kernel", w, "conv")
            elif n == "embeddings.patch_embeddings.projection.bias":
                put("backbone/patch_embed/bias", w)
            elif ln("embeddings.norm", "backbone/embed_norm", n, w):
                pass
            elif (m := re.fullmatch(
                    r"hidden_states_norms\.stage(\d+)\.(weight|bias)", n)):
                put(f"backbone/out_norm_{m.group(1)}/"
                    f"{'scale' if m.group(2) == 'weight' else 'bias'}", w)
            elif (m := re.fullmatch(
                    r"encoder\.layers\.(\d+)\.downsample\.(norm|reduction)"
                    r"\.(weight|bias)", n)):
                s, mod, wb = m.groups()
                if mod == "reduction":
                    put(f"backbone/downsample_{s}/reduction/kernel",
                        w, "dense")
                else:
                    put(f"backbone/downsample_{s}/norm/"
                        f"{'scale' if wb == 'weight' else 'bias'}", w)
            elif (m := re.fullmatch(
                    r"encoder\.layers\.(\d+)\.blocks\.(\d+)\.(.+)", n)):
                s, b_, rest = m.groups()
                base = f"backbone/stage_{s}_block_{b_}"
                if rest == "attention.self.relative_position_bias_table":
                    put(f"{base}/attention/relative_position_bias_table", w)
                elif lin("attention.output.dense",
                         f"{base}/attention/output", rest, w):
                    pass
                elif any(lin(f"attention.self.{leaf}",
                             f"{base}/attention/{leaf}", rest, w)
                         for leaf in ("query", "key", "value")):
                    pass
                elif lin("intermediate.dense", f"{base}/intermediate",
                         rest, w):
                    pass
                elif lin("output.dense", f"{base}/output", rest, w):
                    pass
                elif ln("layernorm_before", f"{base}/layernorm_before",
                        rest, w):
                    pass
                elif ln("layernorm_after", f"{base}/layernorm_after",
                        rest, w):
                    pass
            continue

        # --------------------------------------------------- bert tower
        if name.startswith("text_backbone."):
            n = name.removeprefix("text_backbone.")
            if (m := re.fullmatch(
                    r"embeddings\.(word|position|token_type)_embeddings"
                    r"\.weight", n)):
                put(f"text_backbone/{m.group(1)}_embeddings/embedding", w)
            elif ln("embeddings.LayerNorm", "text_backbone/embeddings_norm",
                    n, w):
                pass
            elif (m := re.fullmatch(r"encoder\.layer\.(\d+)\.(.+)", n)):
                li, rest = m.groups()
                base = f"text_backbone/layers_{li}"
                if any(lin(f"attention.self.{leaf}", f"{base}/self/{leaf}",
                           rest, w) for leaf in ("query", "key", "value")):
                    pass
                elif lin("attention.output.dense",
                         f"{base}/attention_output", rest, w):
                    pass
                elif ln("attention.output.LayerNorm",
                        f"{base}/attention_norm", rest, w):
                    pass
                elif lin("intermediate.dense", f"{base}/intermediate",
                         rest, w):
                    pass
                elif lin("output.dense", f"{base}/output", rest, w):
                    pass
                elif ln("output.LayerNorm", f"{base}/output_norm", rest, w):
                    pass
            continue

        # ------------------------------------------------- projections
        if (m := re.fullmatch(
                r"input_proj_vision\.(\d+)\.0\.(weight|bias)", name)):
            put(f"input_proj_{m.group(1)}_conv/"
                f"{'kernel' if m.group(2) == 'weight' else 'bias'}",
                w, "conv" if m.group(2) == "weight" else "raw")
            continue
        if (m := re.fullmatch(
                r"input_proj_vision\.(\d+)\.1\.(weight|bias)", name)):
            put(f"input_proj_{m.group(1)}_norm/"
                f"{'scale' if m.group(2) == 'weight' else 'bias'}", w)
            continue
        if lin("text_projection", "text_projection", name, w):
            continue
        if name == "level_embed":
            put("level_embed", w)
            continue
        if name == "query_position_embeddings.weight":
            put("query_position_embeddings", w)
            continue

        # ---------------------------------------------------- encoder
        if (m := re.fullmatch(r"encoder\.layers\.(\d+)\.(.+)", name)):
            li, rest = m.groups()
            base = f"encoder_layers_{li}"
            if rest in ("fusion_layer.vision_param",
                        "fusion_layer.text_param"):
                put(f"{base}/fusion_layer/{rest.split('.')[1]}", w)
                continue
            handled = (
                ln("fusion_layer.layer_norm_vision",
                   f"{base}/fusion_layer/layer_norm_vision", rest, w)
                or ln("fusion_layer.layer_norm_text",
                      f"{base}/fusion_layer/layer_norm_text", rest, w)
                or any(lin(f"fusion_layer.attn.{leaf}",
                           f"{base}/fusion_layer/attn/{leaf}", rest, w)
                       for leaf in ("vision_proj", "text_proj",
                                    "values_vision_proj",
                                    "values_text_proj", "out_vision_proj",
                                    "out_text_proj"))
                or mha("text_enhancer_layer.self_attn",
                       f"{base}/text_enhancer_layer/self_attn", rest, w)
                or lin("text_enhancer_layer.fc1",
                       f"{base}/text_enhancer_layer/fc1", rest, w)
                or lin("text_enhancer_layer.fc2",
                       f"{base}/text_enhancer_layer/fc2", rest, w)
                or ln("text_enhancer_layer.layer_norm_before",
                      f"{base}/text_enhancer_layer/layer_norm_before",
                      rest, w)
                or ln("text_enhancer_layer.layer_norm_after",
                      f"{base}/text_enhancer_layer/layer_norm_after",
                      rest, w)
                or deform("deformable_layer.self_attn",
                          f"{base}/deformable_layer/self_attn", rest, w)
                or ln("deformable_layer.self_attn_layer_norm",
                      f"{base}/deformable_layer/self_attn_layer_norm",
                      rest, w)
                or lin("deformable_layer.fc1",
                       f"{base}/deformable_layer/fc1", rest, w)
                or lin("deformable_layer.fc2",
                       f"{base}/deformable_layer/fc2", rest, w)
                or ln("deformable_layer.final_layer_norm",
                      f"{base}/deformable_layer/final_layer_norm", rest, w)
            )
            assert handled, f"unmapped encoder leaf: {name}"
            continue

        # ------------------------------------------- query selection
        if lin("enc_output", "enc_output", name, w):
            continue
        if ln("enc_output_norm", "enc_output_norm", name, w):
            continue
        if mlp_head("encoder_output_bbox_embed", "encoder_output_bbox_embed",
                    name, w):
            continue

        # ---------------------------------------------------- decoder
        if ln("decoder.layer_norm", "decoder_layer_norm", name, w):
            continue
        if mlp_head("decoder.reference_points_head", "reference_points_head",
                    name, w):
            continue
        if name.startswith("decoder.bbox_embed."):
            continue    # tied to bbox_embed.0 (handled above)
        if (m := re.fullmatch(r"decoder\.layers\.(\d+)\.(.+)", name)):
            li, rest = m.groups()
            base = f"decoder_layers_{li}"
            handled = (
                mha("self_attn", f"{base}/self_attn", rest, w)
                or ln("self_attn_layer_norm", f"{base}/self_attn_layer_norm",
                      rest, w)
                or mha("encoder_attn_text", f"{base}/encoder_attn_text",
                       rest, w)
                or ln("encoder_attn_text_layer_norm",
                      f"{base}/encoder_attn_text_layer_norm", rest, w)
                or deform("encoder_attn", f"{base}/encoder_attn", rest, w)
                or ln("encoder_attn_layer_norm",
                      f"{base}/encoder_attn_layer_norm", rest, w)
                or lin("fc1", f"{base}/fc1", rest, w)
                or lin("fc2", f"{base}/fc2", rest, w)
                or ln("final_layer_norm", f"{base}/final_layer_norm",
                      rest, w)
            )
            assert handled, f"unmapped decoder leaf: {name}"
            continue
    return params


# IP-Adapter checkpoint filename stems per variant (SD1.5 and SDXL
# checkpoints share the group format; the ports are dimension-agnostic)
_IP_FILES = {
    "base": ("ip-adapter_sd15", "ip-adapter_sdxl"),
    "plus": ("ip-adapter-plus_sd15", "ip-adapter-plus_sdxl_vit-h"),
    "full": ("ip-adapter-full-face_sd15",),
}


def load_bundle(cfg, weights_dir: str, *, ip_variant: str | None = None):
    """Assemble a Bundle from a directory of ported checkpoints:

    ``unet.safetensors``, ``vae.safetensors``, ``text_encoder.safetensors``,
    ``controlnet.safetensors``, ``ip-adapter_sd15.bin``, tokenizer assets
    (``merges.txt``/``vocab.json``).  Missing pieces fall back to random
    init with a warning.

    ``ip_variant``: "base" (ImageProjModel, ip-adapter_sd15), "plus"
    (Resampler, ip-adapter-plus_sd15) or "full" (MLPProjModel,
    ip-adapter-full-face_sd15).  Defaults to "plus" when only the plus
    checkpoint exists in ``weights_dir``, else "base"; "full" must be
    requested explicitly."""
    import jax

    from ..pipelines.bundle import init_bundle

    def _have(variant):
        return any(
            os.path.exists(os.path.join(weights_dir, stem + ext))
            for stem in _IP_FILES[variant]
            for ext in (".bin", ".safetensors"))

    if ip_variant is None:
        ip_variant = "plus" if (_have("plus") and not _have("base")) \
            else "base"
    bundle = init_bundle(
        cfg, jax.random.key(0), with_ip=True, with_controlnet=True,
        with_vision=True, tokenizer_assets=weights_dir,
        ip_variant=ip_variant,
    )

    def maybe(path):
        p = os.path.join(weights_dir, path)
        return load_state_dict(p) if os.path.exists(p) else None

    loaded = []
    sd = maybe("unet.safetensors")
    if sd:
        bundle.unet_params = port_unet(sd)
        if bundle.unet_ip_params is not None:
            # the IP UNet (what the orchestrator runs) shares every base
            # leaf; only to_k_ip/to_v_ip stay from init until the IP ckpt
            bundle.unet_ip_params = merge_into(bundle.unet_ip_params,
                                               bundle.unet_params)
        loaded.append("unet")
    sd = maybe("vae.safetensors")
    if sd:
        bundle.vae_params = port_vae(sd)
        loaded.append("vae")
    sd = maybe("text_encoder.safetensors")
    if sd:
        bundle.text_params = port_clip_text(sd)
        loaded.append("text")
    sd = maybe("text_encoder_2.safetensors")
    if sd and bundle.text2 is not None:
        bundle.text2_params = port_clip_text(sd)
        loaded.append("text2")
    sd = maybe("controlnet.safetensors")
    if sd and bundle.controlnet is not None:
        bundle.controlnet_params = port_controlnet(sd)
        loaded.append("controlnet")
    sd = maybe("image_encoder.safetensors")
    if sd and bundle.vision is not None:
        bundle.vision_params = port_clip_vision(sd)
        loaded.append("vision")
    sd = maybe("sam.safetensors")
    if sd:
        # no init: port_sam yields the complete SamHF tree (coverage-
        # asserted in tests), so skip the expensive full-res sam.init
        from ..perception.sam_hf import SamHF, SamHFConfig

        bundle.sam = SamHF(SamHFConfig())
        bundle.sam_params = port_sam(sd)
        loaded.append("sam")
    sd = maybe("lineart.safetensors")
    if sd:
        from ..ops.lineart import LineartGenerator

        bundle.lineart = LineartGenerator()
        bundle.lineart_params = port_lineart(sd)
        loaded.append("lineart")
    sd = maybe("gdino.safetensors")
    vocab_path = os.path.join(weights_dir, "gdino_vocab.txt")
    if sd and os.path.exists(vocab_path):
        from ..perception.gdino import (
            GroundingDinoBackend, GroundingDinoConfig, WordPieceTokenizer,
        )

        bundle.detector = GroundingDinoBackend(
            GroundingDinoConfig(), port_grounding_dino(sd),
            WordPieceTokenizer(vocab_path))
        loaded.append("gdino")
    sd = maybe("owl.safetensors")
    if sd and (bundle.detector is None
               or os.environ.get("THEATERGEN_DETECTOR") == "owl"):
        # google/owlvit-base-patch32 — the MXU-friendly detector; used
        # when GroundingDINO weights are absent, or forced with
        # THEATERGEN_DETECTOR=owl (tokenizer is the CLIP BPE from the
        # bundle's merges.txt/vocab.json assets)
        from ..config import CLIPTextConfig, CLIPVisionConfig
        from ..perception.owl import OwlBackend, OwlDetector
        from ..utils.tokenizer import load_tokenizer

        tcfg = CLIPTextConfig(
            hidden_size=512, intermediate_size=2048, num_layers=12,
            num_heads=8, max_length=16, projection_dim=512,
            use_text_projection=True)
        vcfg = CLIPVisionConfig(
            image_size=768, patch_size=32, hidden_size=768,
            intermediate_size=3072, num_layers=12, num_heads=12,
            projection_dim=512)
        bundle.detector = OwlBackend(
            OwlDetector(vcfg, tcfg), port_owl(sd),
            load_tokenizer(weights_dir), max_length=tcfg.max_length)
        loaded.append("owl")
    port_proj = {"base": port_image_proj, "plus": port_resampler,
                 "full": port_mlp_proj}[bundle.ip_variant]
    ip = None
    for stem in _IP_FILES[bundle.ip_variant]:
        ip = maybe(stem + ".bin") or maybe(stem + ".safetensors")
        if ip:
            break
    if ip:
        bundle.image_proj_params = port_proj(
            {k: v for k, v in ip.items() if k.startswith("image_proj")})
        if bundle.unet_ip_params is not None:
            bundle.unet_ip_params = port_ip_adapter(
                {k: v for k, v in ip.items() if k.startswith("ip_adapter")},
                bundle.unet_ip_params)
        loaded.append("ip_adapter")
    expected = ["unet", "vae", "text", "controlnet", "vision", "ip_adapter"]
    missing = [e for e in expected if e not in loaded]
    if missing:
        print(f"[load_bundle] WARNING: no checkpoints for {missing} — "
              "those components keep RANDOM weights")
    return bundle
