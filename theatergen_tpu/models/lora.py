"""LoRA loading: merge low-rank adapter deltas into param trees.

Enables LCM-LoRA-style acceleration modules (PAPERS.md: arXiv 2311.05556 —
a universal Stable-Diffusion LoRA that cuts sampling to 4-8 steps) and any
style/subject LoRA, without new module types: deltas merge into the
existing kernels (``W' = W + scale · B·A``), so every pipeline and the tp
sharding rules keep working unchanged.

Supported checkpoint conventions:

- **peft/diffusers** (e.g. latent-consistency/lcm-lora-sdv1-5):
  ``unet.{module}.lora_A.weight`` ``[r, in]`` /
  ``unet.{module}.lora_B.weight`` ``[out, r]`` with dotted diffusers
  module names; conv-layer LoRAs carry 4-D factors
  (``A [r, in, kh, kw]``, ``B [out, r, 1, 1]``).
- **kohya / webui**: ``lora_unet_{module_with_underscores}.lora_down`` /
  ``.lora_up`` plus per-module ``.alpha`` scalars (effective scale
  ``alpha / rank``); module names are converted back to diffusers dotted
  form.  ``lora_te_*`` (text-encoder) entries are ignored by the UNet
  merge.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from .weights import port_unet

# kohya flattens diffusers module paths with underscores; undo the
# indexed-collection and leaf flattening (the reference never loads
# LoRAs itself — this follows the public kohya convention so webui-format
# files and .alpha-scaled LoRAs load here)
_KOHYA_INDEXED = re.compile(
    r"(down_blocks|up_blocks|attentions|resnets|transformer_blocks|"
    r"downsamplers|upsamplers)_(\d+)_")
_KOHYA_LEAVES = [
    ("mid_block_", "mid_block."),
    (re.compile(r"attn(\d)_"), r"attn\1."),
    ("to_out_0", "to_out.0"),
    ("ff_net_0_proj", "ff.net.0.proj"),
    ("ff_net_2", "ff.net.2"),
]


def kohya_module_to_diffusers(name: str) -> str:
    """``down_blocks_0_attentions_1_transformer_blocks_0_attn1_to_q`` →
    ``down_blocks.0.attentions.1.transformer_blocks.0.attn1.to_q``."""
    s = _KOHYA_INDEXED.sub(r"\1.\2.", name)
    for pat, rep in _KOHYA_LEAVES:
        if isinstance(pat, str):
            s = s.replace(pat, rep)
        else:
            s = pat.sub(rep, s)
    return s


def extract_lora_pairs(sd: Dict[str, np.ndarray]) -> Dict[str, Tuple]:
    """state dict → {diffusers module name: (A, B, alpha-or-None)}."""
    pairs: Dict[str, dict] = {}

    def entry(raw_module: str, kohya: bool) -> dict:
        module = (kohya_module_to_diffusers(raw_module) if kohya
                  else raw_module)
        return pairs.setdefault(module, {})

    for name, w in sd.items():
        if name.startswith(("lora_te", "text_encoder.")):
            continue  # text-encoder LoRA: not part of the UNet merge
        kohya = name.startswith("lora_unet_")
        if kohya:
            name = name[len("lora_unet_"):]
        else:
            name = re.sub(r"^(unet|lora_unet)\.", "", name)
        m = re.fullmatch(r"(.+)\.(lora_A|lora_down)\.weight", name)
        if m:
            entry(m.group(1), kohya)["A"] = np.asarray(w, np.float32)
            continue
        m = re.fullmatch(r"(.+)\.(lora_B|lora_up)\.weight", name)
        if m:
            entry(m.group(1), kohya)["B"] = np.asarray(w, np.float32)
            continue
        m = re.fullmatch(r"(.+)\.alpha", name)
        if m:
            entry(m.group(1), kohya)["alpha"] = float(np.asarray(w))
    return {k: (v["A"], v["B"], v.get("alpha")) for k, v in pairs.items()
            if "A" in v and "B" in v}


def _delta(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Low-rank delta in torch weight layout: 2-D Linears ``B @ A``
    ``[out, in]``; conv factors ``A [r, in, kh, kw]`` × ``B [out, r, 1, 1]``
    → ``[out, in, kh, kw]``."""
    if a.ndim == 2 and b.ndim == 2:
        return b @ a
    if a.ndim == 4 and b.ndim == 4:
        if b.shape[2:] != (1, 1):
            raise ValueError(f"unsupported conv LoRA up-factor {b.shape}")
        return np.tensordot(b[:, :, 0, 0], a, axes=(1, 0))
    raise ValueError(f"unsupported LoRA factor ranks {a.shape} x {b.shape}")


def apply_lora_unet(params: Dict[str, Any], lora_sd: Dict[str, np.ndarray],
                    scale: float = 1.0) -> Dict[str, Any]:
    """Merge LoRA deltas into a (our-format) UNet param tree.

    Module names resolve through the same mapping as checkpoint porting
    (:func:`..models.weights.port_unet`), so any kernel that porting
    understands can carry a LoRA — including conv layers (LCM-LoRA
    trains conv1/conv2/conv_shortcut/samplers too).  Per-module kohya
    ``alpha`` rescales that module's delta by ``alpha / rank``;
    ``scale`` multiplies everything.  Returns a new tree; unmatched LoRA
    modules raise (silent dropping would fake-apply an adapter).
    """
    import jax

    pairs = extract_lora_pairs(lora_sd)
    if not pairs:
        raise ValueError("no lora_A/lora_B pairs found in state dict")

    # build {our_path: delta} via the port mapping on synthetic
    # full-weight names
    deltas = {}
    for module, (a, b, alpha) in pairs.items():
        rank = a.shape[0]
        mscale = scale * (alpha / rank if alpha is not None else 1.0)
        synth = {f"{module}.weight": _delta(a, b)}
        ported = port_unet(synth)
        leaves = jax.tree_util.tree_leaves_with_path(ported)
        if not leaves:
            raise ValueError(f"unmapped LoRA module: {module}")
        (path, delta), = leaves
        key = tuple(str(getattr(k, "key", k)) for k in path)
        deltas[key] = delta * mscale

    def walk(tree, prefix=()):
        out = {}
        for k, v in tree.items():
            p = prefix + (k,)
            if isinstance(v, dict):
                out[k] = walk(v, p)
            elif p in deltas:
                out[k] = v + deltas.pop(p).astype(v.dtype)
            else:
                out[k] = v
        return out

    merged = walk(params)
    if deltas:
        raise ValueError(
            f"LoRA modules with no matching param: {sorted(deltas)[:5]}")
    return merged
