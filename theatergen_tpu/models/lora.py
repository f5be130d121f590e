"""LoRA loading: merge low-rank adapter deltas into param trees.

Enables LCM-LoRA-style acceleration modules (PAPERS.md: arXiv 2311.05556 —
a universal Stable-Diffusion LoRA that cuts sampling to 4-8 steps) and any
style/subject LoRA, without new module types: deltas merge into the
existing kernels (``W' = W + scale · B·A``), so every pipeline and the tp
sharding rules keep working unchanged.

Supported checkpoint convention: peft/diffusers pairs
``{module}.lora_A.weight`` ``[r, in]`` / ``{module}.lora_B.weight``
``[out, r]`` (kohya's ``lora_down/lora_up`` aliases accepted), with module
names in diffusers UNet dotted form (optionally ``unet.``-prefixed).
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np

from .weights import port_unet


def extract_lora_pairs(sd: Dict[str, np.ndarray]) -> Dict[str, Tuple]:
    """state dict → {diffusers module name: (A [r,in], B [out,r])}."""
    pairs: Dict[str, dict] = {}
    for name, w in sd.items():
        name = re.sub(r"^(unet|lora_unet)\.", "", name)
        m = re.fullmatch(r"(.+)\.(lora_A|lora_down)\.weight", name)
        if m:
            pairs.setdefault(m.group(1), {})["A"] = np.asarray(w, np.float32)
            continue
        m = re.fullmatch(r"(.+)\.(lora_B|lora_up)\.weight", name)
        if m:
            pairs.setdefault(m.group(1), {})["B"] = np.asarray(w, np.float32)
    return {k: (v["A"], v["B"]) for k, v in pairs.items()
            if "A" in v and "B" in v}


def apply_lora_unet(params: Dict[str, Any], lora_sd: Dict[str, np.ndarray],
                    scale: float = 1.0) -> Dict[str, Any]:
    """Merge LoRA deltas into a (our-format) UNet param tree.

    Module names resolve through the same mapping as checkpoint porting
    (:func:`..models.weights.port_unet`), so any kernel that porting
    understands can carry a LoRA. Returns a new tree; unmatched LoRA
    modules raise (silent dropping would fake-apply an adapter).
    """
    import jax

    pairs = extract_lora_pairs(lora_sd)
    if not pairs:
        raise ValueError("no lora_A/lora_B pairs found in state dict")

    # build {our_path: delta [in, out]} via the port mapping on synthetic
    # full-weight names
    deltas = {}
    for module, (a, b) in pairs.items():
        delta_torch = b @ a                    # [out, in]
        synth = {f"{module}.weight": delta_torch}
        ported = port_unet(synth)
        leaves = jax.tree_util.tree_leaves_with_path(ported)
        if not leaves:
            raise ValueError(f"unmapped LoRA module: {module}")
        (path, delta), = leaves
        key = tuple(str(getattr(k, "key", k)) for k in path)
        deltas[key] = delta * scale

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
