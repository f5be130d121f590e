"""Latent-level golden parity against the torch reference.

The reference's RNG (``torch.manual_seed`` CPU generators,
``utils/latents.py:263,284``) cannot be reproduced by ``jax.random``, so
cross-framework parity needs *injection*: export the reference's actual
noise, text embeddings, and per-step latents once (on the weights
machine, ``scripts/export_reference_goldens.py``), then run our denoise
loop on the SAME inputs and compare latent-for-latent (SURVEY §7 "RNG
parity"; VERDICT r3 next-#2).

Golden bundle layout (one directory per case)::

    <goldens>/<case>/meta.json        prompt / negative / num_steps /
                                      guidance_scale / seed / model
    <goldens>/<case>/init_latents.npy [B, 4, h, w]    fp32, torch NCHW
    <goldens>/<case>/context.npy      [2B, 77, 768]   uncond ++ cond
                                      (diffusers order: negative first,
                                      ``pipeline_stable_diffusion.py``'s
                                      ``cat([negative, prompt])``)
    <goldens>/<case>/trajectory.npy   [S+1, B, 4, h, w] — latent entering
                                      each step + the final latent (the
                                      exporter records the init latents
                                      plus diffusers' ``callback(i, t,
                                      latents)`` after every step; this
                                      matches our ``sd.denoise``
                                      trajectory semantics exactly)
    <goldens>/<case>/image.png        the reference's decoded output

Everything on-disk is torch-layout NCHW so the exporter stays a dumb
``save``; this module converts to NHWC at load time.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

import numpy as np


@dataclasses.dataclass
class GoldenCase:
    name: str
    prompt: str
    negative: str
    num_steps: int
    guidance_scale: float
    seed: int
    model: str                              # "sd15" | "sdxl"
    init_latents: np.ndarray                # [B, h, w, 4] NHWC fp32
    context: Optional[np.ndarray] = None    # [2B, L, C] uncond ++ cond
    trajectory: Optional[np.ndarray] = None  # [S+1, B, h, w, 4] NHWC
    image: Optional[np.ndarray] = None      # [H, W, 3] float in [0, 1]


def _to_nhwc(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.moveaxis(a, -3, -1))


def _to_nchw(a: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.moveaxis(a, -1, -3))


def list_cases(goldens_dir: str) -> List[str]:
    return sorted(
        d for d in os.listdir(goldens_dir)
        if os.path.isfile(os.path.join(goldens_dir, d, "meta.json"))
    )


def load_case(goldens_dir: str, name: str) -> GoldenCase:
    d = os.path.join(goldens_dir, name)
    with open(os.path.join(d, "meta.json")) as f:
        meta = json.load(f)

    def opt(fname):
        p = os.path.join(d, fname)
        return np.load(p).astype(np.float32) if os.path.exists(p) else None

    init = np.load(os.path.join(d, "init_latents.npy")).astype(np.float32)
    traj = opt("trajectory.npy")
    image = None
    img_path = os.path.join(d, "image.png")
    if os.path.exists(img_path):
        from ..utils.vis import load_image_rgb

        image = load_image_rgb(img_path)
    return GoldenCase(
        name=name,
        prompt=meta["prompt"],
        negative=meta.get("negative", ""),
        num_steps=int(meta["num_steps"]),
        guidance_scale=float(meta.get("guidance_scale", 7.5)),
        seed=int(meta.get("seed", 0)),
        model=meta.get("model", "sd15"),
        init_latents=_to_nhwc(init),
        context=opt("context.npy"),
        trajectory=None if traj is None else _to_nhwc(traj),
        image=image,
    )


def save_case(
    goldens_dir: str,
    name: str,
    *,
    prompt: str,
    negative: str = "",
    num_steps: int,
    guidance_scale: float = 7.5,
    seed: int = 0,
    model: str = "sd15",
    init_latents: np.ndarray,               # NHWC (converted on write)
    context: Optional[np.ndarray] = None,
    trajectory: Optional[np.ndarray] = None,  # NHWC
    image: Optional[np.ndarray] = None,     # [H, W, 3] in [0, 1]
) -> str:
    """Write a case in the exporter's on-disk layout (NCHW).  Used by the
    self-test path (``scripts/golden_parity.py --self``) so the format and
    the loader are exercised without torch: a bundle exported from our own
    pipeline must reproduce itself to zero error through the same code
    path a reference bundle takes."""
    d = os.path.join(goldens_dir, name)
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(dict(prompt=prompt, negative=negative,
                       num_steps=num_steps, guidance_scale=guidance_scale,
                       seed=seed, model=model), f, indent=1)
    np.save(os.path.join(d, "init_latents.npy"),
            _to_nchw(np.asarray(init_latents, np.float32)))
    if context is not None:
        np.save(os.path.join(d, "context.npy"),
                np.asarray(context, np.float32))
    if trajectory is not None:
        np.save(os.path.join(d, "trajectory.npy"),
                _to_nchw(np.asarray(trajectory, np.float32)))
    if image is not None:
        from ..utils.vis import save_image_rgb

        save_image_rgb(os.path.join(d, "image.png"), image)
    return d


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 1.0) -> float:
    mse = float(np.mean((np.asarray(a, np.float64)
                         - np.asarray(b, np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))


def run_case(bundle, case: GoldenCase, *,
             use_own_text_encoder: bool = False) -> Dict:
    """Run our DDIM loop on the case's injected noise (+ context) and
    compare against the recorded reference trajectory/image.

    ``use_own_text_encoder=True`` re-encodes the prompt through OUR
    tokenizer + CLIP instead of injecting the exported embeddings —
    isolating text-stack parity from denoise parity (run both: if
    injected-context passes and own-encoder fails, the bug is in the
    text stack, not the UNet/scheduler).

    Returns raw metrics; thresholds are the caller's policy
    (:func:`verdict`).
    """
    import jax
    import jax.numpy as jnp

    from ..ops import scheduler as sched_ops
    from ..pipelines import sd

    cfg = bundle.cfg
    if use_own_text_encoder or case.context is None:
        context = np.asarray(
            sd.encode_prompts(bundle, case.prompt, case.negative))
    else:
        context = case.context
    sched = sched_ops.make_schedule(cfg.scheduler, case.num_steps)
    lat0 = jnp.asarray(case.init_latents)
    ctx = jnp.asarray(context)

    def unet_apply(x, t, c, **kw):
        return bundle.unet.apply(
            {"params": bundle.unet_params}, x,
            jnp.broadcast_to(t[None], (x.shape[0],)), c, **kw)

    @jax.jit
    def run(lat, c):
        return sd.denoise(unet_apply, sched, lat, c,
                          case.guidance_scale, collect_trajectory=True)

    final, traj = run(lat0, ctx)
    traj = np.asarray(traj, np.float32)
    out: Dict = {"case": case.name, "num_steps": case.num_steps,
                 "context": ("own-encoder" if use_own_text_encoder
                             or case.context is None else "injected")}
    if case.trajectory is not None:
        n = min(traj.shape[0], case.trajectory.shape[0])
        ref = case.trajectory[:n]
        ours = traj[:n]
        step_mse = np.mean((ours - ref) ** 2, axis=tuple(range(1, ref.ndim)))
        ref_var = float(np.var(ref[-1]))
        out["step_mse"] = [round(float(m), 6) for m in step_mse]
        out["final_mse"] = float(step_mse[-1])
        out["final_rel_mse"] = float(step_mse[-1] / max(ref_var, 1e-12))
    img = np.asarray(sd.decode_latents(bundle, final))
    if case.image is not None:
        h = min(img.shape[1], case.image.shape[0])
        w = min(img.shape[2], case.image.shape[1])
        out["image_psnr_db"] = round(psnr(img[0, :h, :w], case.image[:h, :w]), 2)
    return out


def verdict(metrics: Dict, *, final_rel_mse_max: float = 0.05,
            psnr_min: float = 25.0) -> bool:
    """Default pass policy: final latent relative MSE within 5% of the
    reference latent variance AND (when the reference image is present)
    PSNR ≥ 25 dB.  bf16-vs-fp16 accumulation across 50 steps makes
    bit-exactness impossible; these bounds are set so a *semantic* bug
    (wrong beta table, swapped uncond/cond, shifted timestep) fails by
    orders of magnitude while numeric drift passes.  Tighten after the
    first real-weights run establishes the observed drift."""
    ok = True
    if "final_rel_mse" in metrics:
        ok &= metrics["final_rel_mse"] <= final_rel_mse_max
    if "image_psnr_db" in metrics:
        ok &= metrics["image_psnr_db"] >= psnr_min
    return bool(ok)
