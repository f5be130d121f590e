"""Export latent-level goldens from the torch reference stack.

Companion to ``export_weights.py``: run it on the SAME machine (network
egress + torch + diffusers 0.21.x, the reference's pin), then copy the
output directory next to the weights directory.  ``scripts/
golden_parity.py --goldens DIR --weights WEIGHTS`` on the TPU side then
compares our denoise loop against these latent-for-latent (SURVEY §7
"RNG parity"; VERDICT r3 next-#2).

What one case records (see ``theatergen_tpu/eval/goldens.py`` for the
layout): the initial noise drawn through the reference's seeding
discipline (``torch.manual_seed`` generator, ``utils/latents.py:
138-154``), the CLIP text embeddings (uncond ++ cond, the order
diffusers' ``_encode_prompt`` concatenates, matching the reference's
CFG pair assembly ``models/pipelines.py:369-370``), the latent entering
EVERY DDIM step plus the final latent, and the decoded image.  The
denoise loop below is written out explicitly (rather than driving
``pipe.__call__``) so the trajectory semantics are unambiguous: step i's
entry = ``trajectory[i]``; ``trajectory[num_steps]`` = final.  The
scheduler is the reference's exact DDIM configuration
(``generate.py:68-76``: scaled_linear 0.00085→0.012, 1000 train steps,
``clip_sample=False, set_alpha_to_one=False, steps_offset=1``).

Usage (weights machine)::

    python scripts/export_reference_goldens.py --out /path/to/goldens \
        [--fp16] [--steps 50] [--device cuda]

Defaults export three cases: two full 50-step prompts (one of them the
reference's own per-character prompt template,
``models/pipelines.py:216-221``) and one quick 8-step case for fast
iteration on the TPU side.
"""

from __future__ import annotations

import argparse
import json
import os

CASES = [
    # (name, prompt, negative, steps, seed)
    ("knight_ddim50",
     "full-body picture of a red knight",        # ref prompt template,
     # ref single-object negative prompt class (prompt.py)
     "longbody, lowres, bad anatomy, missing fingers, extra digit",
     50, 0),
    ("dragon_ddim50",
     "a green dragon flying over snowy mountains", "", 50, 1),
    ("quick_ddim8",
     "a photo of an astronaut riding a horse", "", 8, 2),
]


def export(out: str, device: str = "cuda", fp16: bool = False,
           steps_override: int | None = None) -> None:
    import numpy as np
    import torch
    from diffusers import AutoencoderKL, DDIMScheduler, UNet2DConditionModel
    from transformers import CLIPTextModel, CLIPTokenizer

    dtype = torch.float16 if fp16 else torch.float32
    unet = UNet2DConditionModel.from_pretrained(
        "runwayml/stable-diffusion-v1-5", subfolder="unet",
        torch_dtype=dtype).to(device).eval()
    vae = AutoencoderKL.from_pretrained(
        "stabilityai/sd-vae-ft-mse", torch_dtype=dtype).to(device).eval()
    text = CLIPTextModel.from_pretrained(
        "runwayml/stable-diffusion-v1-5", subfolder="text_encoder",
        torch_dtype=dtype).to(device).eval()
    tok = CLIPTokenizer.from_pretrained(
        "runwayml/stable-diffusion-v1-5", subfolder="tokenizer")
    sched = DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, clip_sample=False,
        set_alpha_to_one=False, steps_offset=1)

    def encode(texts):
        ids = tok(texts, padding="max_length", max_length=77,
                  truncation=True, return_tensors="pt").input_ids.to(device)
        with torch.no_grad():
            return text(ids)[0]

    os.makedirs(out, exist_ok=True)
    for name, prompt, negative, steps, seed in CASES:
        steps = steps_override or steps
        d = os.path.join(out, name)
        os.makedirs(d, exist_ok=True)
        gen = torch.Generator("cpu").manual_seed(seed)
        lat = torch.randn((1, 4, 64, 64), generator=gen).to(device, dtype)
        lat = lat * sched.init_noise_sigma        # 1.0 for DDIM
        ctx = torch.cat([encode([negative]), encode([prompt])], dim=0)

        sched.set_timesteps(steps, device=device)
        traj = [lat.float().cpu().numpy()]
        guidance = 7.5                            # theatergen.py:24
        with torch.no_grad():
            for t in sched.timesteps:
                eps = unet(torch.cat([lat, lat]), t,
                           encoder_hidden_states=ctx).sample
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + guidance * (eps_c - eps_u)
                lat = sched.step(eps, t, lat).prev_sample
                traj.append(lat.float().cpu().numpy())
            img = vae.decode(lat / vae.config.scaling_factor).sample
        img = ((img / 2 + 0.5).clamp(0, 1)[0].permute(1, 2, 0)
               .float().cpu().numpy())

        np.save(os.path.join(d, "init_latents.npy"), traj[0])
        np.save(os.path.join(d, "context.npy"),
                ctx.float().cpu().numpy())
        np.save(os.path.join(d, "trajectory.npy"),
                np.stack(traj, axis=0))
        from PIL import Image

        Image.fromarray((img * 255).astype("uint8")).save(
            os.path.join(d, "image.png"))
        with open(os.path.join(d, "meta.json"), "w") as f:
            json.dump(dict(prompt=prompt, negative=negative,
                           num_steps=steps, guidance_scale=guidance,
                           seed=seed, model="sd15",
                           torch_dtype=str(dtype)), f, indent=1)
        print(f"wrote {name}: {steps} steps, seed {seed}")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--device", default="cuda")
    ap.add_argument("--fp16", action="store_true",
                    help="fp16 UNet/VAE (deployment-matching; fp32 default "
                         "gives the cleanest parity target)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override every case's step count")
    args = ap.parse_args()
    export(args.out, args.device, args.fp16, args.steps)


if __name__ == "__main__":
    main()
