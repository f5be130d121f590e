"""Export latent-level goldens from the torch reference stack.

Companion to ``export_weights.py``: run it on the SAME machine (network
egress + torch + diffusers 0.21.x, the reference's pin), then copy the
output directory next to the weights directory.  ``scripts/
golden_parity.py --goldens DIR --weights WEIGHTS`` on the TPU side then
compares our denoise loop against these latent-for-latent (SURVEY §7
"RNG parity"; VERDICT r3 next-#2, extended to the reference's actual
hot paths per VERDICT r4 next-#2).

Case kinds exported (layout: ``theatergen_tpu/eval/goldens.py``):

- three plain ``text2img`` SD1.5 cases (bare UNet + DDIM + CFG);
- one ``character_ip`` case — the per-character IP-Adapter pass
  (reference ``models/pipelines.py:175-490``): 81-token context
  (77 text + 4 image tokens through ImageProjModel), decoupled image
  attention at scale 0.4 (``ip_adapter/attention_processor.py:396-553``,
  re-implemented below from the published IP-Adapter formulation);
- one ``final_cn`` case — the composed final pass (reference
  ``models/pipelines.py:592-857``): ControlNet-lineart residuals each
  step with a text-only context (the reference's ``CNAttnProcessor``
  drops the IP tokens), the IP-UNet at scale 0.1, frozen-mask latent
  replacement from the composed ``latents_all`` for the first
  ``frozen_steps`` steps (``:833-834``);
- one ``sdxl`` base case (reference ``generate.py:103-133``) with
  dual-tower context + pooled embeds + time_ids under the deterministic
  DDIM schedule (isolates UNet/text-stack parity from sampler RNG);
- one ``sdxl_ea`` case under the reference's ACTUAL sampler
  (EulerAncestral from the SDXL base scheduler config,
  ``generate.py:125``) with the per-step ancestral noise recorded by
  cloning the torch generator state, so the TPU side replays the exact
  draws (``ea_step`` takes explicit noise).

Every recorded trajectory uses the same semantics: ``trajectory[i]`` is
the latent ENTERING step i (post frozen replacement for ``final_cn``),
``trajectory[num_steps]`` the final latent.  The loops are written out
explicitly rather than driving ``pipe.__call__`` so those semantics are
unambiguous.  The scheduler is the reference's exact DDIM configuration
(``generate.py:68-76``: scaled_linear 0.00085→0.012, 1000 train steps,
``clip_sample=False, set_alpha_to_one=False, steps_offset=1``).

Usage (weights machine)::

    python scripts/export_reference_goldens.py --out /path/to/goldens \
        [--fp16] [--steps 50] [--device cuda] \
        [--ip_weights /path/to/IP-Adapter/models] \
        [--controlnet lllyasviel/control_v11p_sd15_lineart] \
        [--sdxl stabilityai/stable-diffusion-xl-base-1.0]

``--ip_weights`` points at a directory containing ``ip-adapter_sd15.bin``
and ``image_encoder/`` (the h94/IP-Adapter layout the reference
downloads, ``README.md:52-58``).  Cases whose dependencies are missing
are skipped with a warning so the plain cases always export.
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

# the reference's per-character prompt assembly (models/pipelines.py:
# 216-221) and its negative class
IP_PROMPT = "full-body picture of a red knight"
IP_NEGATIVE = ("background, multiple objects, incomplete, lowres, "
               "bad anatomy, low quality, obscured")


def _make_scheduler():
    from diffusers import DDIMScheduler

    return DDIMScheduler(
        beta_start=0.00085, beta_end=0.012, beta_schedule="scaled_linear",
        num_train_timesteps=1000, clip_sample=False,
        set_alpha_to_one=False, steps_offset=1)


def _save_common(d, *, prompt, negative, steps, guidance, seed, model,
                 kind="text2img", ip_scale=0.0, frozen_steps=0,
                 controlnet_scale=1.0, lat0, ctx, traj, img, extras=None):
    import numpy as np
    from PIL import Image

    os.makedirs(d, exist_ok=True)
    np.save(os.path.join(d, "init_latents.npy"), lat0)
    np.save(os.path.join(d, "context.npy"), ctx)
    np.save(os.path.join(d, "trajectory.npy"), np.stack(traj, axis=0))
    for fname, arr in (extras or {}).items():
        np.save(os.path.join(d, fname), arr)
    Image.fromarray((img * 255).astype("uint8")).save(
        os.path.join(d, "image.png"))
    with open(os.path.join(d, "meta.json"), "w") as f:
        json.dump(dict(prompt=prompt, negative=negative, num_steps=steps,
                       guidance_scale=guidance, seed=seed, model=model,
                       kind=kind, ip_scale=ip_scale,
                       frozen_steps=frozen_steps,
                       controlnet_scale=controlnet_scale), f, indent=1)


def _decode(vae, lat):
    import torch

    with torch.no_grad():
        img = vae.decode(lat / vae.config.scaling_factor).sample
    return ((img / 2 + 0.5).clamp(0, 1)[0].permute(1, 2, 0)
            .float().cpu().numpy())


class _SD15:
    """The plain SD1.5 stack, loaded once and shared across cases."""

    def __init__(self, device, dtype):
        import torch
        from diffusers import AutoencoderKL, UNet2DConditionModel
        from transformers import CLIPTextModel, CLIPTokenizer

        self.device, self.dtype = device, dtype
        self.unet = UNet2DConditionModel.from_pretrained(
            "runwayml/stable-diffusion-v1-5", subfolder="unet",
            torch_dtype=dtype).to(device).eval()
        self.vae = AutoencoderKL.from_pretrained(
            "stabilityai/sd-vae-ft-mse", torch_dtype=dtype).to(device).eval()
        self.text = CLIPTextModel.from_pretrained(
            "runwayml/stable-diffusion-v1-5", subfolder="text_encoder",
            torch_dtype=dtype).to(device).eval()
        self.tok = CLIPTokenizer.from_pretrained(
            "runwayml/stable-diffusion-v1-5", subfolder="tokenizer")
        self._torch = torch

    def encode(self, texts):
        import torch

        ids = self.tok(texts, padding="max_length", max_length=77,
                       truncation=True,
                       return_tensors="pt").input_ids.to(self.device)
        with torch.no_grad():
            return self.text(ids)[0]


# ---------------------------------------------------------------------------
# IP-Adapter (decoupled image attention), re-implemented from the
# published formulation (arXiv 2308.06721 eq. 6; the reference vendors it
# as ip_adapter/attention_processor.py:396-553): attention over the 77
# text tokens with the frozen to_k/to_v plus attention over the 4 image
# tokens with the adapter's to_k_ip/to_v_ip, summed at `scale`.
# ---------------------------------------------------------------------------

def _make_ip_proj(torch, state, dtype, device):
    """ImageProjModel: linear CLIP embed -> 4 context tokens + LayerNorm
    (h94/IP-Adapter sd15 base; state keys proj.*, norm.*)."""
    proj_w = state["proj.weight"]
    clip_dim = proj_w.shape[1]
    out = proj_w.shape[0]
    cross = state["norm.weight"].shape[0]
    n_tokens = out // cross

    class Proj(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.proj = torch.nn.Linear(clip_dim, out)
            self.norm = torch.nn.LayerNorm(cross)

        def forward(self, e):
            t = self.proj(e).reshape(e.shape[0], n_tokens, cross)
            return self.norm(t)

    m = Proj()
    m.load_state_dict(state)
    return m.to(device, dtype).eval(), n_tokens


def install_ip_adapter(sd: _SD15, ip_weights: str):
    """Load ip-adapter_sd15.bin + image encoder; swap every attn2
    processor for a decoupled IP processor.  Returns
    (set_scale, get_image_embeds(pil) -> (clip_embeds, cond4, uncond4))."""
    import torch
    import torch.nn.functional as F
    from transformers import (
        CLIPImageProcessor, CLIPVisionModelWithProjection,
    )

    ckpt = torch.load(os.path.join(ip_weights, "ip-adapter_sd15.bin"),
                      map_location="cpu")
    proj, n_tokens = _make_ip_proj(torch, ckpt["image_proj"],
                                   sd.dtype, sd.device)
    enc = CLIPVisionModelWithProjection.from_pretrained(
        os.path.join(ip_weights, "image_encoder"),
        torch_dtype=sd.dtype).to(sd.device).eval()
    clip_proc = CLIPImageProcessor()

    class IPProc(torch.nn.Module):
        def __init__(self, hidden, cross):
            super().__init__()
            self.scale = 1.0
            self.to_k_ip = torch.nn.Linear(cross, hidden, bias=False)
            self.to_v_ip = torch.nn.Linear(cross, hidden, bias=False)

        def __call__(self, attn, hidden_states, encoder_hidden_states=None,
                     attention_mask=None, temb=None, **kw):
            ehs = (hidden_states if encoder_hidden_states is None
                   else encoder_hidden_states)
            text, ip = ehs[:, :-n_tokens], ehs[:, -n_tokens:]
            q = attn.to_q(hidden_states)
            k, v = attn.to_k(text), attn.to_v(text)
            heads = attn.heads

            def mha(q, k, v):
                b, s, c = q.shape
                q_ = q.reshape(b, s, heads, c // heads).transpose(1, 2)
                k_ = k.reshape(b, k.shape[1], heads, c // heads).transpose(1, 2)
                v_ = v.reshape(b, v.shape[1], heads, c // heads).transpose(1, 2)
                o = F.scaled_dot_product_attention(q_, k_, v_)
                return o.transpose(1, 2).reshape(b, s, c)

            out = mha(q, k, v)
            k_ip, v_ip = self.to_k_ip(ip), self.to_v_ip(ip)
            out = out + self.scale * mha(q, k_ip, v_ip)
            out = attn.to_out[0](out)
            return attn.to_out[1](out)

    # install: attn2 gets an IP processor; state-dict indices follow
    # unet.attn_processors enumeration order (the load contract of the
    # published IPAdapter.load_ip_adapter)
    procs = {}
    ip_state = ckpt["ip_adapter"]
    for i, name in enumerate(sd.unet.attn_processors.keys()):
        if name.endswith("attn2.processor"):
            cross = sd.unet.config.cross_attention_dim
            hidden = ip_state[f"{i}.to_k_ip.weight"].shape[0]
            p = IPProc(hidden, cross)
            p.load_state_dict({
                "to_k_ip.weight": ip_state[f"{i}.to_k_ip.weight"],
                "to_v_ip.weight": ip_state[f"{i}.to_v_ip.weight"]})
            procs[name] = p.to(sd.device, sd.dtype)
        else:
            from diffusers.models.attention_processor import AttnProcessor2_0

            procs[name] = AttnProcessor2_0()
    sd.unet.set_attn_processor(procs)

    def set_scale(s):
        for p in procs.values():
            if hasattr(p, "scale"):
                p.scale = s

    def get_image_embeds(pil_image):
        with torch.no_grad():
            px = clip_proc(images=pil_image,
                           return_tensors="pt").pixel_values
            clip_embeds = enc(px.to(sd.device, sd.dtype)).image_embeds
            cond = proj(clip_embeds)
            uncond = proj(torch.zeros_like(clip_embeds))
        return clip_embeds, cond, uncond

    return set_scale, get_image_embeds


def _synthetic_rgb(seed, size=512):
    """Deterministic synthetic photo stand-in (no dataset dependency)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:size, 0:size].astype(np.float32) / size
    img = np.stack([0.5 + 0.5 * np.sin(6.28 * (xx + rng.random())),
                    0.5 + 0.5 * np.cos(6.28 * (yy + rng.random())),
                    0.5 + 0.5 * np.sin(6.28 * (xx * yy + rng.random()))],
                   axis=-1)
    # a bright square "character" patch the lineart picks up
    img[size // 4: size // 2, size // 4: size // 2] = (0.9, 0.1, 0.1)
    return (img * 255).astype(np.uint8)


def _synthetic_lineart(img_u8):
    """Deterministic edge sketch of an RGB uint8 image (stand-in for the
    reference's lineart annotator — parity only needs the SAME cond
    image on both sides, not a faithful detector)."""
    import numpy as np

    g = img_u8.astype(np.float32).mean(-1) / 255.0
    gx = np.abs(np.diff(g, axis=0, prepend=g[:1]))
    gy = np.abs(np.diff(g, axis=1, prepend=g[:, :1]))
    edges = np.clip((gx + gy) * 4.0, 0, 1)
    return np.repeat(edges[..., None], 3, axis=-1).astype(np.float32)


def export_plain(sd: _SD15, out, steps_override=None):
    import numpy as np
    import torch

    sched = _make_scheduler()
    for name, prompt, negative, steps, seed in CASES:
        steps = steps_override or steps
        gen = torch.Generator("cpu").manual_seed(seed)
        lat = torch.randn((1, 4, 64, 64), generator=gen).to(
            sd.device, sd.dtype)
        lat = lat * sched.init_noise_sigma        # 1.0 for DDIM
        ctx = torch.cat([sd.encode([negative]), sd.encode([prompt])], dim=0)

        sched.set_timesteps(steps, device=sd.device)
        traj = [lat.float().cpu().numpy()]
        guidance = 7.5                            # theatergen.py:24
        with torch.no_grad():
            for t in sched.timesteps:
                eps = sd.unet(torch.cat([lat, lat]), t,
                              encoder_hidden_states=ctx).sample
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + guidance * (eps_c - eps_u)
                lat = sched.step(eps, t, lat).prev_sample
                traj.append(lat.float().cpu().numpy())
        img = _decode(sd.vae, lat)
        _save_common(os.path.join(out, name), prompt=prompt,
                     negative=negative, steps=steps, guidance=guidance,
                     seed=seed, model="sd15",
                     lat0=traj[0], ctx=ctx.float().cpu().numpy(),
                     traj=traj, img=img)
        print(f"wrote {name}: {steps} steps, seed {seed}")


def export_pipecall(out, device, dtype, steps=50, seed=0):
    """Convention cross-check (VERDICT r4 weak-#4): the same knight case
    recorded by driving diffusers' OWN ``StableDiffusionPipeline.
    __call__`` with a latents callback, instead of our hand-written loop.
    If the hand-written exporter and our jax loop shared a misreading of
    diffusers' DDIM conventions, this bundle would disagree with both —
    the TPU side must pass against it too."""
    import numpy as np
    import torch
    from diffusers import StableDiffusionPipeline

    name, prompt, negative, _, _ = CASES[0]
    pipe = StableDiffusionPipeline.from_pretrained(
        "runwayml/stable-diffusion-v1-5", torch_dtype=dtype,
        scheduler=_make_scheduler(), safety_checker=None,
        requires_safety_checker=False).to(device)
    from diffusers import AutoencoderKL

    pipe.vae = AutoencoderKL.from_pretrained(
        "stabilityai/sd-vae-ft-mse",
        torch_dtype=dtype).to(device)        # generate.py:59,77
    gen = torch.Generator("cpu").manual_seed(seed)
    lat0 = torch.randn((1, 4, 64, 64), generator=gen).to(device, dtype)
    ctx = None
    if hasattr(pipe, "_encode_prompt"):    # diffusers 0.21 (the ref pin):
        with torch.no_grad():              # returns cat([uncond, cond])
            ctx = pipe._encode_prompt(prompt, device, 1, True, negative)
    traj = [lat0.float().cpu().numpy()]

    def cb(i, t, latents):
        traj.append(latents.float().cpu().numpy())

    with torch.no_grad():
        img = pipe(prompt, negative_prompt=negative,
                   num_inference_steps=steps, guidance_scale=7.5,
                   latents=lat0, callback=cb, callback_steps=1,
                   output_type="np").images[0]
    _save_common(os.path.join(out, name + "_pipecall"), prompt=prompt,
                 negative=negative, steps=steps, guidance=7.5, seed=seed,
                 model="sd15",
                 lat0=traj[0],
                 ctx=(ctx.float().cpu().numpy() if ctx is not None
                      else np.zeros((0,))),
                 traj=traj, img=img)
    # no context recorded on old/new diffusers mismatch: drop the file so
    # the TPU side falls back to own-encoder mode
    if ctx is None:
        os.remove(os.path.join(out, name + "_pipecall", "context.npy"))
    print(f"wrote {name}_pipecall (diffusers pipe.__call__-driven)")


def export_character_ip(sd: _SD15, out, ip_weights, steps=50, seed=3):
    """The IP-Adapter character pass (models/pipelines.py:175-490):
    81-token context, decoupled image attention at scale 0.4."""
    import numpy as np
    import torch
    from PIL import Image

    set_scale, get_embeds = install_ip_adapter(sd, ip_weights)
    try:
        scale = 0.4                               # pipelines.py:189-191
        ref_img = Image.fromarray(_synthetic_rgb(seed)).resize((512, 512))
        clip_embeds, cond4, uncond4 = get_embeds(ref_img)
        ctx = torch.cat([
            torch.cat([sd.encode([IP_NEGATIVE]), uncond4], dim=1),
            torch.cat([sd.encode([IP_PROMPT]), cond4], dim=1)], dim=0)

        set_scale(scale)
        sched = _make_scheduler()
        gen = torch.Generator("cpu").manual_seed(seed)
        lat = torch.randn((1, 4, 64, 64), generator=gen).to(
            sd.device, sd.dtype) * sched.init_noise_sigma
        sched.set_timesteps(steps, device=sd.device)
        traj = [lat.float().cpu().numpy()]
        guidance = 7.5
        with torch.no_grad():
            for t in sched.timesteps:
                eps = sd.unet(torch.cat([lat, lat]), t,
                              encoder_hidden_states=ctx).sample
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + guidance * (eps_c - eps_u)
                lat = sched.step(eps, t, lat).prev_sample
                traj.append(lat.float().cpu().numpy())
        img = _decode(sd.vae, lat)
        _save_common(
            os.path.join(out, "character_ip_ddim%d" % steps),
            prompt=IP_PROMPT, negative=IP_NEGATIVE, steps=steps,
            guidance=guidance, seed=seed, model="sd15",
            kind="character_ip", ip_scale=scale,
            lat0=traj[0], ctx=ctx.float().cpu().numpy(), traj=traj,
            img=img,
            extras={"image_embeds.npy":
                    clip_embeds.float().cpu().numpy()})
        print(f"wrote character_ip_ddim{steps}")
    finally:
        # restore plain processors for subsequent cases
        from diffusers.models.attention_processor import AttnProcessor2_0

        sd.unet.set_attn_processor(
            {k: AttnProcessor2_0() for k in sd.unet.attn_processors})


def export_final_cn(sd: _SD15, out, ip_weights, controlnet_id,
                    steps=50, seed=4):
    """The composed final pass (models/pipelines.py:592-857): ControlNet
    lineart residuals (text-only ctx), IP-UNet at scale 0.1, frozen-mask
    replacement from latents_all for the first frozen_steps steps."""
    import numpy as np
    import torch
    from diffusers import ControlNetModel
    from PIL import Image

    cn = ControlNetModel.from_pretrained(
        controlnet_id, torch_dtype=sd.dtype).to(sd.device).eval()
    set_scale, get_embeds = install_ip_adapter(sd, ip_weights)
    try:
        prompt = "a red knight standing in a meadow"
        negative = ("longbody, lowres, bad anatomy, bad hands, "
                    "missing fingers, extra digit, fewer digits, "
                    "cropped, worst quality, low quality")
        frozen_steps = int(0.6 * steps)           # theatergen.py:336-337
        ip_scale = 0.1                            # pipelines.py:705
        guidance = 7.5

        # composed input image + its lineart conditioning
        input_img = _synthetic_rgb(seed)
        cond_image = _synthetic_lineart(input_img)         # [512,512,3]
        cond = torch.from_numpy(cond_image).permute(2, 0, 1)[None].to(
            sd.device, sd.dtype)
        cond_pair = torch.cat([cond, cond], dim=0)

        # contexts: 81-token for the UNet (prepare_ip_embeds, scale 0.1),
        # text-only for the ControlNet (CNAttnProcessor drops ip tokens)
        ref_img = Image.fromarray(input_img).resize((512, 512))
        _, cond4, uncond4 = get_embeds(ref_img)
        text_ctx = torch.cat([sd.encode([negative]), sd.encode([prompt])],
                             dim=0)
        ip_ctx = torch.cat([
            torch.cat([text_ctx[:1], uncond4], dim=1),
            torch.cat([text_ctx[1:], cond4], dim=1)], dim=0)
        set_scale(ip_scale)

        sched = _make_scheduler()
        sched.set_timesteps(steps, device=sd.device)
        gen = torch.Generator("cpu").manual_seed(seed)

        # latents_all: slot 0 = fresh noise (my_bg, pipelines.py:634),
        # 1: = VAE(composed image) noised at each timestep (:624-632)
        img_t = torch.from_numpy(
            input_img.astype(np.float32) / 255.0).permute(2, 0, 1)[None]
        img_t = (2.0 * img_t - 1.0).to(sd.device, sd.dtype)
        with torch.no_grad():
            init = sd.vae.encode(img_t).latent_dist.sample(generator=gen)
        init = init * sd.vae.config.scaling_factor
        noise = torch.randn(init.shape, generator=gen).to(
            sd.device, sd.dtype)
        noised = torch.stack(
            [sched.add_noise(init, noise, t[None])
             for t in sched.timesteps], dim=0)             # [S,1,4,64,64]
        bg = torch.randn((1, 4, 64, 64), generator=gen).to(
            sd.device, sd.dtype) * sched.init_noise_sigma
        latents_all = torch.cat([bg[None], noised], dim=0)  # [S+1,1,...]

        # frozen mask: recorded POST-inversion — exactly the tensor
        # multiplied in the loop (pipelines.py:606-615,833-834)
        fm = np.zeros((64, 64), np.float32)
        fm[16:48, 16:48] = 1.0

        lat = latents_all[0]
        fm_t = torch.from_numpy(fm).to(sd.device, sd.dtype)[None, None]
        traj = [lat.float().cpu().numpy()]
        with torch.no_grad():
            for index, t in enumerate(sched.timesteps):
                lat_in = torch.cat([lat, lat])
                down, mid = cn(lat_in, t,
                               encoder_hidden_states=text_ctx,
                               controlnet_cond=cond_pair,
                               conditioning_scale=1.0,
                               return_dict=False)
                eps = sd.unet(lat_in, t, encoder_hidden_states=ip_ctx,
                              down_block_additional_residuals=down,
                              mid_block_additional_residual=mid).sample
                eps_u, eps_c = eps.chunk(2)
                eps = eps_u + guidance * (eps_c - eps_u)
                lat = sched.step(eps, t, lat).prev_sample
                if index < frozen_steps:           # pipelines.py:833-834
                    lat = (latents_all[index + 1] * fm_t
                           + lat * (1.0 - fm_t))
                traj.append(lat.float().cpu().numpy())
        img = _decode(sd.vae, lat)
        _save_common(
            os.path.join(out, "final_cn_ddim%d" % steps),
            prompt=prompt, negative=negative, steps=steps,
            guidance=guidance, seed=seed, model="sd15", kind="final_cn",
            ip_scale=ip_scale, frozen_steps=frozen_steps,
            controlnet_scale=1.0,
            lat0=traj[0], ctx=ip_ctx.float().cpu().numpy(), traj=traj,
            img=img,
            extras={
                "cn_context.npy": text_ctx.float().cpu().numpy(),
                "cond_image.npy": cond_image,
                "latents_all.npy": latents_all.float().cpu().numpy(),
                "frozen_mask.npy": fm,
            })
        print(f"wrote final_cn_ddim{steps} (frozen_steps={frozen_steps})")
    finally:
        from diffusers.models.attention_processor import AttnProcessor2_0

        sd.unet.set_attn_processor(
            {k: AttnProcessor2_0() for k in sd.unet.attn_processors})


def export_sdxl(out, sdxl_id, device, dtype, steps=30, seed=5):
    """SDXL base case (generate.py:103-133) under deterministic DDIM —
    records dual-tower context, pooled embeds, and time_ids."""
    import numpy as np
    import torch
    from diffusers import StableDiffusionXLPipeline

    pipe = StableDiffusionXLPipeline.from_pretrained(
        sdxl_id, torch_dtype=dtype).to(device)
    pipe.unet.eval()
    prompt = "a castle on a cliff at dusk, detailed matte painting"
    negative = "lowres, bad anatomy, worst quality"
    guidance = 7.5
    with torch.no_grad():
        pe, ne, pp, np_ = pipe.encode_prompt(
            prompt, device=device, num_images_per_prompt=1,
            do_classifier_free_guidance=True, negative_prompt=negative)
    ctx = torch.cat([ne, pe], dim=0)              # [2, 77, 2048]
    pooled = torch.cat([np_, pp], dim=0)          # [2, 1280]
    tid = torch.tensor([[1024, 1024, 0, 0, 1024, 1024]], dtype=dtype,
                       device=device)
    time_ids = torch.cat([tid, tid], dim=0)

    sched = _make_scheduler()
    gen = torch.Generator("cpu").manual_seed(seed)
    lat = torch.randn((1, 4, 128, 128), generator=gen).to(
        device, dtype) * sched.init_noise_sigma
    sched.set_timesteps(steps, device=device)
    traj = [lat.float().cpu().numpy()]
    with torch.no_grad():
        for t in sched.timesteps:
            eps = pipe.unet(
                torch.cat([lat, lat]), t, encoder_hidden_states=ctx,
                added_cond_kwargs={"text_embeds": pooled,
                                   "time_ids": time_ids}).sample
            eps_u, eps_c = eps.chunk(2)
            eps = eps_u + guidance * (eps_c - eps_u)
            lat = sched.step(eps, t, lat).prev_sample
            traj.append(lat.float().cpu().numpy())
        if hasattr(pipe, "upcast_vae"):
            pipe.upcast_vae()
        img = pipe.vae.decode(
            lat.to(next(pipe.vae.parameters()).dtype)
            / pipe.vae.config.scaling_factor).sample
    img = ((img / 2 + 0.5).clamp(0, 1)[0].permute(1, 2, 0)
           .float().cpu().numpy())
    _save_common(
        os.path.join(out, "sdxl_ddim%d" % steps), prompt=prompt,
        negative=negative, steps=steps, guidance=guidance, seed=seed,
        model="sdxl", kind="sdxl",
        lat0=traj[0], ctx=ctx.float().cpu().numpy(), traj=traj, img=img,
        extras={"pooled.npy": pooled.float().cpu().numpy(),
                "time_ids.npy": time_ids.float().cpu().numpy()})
    print(f"wrote sdxl_ddim{steps}")


def export_sdxl_ea(out, sdxl_id, device, dtype, steps=30, seed=6):
    """SDXL under its ACTUAL reference sampler (EulerAncestral,
    generate.py:115-118), recording the per-step ancestral noise so the
    TPU side replays the torch draws exactly (ea_step takes explicit
    noise).  The noise is captured by cloning the generator state before
    each step: diffusers' scheduler.step draws via randn_tensor from the
    same generator, so the recorded tensor IS the one it consumed."""
    import numpy as np
    import torch
    from diffusers import (
        EulerAncestralDiscreteScheduler, StableDiffusionXLPipeline,
    )
    from diffusers.utils.torch_utils import randn_tensor

    pipe = StableDiffusionXLPipeline.from_pretrained(
        sdxl_id, torch_dtype=dtype).to(device)
    pipe.unet.eval()
    # the reference's exact construction (generate.py:125): the SDXL base
    # repo's scheduler config — leading spacing, steps_offset=1, the
    # 0.00085→0.012 scaled_linear betas
    sched = EulerAncestralDiscreteScheduler.from_pretrained(
        sdxl_id, subfolder="scheduler")
    prompt = "a lighthouse in a storm, dramatic oil painting"
    negative = "lowres, bad anatomy, worst quality"
    guidance = 7.5
    with torch.no_grad():
        pe, ne, pp, np_ = pipe.encode_prompt(
            prompt, device=device, num_images_per_prompt=1,
            do_classifier_free_guidance=True, negative_prompt=negative)
    ctx = torch.cat([ne, pe], dim=0)
    pooled = torch.cat([np_, pp], dim=0)
    tid = torch.tensor([[1024, 1024, 0, 0, 1024, 1024]], dtype=dtype,
                       device=device)
    time_ids = torch.cat([tid, tid], dim=0)

    sched.set_timesteps(steps, device=device)
    gen = torch.Generator("cpu").manual_seed(seed)
    lat = torch.randn((1, 4, 128, 128), generator=gen).to(device, dtype)
    lat = lat * sched.init_noise_sigma
    traj = [lat.float().cpu().numpy()]
    noises = []
    with torch.no_grad():
        for t in sched.timesteps:
            lat_in = sched.scale_model_input(torch.cat([lat, lat]), t)
            eps = pipe.unet(
                lat_in, t, encoder_hidden_states=ctx,
                added_cond_kwargs={"text_embeds": pooled,
                                   "time_ids": time_ids}).sample
            eps_u, eps_c = eps.chunk(2)
            eps = eps_u + guidance * (eps_c - eps_u)
            # record the exact noise step() will draw: same generator,
            # state restored after the peek
            state = gen.get_state()
            noises.append(randn_tensor(
                lat.shape, generator=gen, device=lat.device,
                dtype=lat.dtype).float().cpu().numpy())
            gen.set_state(state)
            lat = sched.step(eps, t, lat, generator=gen).prev_sample
            traj.append(lat.float().cpu().numpy())
        if hasattr(pipe, "upcast_vae"):
            pipe.upcast_vae()
        img = pipe.vae.decode(
            lat.to(next(pipe.vae.parameters()).dtype)
            / pipe.vae.config.scaling_factor).sample
    img = ((img / 2 + 0.5).clamp(0, 1)[0].permute(1, 2, 0)
           .float().cpu().numpy())
    _save_common(
        os.path.join(out, "sdxl_ea%d" % steps), prompt=prompt,
        negative=negative, steps=steps, guidance=guidance, seed=seed,
        model="sdxl", kind="sdxl_ea",
        lat0=traj[0], ctx=ctx.float().cpu().numpy(), traj=traj, img=img,
        extras={"pooled.npy": pooled.float().cpu().numpy(),
                "time_ids.npy": time_ids.float().cpu().numpy(),
                "step_noise.npy": np.stack(noises, axis=0)})
    print(f"wrote sdxl_ea{steps} (EulerAncestral, recorded step noise)")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--device", default="cuda")
    ap.add_argument("--fp16", action="store_true",
                    help="fp16 UNet/VAE (deployment-matching; fp32 default "
                         "gives the cleanest parity target)")
    ap.add_argument("--steps", type=int, default=None,
                    help="override every case's step count")
    ap.add_argument("--ip_weights", default=None,
                    help="dir with ip-adapter_sd15.bin + image_encoder/ "
                         "(h94/IP-Adapter layout); enables the "
                         "character_ip and final_cn cases")
    ap.add_argument("--controlnet",
                    default="lllyasviel/control_v11p_sd15_lineart")
    ap.add_argument("--sdxl",
                    default="stabilityai/stable-diffusion-xl-base-1.0",
                    help="SDXL model id/path ('' skips the sdxl case)")
    args = ap.parse_args()

    import torch

    dtype = torch.float16 if args.fp16 else torch.float32
    os.makedirs(args.out, exist_ok=True)

    sd = _SD15(args.device, dtype)
    export_plain(sd, args.out, args.steps)
    try:
        export_pipecall(args.out, args.device, dtype,
                        steps=args.steps or 50)
    except Exception as e:
        print(f"WARNING: pipe.__call__ cross-check case skipped: {e}")
    if args.ip_weights:
        try:
            export_character_ip(sd, args.out, args.ip_weights,
                                steps=args.steps or 50)
        except Exception as e:  # ip checkpoint missing/incompatible
            print(f"WARNING: character_ip case skipped: {e}")
        try:
            export_final_cn(sd, args.out, args.ip_weights,
                            args.controlnet, steps=args.steps or 50)
        except Exception as e:  # controlnet download/load failure
            print(f"WARNING: final_cn case skipped: {e}")
    else:
        print("WARNING: --ip_weights not given; character_ip and "
              "final_cn cases skipped")
    if args.sdxl:
        try:
            del sd                                # free VRAM for SDXL
            if torch.cuda.is_available():
                import gc

                gc.collect()
                torch.cuda.empty_cache()
            export_sdxl(args.out, args.sdxl, args.device, dtype,
                        steps=args.steps or 30)
            export_sdxl_ea(args.out, args.sdxl, args.device, dtype,
                           steps=args.steps or 30)
        except Exception as e:
            print(f"WARNING: sdxl case skipped: {e}")


if __name__ == "__main__":
    main()
