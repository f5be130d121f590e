"""Export the reference's checkpoints into the layout load_bundle expects.

Run this on a machine WITH network access and diffusers/transformers
installed (this benchmark container has neither); copy the output
directory here and pass it as ``--weights`` to the CLI.

Produces, in --out:
  unet.safetensors            runwayml/stable-diffusion-v1-5 (unet)
  vae.safetensors             stabilityai/sd-vae-ft-mse
  text_encoder.safetensors    SD1.5 CLIP ViT-L text encoder
  controlnet.safetensors      lllyasviel/control_v11p_sd15_lineart
  image_encoder.safetensors   h94/IP-Adapter image encoder (CLIP ViT-H)
  sam.safetensors             facebook/sam-vit-base (segmenter)
  lineart.safetensors         lllyasviel/Annotators sk_model.pth (annotator)
  gdino.safetensors           IDEA-Research/grounding-dino-tiny (detector)
  owl.safetensors             google/owlvit-base-patch32 (MXU-friendly detector)
  fid_inception.safetensors   pytorch_fid pt_inception-2015-12-05 (AFID)
  gdino_vocab.txt             BERT wordpiece vocab for the detector
  ip-adapter_sd15.bin         h94/IP-Adapter (+ plus / full-face variants)
  merges.txt, vocab.json      CLIP tokenizer assets
  (optionally, with --xl)     SDXL unet/text_encoder_2/ip-adapter_sdxl
                              (no t2i adapter: the reference's t2i_ckpt is
                              undefined, generate.py:123 — nothing to pin)

These are exactly the models the reference loads (generate.py:55-147,
SURVEY.md §2.12).
"""

from __future__ import annotations

import argparse
import os


def export(out: str, xl: bool = False) -> None:
    os.makedirs(out, exist_ok=True)
    import torch
    from safetensors.torch import save_file

    def save(sd, name):
        sd = {k: v.contiguous().to(torch.float32) for k, v in sd.items()}
        save_file(sd, os.path.join(out, name))
        print("wrote", name)

    from diffusers import AutoencoderKL, ControlNetModel, UNet2DConditionModel
    from transformers import (CLIPTextModel, CLIPTokenizer,
                              CLIPVisionModelWithProjection)

    unet = UNet2DConditionModel.from_pretrained(
        "runwayml/stable-diffusion-v1-5", subfolder="unet")
    save(unet.state_dict(), "unet.safetensors")

    vae = AutoencoderKL.from_pretrained("stabilityai/sd-vae-ft-mse")
    save(vae.state_dict(), "vae.safetensors")

    text = CLIPTextModel.from_pretrained(
        "runwayml/stable-diffusion-v1-5", subfolder="text_encoder")
    save(text.state_dict(), "text_encoder.safetensors")

    cn = ControlNetModel.from_pretrained(
        "lllyasviel/control_v11p_sd15_lineart")
    save(cn.state_dict(), "controlnet.safetensors")

    vision = CLIPVisionModelWithProjection.from_pretrained(
        "h94/IP-Adapter", subfolder="models/image_encoder")
    save(vision.state_dict(), "image_encoder.safetensors")

    from transformers import SamModel

    sam = SamModel.from_pretrained("facebook/sam-vit-base")
    save(sam.state_dict(), "sam.safetensors")

    from transformers import (
        CLIPTextModelWithProjection as _CTP,
        CLIPVisionModelWithProjection as _CVP,
    )

    et = _CTP.from_pretrained("openai/clip-vit-base-patch32")
    save(et.state_dict(), "eval_clip_text.safetensors")
    ev = _CVP.from_pretrained("openai/clip-vit-base-patch32")
    save(ev.state_dict(), "eval_clip_vision.safetensors")

    # pytorch_fid's patched InceptionV3 — the reference's AFID feature
    # extractor (CMIGBench/eval/eval.py:66-94); ported by
    # theatergen_tpu/eval/inception.py:port_inception
    import torch as _t

    from theatergen_tpu.eval.inception import FID_WEIGHTS_URL

    fid_sd = _t.hub.load_state_dict_from_url(
        FID_WEIGHTS_URL, map_location="cpu", progress=False)
    save({k: v for k, v in fid_sd.items()
          if not k.startswith(("fc.", "AuxLogits."))},
         "fid_inception.safetensors")

    from huggingface_hub import hf_hub_download

    sk = hf_hub_download("lllyasviel/Annotators", "sk_model.pth")
    import torch as _torch

    sk_sd = _torch.load(sk, map_location="cpu")
    save({k: v for k, v in sk_sd.items()}, "lineart.safetensors")

    from transformers import AutoTokenizer, GroundingDinoForObjectDetection

    gd = GroundingDinoForObjectDetection.from_pretrained(
        "IDEA-Research/grounding-dino-tiny")
    # drop tied bbox-head clones; port_grounding_dino reads bbox_embed.0
    gd_sd = {k: v for k, v in gd.state_dict().items()
             if not k.startswith(("bbox_embed.1", "bbox_embed.2",
                                  "bbox_embed.3", "bbox_embed.4",
                                  "bbox_embed.5", "model.decoder.bbox_embed"))}
    save(gd_sd, "gdino.safetensors")
    gd_tok = AutoTokenizer.from_pretrained("IDEA-Research/grounding-dino-tiny")
    vocab_path = gd_tok.save_vocabulary(out)[0]   # writes vocab.txt
    os.replace(vocab_path, os.path.join(out, "gdino_vocab.txt"))
    print("wrote gdino_vocab.txt")

    from transformers import OwlViTForObjectDetection

    owl = OwlViTForObjectDetection.from_pretrained(
        "google/owlvit-base-patch32")
    save(owl.state_dict(), "owl.safetensors")

    from huggingface_hub import hf_hub_download
    import shutil

    # all three SD1.5 variants load_bundle supports (base / plus / full)
    for fname in ("ip-adapter_sd15.bin", "ip-adapter-plus_sd15.bin",
                  "ip-adapter-full-face_sd15.bin"):
        ip = hf_hub_download("h94/IP-Adapter", f"models/{fname}")
        shutil.copy(ip, os.path.join(out, fname))
        print("wrote", fname)

    tok = CLIPTokenizer.from_pretrained(
        "runwayml/stable-diffusion-v1-5", subfolder="tokenizer")
    tok.save_vocabulary(out)
    print("wrote merges.txt / vocab.json")

    if xl:
        unet = UNet2DConditionModel.from_pretrained(
            "stabilityai/stable-diffusion-xl-base-1.0", subfolder="unet")
        save(unet.state_dict(), "unet_xl.safetensors")
        from transformers import CLIPTextModelWithProjection

        t2 = CLIPTextModelWithProjection.from_pretrained(
            "stabilityai/stable-diffusion-xl-base-1.0",
            subfolder="text_encoder_2")
        save(t2.state_dict(), "text_encoder_2.safetensors")
        ip = hf_hub_download("h94/IP-Adapter",
                             "sdxl_models/ip-adapter_sdxl.bin")
        shutil.copy(ip, os.path.join(out, "ip-adapter_sdxl.bin"))
        print("wrote ip-adapter_sdxl.bin")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="weights")
    ap.add_argument("--xl", action="store_true")
    args = ap.parse_args()
    export(args.out, args.xl)
