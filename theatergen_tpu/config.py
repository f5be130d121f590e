"""Configuration tree for the framework.

The reference scatters configuration across argparse flags
(reference ``generate.py:34-48``), module-level constant blocks
(``theatergen.py:20-40``) and a ~40-kwarg ``run()`` surface
(``theatergen.py:278-325``).  Here everything lives in typed, frozen
dataclasses so a whole experiment is one hashable pytree-of-statics that can
be closed over by ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple


@dataclasses.dataclass(frozen=True)
class UNetConfig:
    """SD-style UNet2DCondition architecture.

    Defaults are SD1.5 (reference loads ``runwayml/stable-diffusion-v1-5``,
    ``generate.py:58,78``).
    """

    in_channels: int = 4
    out_channels: int = 4
    sample_size: int = 64
    block_out_channels: Tuple[int, ...] = (320, 640, 1280, 1280)
    layers_per_block: int = 2
    # Which levels carry cross-attention transformers (SD1.5: first three
    # down levels + mid + last three up levels).
    attention_levels: Tuple[bool, ...] = (True, True, True, False)
    # int, or one entry per level (SDXL: (0, 2, 10))
    transformer_layers_per_block: "int | Tuple[int, ...]" = 1
    # int, or one entry per level (SDXL: (5, 10, 20) — head_dim 64)
    num_attention_heads: "int | Tuple[int, ...]" = 8
    cross_attention_dim: int = 768
    # SDXL micro-conditioning: "text_time" adds pooled-text + time-ids
    # embeddings to the timestep embedding (diffusers addition_embed_type)
    addition_embed_type: Optional[str] = None
    addition_time_embed_dim: int = 256
    # pooled_text_dim + 6 * addition_time_embed_dim (SDXL: 2816)
    projection_class_embeddings_input_dim: int = 2816
    norm_num_groups: int = 32
    time_embed_mult: int = 4  # time_embed_dim = block_out_channels[0] * 4
    # Extra context tokens appended for IP-Adapter decoupled attention
    # (semantics of ip_adapter/attention_processor.py:466-471).
    ip_num_tokens: int = 0
    flash_attention: bool = True
    # int8 W8A8 serving for the matmul layers (attention projections, FFN,
    # time embed) — ~1.8x MXU throughput on those ops (see BENCH_NOTES.md)
    quantized: bool = False
    # compute GroupNorms in the model dtype (bf16) instead of fp32 —
    # matches the reference's fp16 norms and saves activation passes
    fast_norm: bool = True
    # full transformer-FF fusion (up-proj + GEGLU gate + down-proj in
    # one Pallas kernel, ops/geglu_matmul.py).  Per-MODEL setting from
    # chip A/Bs (BENCH_NOTES r4i/r4j): ON wins SD1.5's batch-4 program
    # (+4.6%), loses SDXL's batch-1 program (−3.5%) — the same FF
    # shapes flip sign with the surrounding program, so this is a model
    # flag, not a shape rule.  Default False so a new config only turns
    # it on behind an actual measurement (sd15_config sets True
    # explicitly).  THEATERGEN_FUSED_FF=1/0 overrides.
    fused_ff: bool = False
    remat: bool = False
    dtype: str = "bfloat16"

    def heads_at(self, level: int) -> int:
        h = self.num_attention_heads
        return h[level] if isinstance(h, tuple) else h

    def depth_at(self, level: int) -> int:
        d = self.transformer_layers_per_block
        return d[level] if isinstance(d, tuple) else d


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """AutoencoderKL; defaults are sd-vae-ft-mse (reference ``generate.py:59,77``)."""

    in_channels: int = 3
    out_channels: int = 3
    latent_channels: int = 4
    block_out_channels: Tuple[int, ...] = (128, 256, 512, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 32
    scaling_factor: float = 0.18215  # models/pipelines.py:165
    dtype: str = "bfloat16"


@dataclasses.dataclass(frozen=True)
class CLIPTextConfig:
    """CLIP ViT-L/14 text tower (SD1.5 text encoder)."""

    vocab_size: int = 49408
    hidden_size: int = 768
    intermediate_size: int = 3072
    num_layers: int = 12
    num_heads: int = 12
    max_length: int = 77
    layer_norm_eps: float = 1e-5
    act: str = "quick_gelu"        # OpenCLIP bigG (SDXL enc 2) uses "gelu"
    projection_dim: int = 768      # text_projection dim (pooled output)
    use_text_projection: bool = False   # SDXL encoders project the pooled
    dtype: str = "float32"


@dataclasses.dataclass(frozen=True)
class CLIPVisionConfig:
    """CLIP vision tower.

    Defaults are ViT-H/14 (IP-Adapter image encoder,
    reference ``generate.py:61``); ``vit_b32()`` gives the eval encoder
    (``CMIGBench/eval/eval.py:286``).
    """

    image_size: int = 224
    patch_size: int = 14
    hidden_size: int = 1280
    intermediate_size: int = 5120
    num_layers: int = 32
    num_heads: int = 16
    projection_dim: int = 1024
    layer_norm_eps: float = 1e-5
    dtype: str = "float32"

    @staticmethod
    def vit_b32() -> "CLIPVisionConfig":
        return CLIPVisionConfig(
            image_size=224, patch_size=32, hidden_size=768,
            intermediate_size=3072, num_layers=12, num_heads=12,
            projection_dim=512,
        )


@dataclasses.dataclass(frozen=True)
class ControlNetConfig:
    """ControlNet (v1.1 lineart in the reference, ``generate.py:63,91-95``)."""

    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    conditioning_channels: int = 3
    conditioning_embed_channels: Tuple[int, ...] = (16, 32, 96, 256)


@dataclasses.dataclass(frozen=True)
class IPAdapterConfig:
    """IP-Adapter projection (reference ``ip_adapter/ip_adapter.py:30-47``)."""

    clip_embeddings_dim: int = 1024     # CLIP ViT-H projected embed dim
    cross_attention_dim: int = 768
    num_tokens: int = 4
    # Resampler (Plus variants, ip_adapter/resampler.py:81-147)
    resampler_depth: int = 4
    resampler_dim: int = 768
    resampler_heads: int = 12
    resampler_queries: int = 16


@dataclasses.dataclass(frozen=True)
class SAMConfig:
    """SAM-style promptable segmenter (reference ``models/sam.py``)."""

    image_size: int = 512
    patch_size: int = 16
    encoder_dim: int = 768
    encoder_layers: int = 12
    encoder_heads: int = 12
    prompt_embed_dim: int = 256
    decoder_layers: int = 2
    decoder_heads: int = 8
    num_mask_outputs: int = 3  # models/sam.py returns 3 candidates
    dtype: str = "float32"
    # "lite": weightless TPU-first SAMLite (perception/sam.py);
    # "hf": checkpoint-faithful SamHF (perception/sam_hf.py) — loads real
    # facebook/sam-vit-* weights via models/weights.py::port_sam.
    backend: str = "lite"


@dataclasses.dataclass(frozen=True)
class SchedulerConfig:
    """DDIM with SD1.5 betas (reference ``generate.py:68-76``)."""

    num_train_timesteps: int = 1000
    beta_start: float = 0.00085
    beta_end: float = 0.012
    beta_schedule: str = "scaled_linear"
    steps_offset: int = 1
    set_alpha_to_one: bool = False
    # "epsilon" (SD1.5/SDXL, reference config) | "v_prediction" (SD2.x-class
    # and zero-SNR fine-tunes) | "sample"
    prediction_type: str = "epsilon"
    # Rescale betas so the terminal step has zero SNR (arXiv 2305.08891) —
    # pair with v_prediction (x0-from-eps divides by sqrt(alpha)=0 at t=T).
    rescale_zero_terminal_snr: bool = False


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """Latent cross-attention guidance (reference ``utils/guidance.py``,
    ``models/pipelines.py:62-128``)."""

    # (place, block_index, transformer_index, layer) keys; reference
    # DEFAULT_GUIDANCE_ATTN_KEYS, models/pipelines.py:21.
    attn_keys: Tuple[Tuple[str, int, int, int], ...] = (
        ("mid", 0, 0, 0), ("up", 1, 0, 0), ("up", 1, 1, 0), ("up", 1, 2, 0),
    )
    fg_top_p: float = 0.2
    bg_top_p: float = 0.2
    fg_weight: float = 1.0
    bg_weight: float = 4.0
    ref_ca_loss_weight: float = 2.0
    loss_scale: float = 30.0
    loss_threshold: float = 0.2
    max_iter: Tuple[int, ...] = (4,) * 10 + (3,) * 40   # per-step iteration cap
    guidance_steps: int = 25                            # apply in first half


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """One denoising run. Mirrors theatergen.py:20-40 module constants."""

    height: int = 512
    width: int = 512
    num_steps: int = 50
    guidance_scale: float = 7.5
    frozen_step_ratio: float = 0.5      # generate.py:43
    fg_blending_ratio: float = 0.1
    ip_scale_hit: float = 0.4           # models/pipelines.py:195
    ip_scale_final: float = 0.1         # models/pipelines.py:701
    fast_after_steps: Optional[int] = None
    fast_rate: int = 2
    # CFG truncation: full classifier-free guidance for the first
    # ceil(frac·steps), cond-only after (arXiv 2404.02747). None ≡ exact.
    cfg_cutoff_fraction: Optional[float] = None
    # DeepCache (arXiv 2312.00858): full UNet every N-th step, shallow
    # blocks + cached deep feature in between. None/1 ≡ exact.
    deepcache_interval: Optional[int] = None
    # Final pass only: ControlNet forward every N-th step, residuals
    # reused in between (structure signal is temporally smooth). None/1
    # ≡ exact (reference runs it every step, models/pipelines.py:770-778).
    controlnet_interval: Optional[int] = None
    max_objects: int = 8                # static pad for jit (SURVEY §7 hard parts)
    vae_scale: int = 8                  # spatial down-factor of the VAE
    # "ddim" | "euler_ancestral" (XL) | "lcm" (guidance-free few-step loop
    # for LCM(-LoRA)-merged checkpoints; pipelines go cond-only)
    scheduler_type: str = "ddim"

    @property
    def latent_height(self) -> int:
        return self.height // self.vae_scale

    @property
    def latent_width(self) -> int:
        return self.width // self.vae_scale


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh for pjit. dp shards dialogues (the DP unit per SURVEY
    §2.11), tp shards attention heads / FFN columns."""

    dp: int = 1
    tp: int = 1
    axis_names: Tuple[str, str] = ("dp", "tp")


@dataclasses.dataclass(frozen=True)
class TheaterConfig:
    """Top-level bundle for the orchestrator."""

    unet: UNetConfig = dataclasses.field(default_factory=UNetConfig)
    vae: VAEConfig = dataclasses.field(default_factory=VAEConfig)
    text: CLIPTextConfig = dataclasses.field(default_factory=CLIPTextConfig)
    # second text tower for SDXL (None for SD1.5)
    text2: Optional[CLIPTextConfig] = None
    vision: CLIPVisionConfig = dataclasses.field(default_factory=CLIPVisionConfig)
    controlnet: ControlNetConfig = dataclasses.field(default_factory=ControlNetConfig)
    ip_adapter: IPAdapterConfig = dataclasses.field(default_factory=IPAdapterConfig)
    sam: SAMConfig = dataclasses.field(default_factory=SAMConfig)
    scheduler: SchedulerConfig = dataclasses.field(default_factory=SchedulerConfig)
    guidance: GuidanceConfig = dataclasses.field(default_factory=GuidanceConfig)
    pipeline: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


def tiny_config(latent_size: int = 8) -> TheaterConfig:
    """A miniature config for CPU tests: same topology, tiny widths."""

    unet = UNetConfig(
        sample_size=latent_size,
        block_out_channels=(32, 64, 64),
        layers_per_block=1,
        attention_levels=(True, True, False),
        num_attention_heads=2,
        cross_attention_dim=32,
        norm_num_groups=8,
        dtype="float32",
        flash_attention=False,
    )
    vae = VAEConfig(
        block_out_channels=(16, 32),
        layers_per_block=1,
        norm_num_groups=8,
        dtype="float32",
    )
    text = CLIPTextConfig(
        vocab_size=1024, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, max_length=16, projection_dim=32,
    )
    vision = CLIPVisionConfig(
        image_size=32, patch_size=16, hidden_size=32, intermediate_size=64,
        num_layers=2, num_heads=2, projection_dim=32,
    )
    sam = SAMConfig(
        image_size=64, patch_size=16, encoder_dim=32, encoder_layers=2,
        encoder_heads=2, prompt_embed_dim=32, decoder_layers=1, decoder_heads=2,
    )
    ip = IPAdapterConfig(
        clip_embeddings_dim=32, cross_attention_dim=32, num_tokens=4,
        resampler_depth=1, resampler_dim=32, resampler_heads=2,
        resampler_queries=4,
    )
    pipe = PipelineConfig(
        height=latent_size * 2, width=latent_size * 2, num_steps=4,
        max_objects=3, vae_scale=2,
    )
    guidance = GuidanceConfig(
        # tiny UNet has layers_per_block=1 → up blocks carry 2 attentions
        attn_keys=(("mid", 0, 0, 0), ("up", 1, 0, 0), ("up", 1, 1, 0)),
        max_iter=(2, 2, 2, 2),
        guidance_steps=2,
    )
    return TheaterConfig(
        unet=unet, vae=vae, text=text, vision=vision,
        # one stride-2 stage to match the tiny VAE's scale-2 latents
        controlnet=ControlNetConfig(unet=unet,
                                    conditioning_embed_channels=(8, 16)),
        ip_adapter=ip, sam=sam, pipeline=pipe, guidance=guidance,
    )


def tiny_xl_config(latent_size: int = 8) -> TheaterConfig:
    """Miniature SDXL-shaped config: per-level depths/heads, text_time
    micro-conditioning, dual text towers, EulerAncestral."""
    base = tiny_config(latent_size)
    text2 = dataclasses.replace(
        base.text, hidden_size=48, num_heads=2, intermediate_size=96,
        act="gelu", projection_dim=32, use_text_projection=True,
    )
    ctx_dim = base.text.hidden_size + 48   # concat of both towers
    unet = dataclasses.replace(
        base.unet,
        block_out_channels=(32, 64),
        attention_levels=(False, True),
        transformer_layers_per_block=(0, 2),
        num_attention_heads=(2, 4),
        cross_attention_dim=ctx_dim,
        addition_embed_type="text_time",
        addition_time_embed_dim=8,
        projection_class_embeddings_input_dim=32 + 6 * 8,
    )
    ip = dataclasses.replace(base.ip_adapter, cross_attention_dim=ctx_dim)
    pipe = dataclasses.replace(base.pipeline,
                               scheduler_type="euler_ancestral")
    # 2-level tiny-XL UNet: attention lives at level 1 → up_blocks_0
    guidance = dataclasses.replace(
        base.guidance,
        attn_keys=(("mid", 0, 0, 0), ("up", 0, 0, 0), ("up", 0, 1, 0)))
    return dataclasses.replace(base, unet=unet, text2=text2, pipeline=pipe,
                               ip_adapter=ip, guidance=guidance,
                               controlnet=ControlNetConfig(
                                   unet=unet,
                                   conditioning_embed_channels=(8, 16)))


def sd15_config() -> TheaterConfig:
    """Full-size SD1.5 stack (the reference's main path)."""
    # chip A/B r4i/r4j: the full-FF kernel wins SD1.5 at every instance
    # (1.5292 vs 1.4615 headline) — explicit True here so the perf-
    # sensitive flag records a measurement (the dataclass default is
    # False; ADVICE r4).  The ControlNet encoder shares the flag: it
    # runs the same SD1.5 FF shapes inside the same batch-4/512 program.
    base = TheaterConfig()
    unet = dataclasses.replace(base.unet, fused_ff=True)
    return dataclasses.replace(
        base, unet=unet,
        controlnet=dataclasses.replace(base.controlnet, unet=unet))


def sdxl_config() -> TheaterConfig:
    """SDXL base stack (the reference's --sd_version xl branch,
    ``generate.py:103-133``): 1024×1024, EulerAncestral 30 steps,
    T2I-Adapter conditioning, IP-Adapter XL."""
    unet = UNetConfig(
        sample_size=128,
        block_out_channels=(320, 640, 1280),
        layers_per_block=2,
        attention_levels=(False, True, True),
        transformer_layers_per_block=(0, 2, 10),
        num_attention_heads=(5, 10, 20),   # head_dim 64 at every level
        cross_attention_dim=2048,
        addition_embed_type="text_time",
        projection_class_embeddings_input_dim=2816,
        # chip A/B r4i: the full-FF kernel loses inside SDXL's batch-1
        # program (0.2873 vs 0.2978) — keep the v2-geglu split here
        fused_ff=False,
    )
    # text encoder 2 (OpenCLIP bigG): hidden 1280, 32 layers, gelu — the
    # framework's CLIPTextConfig covers it via act="gelu"
    text2 = CLIPTextConfig(
        hidden_size=1280, intermediate_size=5120, num_layers=32,
        num_heads=20, act="gelu", projection_dim=1280,
        use_text_projection=True,
    )
    pipe = PipelineConfig(
        height=1024, width=1024, num_steps=30,   # theatergen.py:331-334
        scheduler_type="euler_ancestral",
    )
    ip = IPAdapterConfig(cross_attention_dim=2048)
    return TheaterConfig(unet=unet, text2=text2, pipeline=pipe, ip_adapter=ip)
