"""Model bundle: modules + parameters + tokenizer, one object to thread
through pipelines.

The reference assembles its model zoo at import time in ``generate.py:55-147``
(SD pipe, ControlNet pipe, IP-Adapter, DINO, SAM).  Here the equivalent is
:func:`init_bundle` (random weights — architecture tests / benchmarking) and
:func:`theatergen_tpu.models.weights.load_bundle` (ported checkpoints).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import TheaterConfig
from ..models.clip import CLIPTextEncoder, CLIPVisionEncoder
from ..models.unet import UNet2DCondition
from ..models.vae import AutoencoderKL
from ..utils.tokenizer import load_tokenizer


@dataclasses.dataclass
class Bundle:
    """Everything the pipelines need. ``*_params`` are flax param pytrees."""

    cfg: TheaterConfig
    tokenizer: Any

    unet: UNet2DCondition
    unet_params: Any
    vae: AutoencoderKL
    vae_params: Any
    text: CLIPTextEncoder
    text_params: Any

    # IP-Adapter-equipped UNet shares most params with `unet_params` but adds
    # to_k_ip/to_v_ip leaves; populated by with_ip_adapter().
    unet_ip: Optional[UNet2DCondition] = None
    unet_ip_params: Any = None

    vision: Optional[CLIPVisionEncoder] = None
    vision_params: Any = None

    # SDXL second text tower + T2I-Adapter
    text2: Optional[CLIPTextEncoder] = None
    text2_params: Any = None
    t2i_adapter: Any = None
    t2i_adapter_params: Any = None

    image_proj: Any = None          # ImageProjModel / Resampler / MLPProj
    image_proj_params: Any = None
    ip_variant: str = "base"        # "base" | "plus" (resampler) | "full"

    controlnet: Any = None          # models.controlnet.ControlNet
    controlnet_params: Any = None

    sam: Any = None                 # perception.sam.SAMLite / sam_hf.SamHF
    sam_params: Any = None

    # open-vocabulary detector backend (perception.detector.DetectorBackend
    # protocol, e.g. perception.gdino.GroundingDinoBackend); when present
    # the orchestrator uses it for detect-and-regenerate instead of the
    # attention-based default.
    detector: Any = None

    # lineart annotator (ops.lineart.LineartGenerator) for ControlNet
    # conditioning; the weightless DoG sketch is the fallback.
    lineart: Any = None
    lineart_params: Any = None

    # jitted small-model forwards, built lazily and cached per Bundle.
    # Eager flax .apply here costs ~1.6 ms PER OP through the axon tunnel
    # (an unjitted CLIP forward measured ~850 ms vs ~1 ms of device time),
    # so every host-called encoder goes through this cache. Params are
    # explicit jit args — modules are static, so `dataclasses.replace`d
    # bundles (e.g. LoRA-merged params) share the cache safely.
    _jits: dict = dataclasses.field(default_factory=dict, repr=False)

    def jitted(self, key: str, fn) -> Any:
        """Return a cached ``jax.jit(fn)`` under ``key`` (first call wins).

        ``fn`` must never close over params (pass them as args). It MAY
        close over module objects / static config, but then ``key`` must
        include ``id(module)`` (or the config value): ``_jits`` is shared
        across ``dataclasses.replace``d bundles, and a bare key would hand
        a replaced bundle the original bundle's baked closure."""
        if key not in self._jits:
            self._jits[key] = jax.jit(fn)
        return self._jits[key]

    def memo(self, key: str, builder) -> Any:
        """Cache an arbitrary built value (e.g. an already-jitted pipeline
        from ``make_character_pipeline``) under ``key`` — Theaters sharing
        a bundle then share compiled pipelines instead of re-tracing per
        instance (the CLI builds a Theater per dialogue).  Same key
        contract as :meth:`jitted`: include every config value and module
        id the builder bakes in."""
        if key not in self._jits:
            self._jits[key] = builder()
        return self._jits[key]

    def text_embed(self, input_ids: jnp.ndarray) -> jnp.ndarray:
        fn = self.jitted(
            f"text_embed_{id(self.text)}",
            lambda p, ids: self.text.apply({"params": p}, ids)[0])
        return fn(self.text_params, input_ids)


def init_bundle(
    cfg: TheaterConfig,
    rng: jax.Array,
    *,
    with_ip: bool = False,
    with_controlnet: bool = False,
    with_vision: bool = False,
    with_sam: bool = False,
    with_t2i_adapter: bool = False,
    ip_variant: str = "base",
    tokenizer_assets: Optional[str] = None,
    abstract: bool = False,
) -> Bundle:
    """Random-init bundle (benchmark / test path — no weights shipped in
    this environment; see models/weights.py for checkpoint porting).

    ``abstract=True`` returns the same Bundle but with every param tree
    made of ``jax.ShapeDtypeStruct`` leaves via ``eval_shape`` — no
    device compile or allocation.  Callers that replace every tree with
    real values (``models/snapshot.py::load_bundle_snapshot``) use this:
    a concrete init of the full SD1.5 stack on the TPU is both a giant
    compile and a full extra HBM copy alongside the restored params
    (the r5d.2 cold-start run OOMed exactly there — BENCH_NOTES r5d)."""
    keys = jax.random.split(rng, 8)

    def _init(module, key, *args, **kwargs):
        fn = lambda: module.init(key, *args, **kwargs)["params"]
        return jax.eval_shape(fn) if abstract else fn()
    H = W = cfg.unet.sample_size
    img_h, img_w = cfg.pipeline.height, cfg.pipeline.width

    unet = UNet2DCondition(cfg.unet)
    xl_kwargs = {}
    if cfg.unet.addition_embed_type == "text_time":
        pooled_dim = (cfg.unet.projection_class_embeddings_input_dim
                      - 6 * cfg.unet.addition_time_embed_dim)
        xl_kwargs = dict(pooled_text=jnp.zeros((1, pooled_dim)),
                         time_ids=jnp.zeros((1, 6)))
    unet_params = _init(
        unet, keys[0],
        jnp.zeros((1, H, W, cfg.unet.in_channels)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim)),
        **xl_kwargs,
    )

    vae = AutoencoderKL(cfg.vae)
    vae_params = _init(
        vae, keys[1], jnp.zeros((1, img_h, img_w, cfg.vae.in_channels)))

    text = CLIPTextEncoder(cfg.text)
    text_params = _init(
        text, keys[2], jnp.zeros((1, cfg.text.max_length), jnp.int32))

    b = Bundle(
        cfg=cfg,
        tokenizer=load_tokenizer(tokenizer_assets, cfg.text.vocab_size),
        unet=unet, unet_params=unet_params,
        vae=vae, vae_params=vae_params,
        text=text, text_params=text_params,
    )

    if with_ip or with_controlnet:
        import dataclasses as dc

        if with_ip:
            from ..models.ip_adapter import (
                ImageProjModel, MLPProjModel, Resampler,
            )

            b.ip_variant = ip_variant
            if ip_variant == "plus":
                # Plus variants resample CLIP patch tokens into
                # resampler_queries context tokens (ip_adapter/resampler.py)
                n_tokens = cfg.ip_adapter.resampler_queries
                proj = Resampler(
                    cfg.ip_adapter, embedding_dim=cfg.vision.hidden_size,
                    output_dim=cfg.unet.cross_attention_dim)
                proj_in = jnp.zeros((1, 5, cfg.vision.hidden_size))
            elif ip_variant == "full":
                n_tokens = 1
                proj = MLPProjModel(cfg.ip_adapter)
                proj_in = jnp.zeros((1, cfg.ip_adapter.clip_embeddings_dim))
            else:
                n_tokens = cfg.ip_adapter.num_tokens
                proj = ImageProjModel(cfg.ip_adapter)
                proj_in = jnp.zeros((1, cfg.ip_adapter.clip_embeddings_dim))
            ip_unet_cfg = dc.replace(cfg.unet, ip_num_tokens=n_tokens)
            b.unet_ip = UNet2DCondition(ip_unet_cfg)
            ctx_len = cfg.text.max_length + n_tokens
            b.unet_ip_params = _init(
                b.unet_ip, keys[3],
                jnp.zeros((1, H, W, cfg.unet.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, ctx_len, cfg.unet.cross_attention_dim)),
                **xl_kwargs,
            )
            b.image_proj = proj
            b.image_proj_params = _init(proj, keys[4], proj_in)

        if with_controlnet:
            from ..models.controlnet import ControlNet

            cn = ControlNet(cfg.controlnet)
            b.controlnet = cn
            b.controlnet_params = _init(
                cn, keys[5],
                jnp.zeros((1, H, W, cfg.unet.in_channels)),
                jnp.zeros((1,), jnp.int32),
                jnp.zeros((1, cfg.text.max_length, cfg.unet.cross_attention_dim)),
                jnp.zeros((1, img_h, img_w, cfg.controlnet.conditioning_channels)),
            )

    if cfg.text2 is not None:
        text2 = CLIPTextEncoder(cfg.text2)
        b.text2 = text2
        b.text2_params = _init(
            text2, jax.random.key(17),
            jnp.zeros((1, cfg.text2.max_length), jnp.int32))

    if with_t2i_adapter:
        from ..models.t2i_adapter import T2IAdapter

        ada = T2IAdapter(cfg.unet, downscale=cfg.pipeline.vae_scale)
        b.t2i_adapter = ada
        b.t2i_adapter_params = _init(
            ada, jax.random.key(18), jnp.zeros((1, img_h, img_w, 3)))

    if with_vision:
        vis = CLIPVisionEncoder(cfg.vision)
        b.vision = vis
        b.vision_params = _init(
            vis, keys[6],
            jnp.zeros((1, cfg.vision.image_size, cfg.vision.image_size, 3)))

    if with_sam:
        if getattr(cfg.sam, "backend", "lite") == "hf":
            from ..perception.sam_hf import (
                SamHF, SamHFConfig, tiny_sam_hf_config,
            )

            # SamHF runs at its own native resolution (1024 for real
            # facebook/sam-vit-* weights; the tiny instance for tests) —
            # the orchestrator resizes to ``bundle.sam.cfg.image_size``.
            hf_cfg = (tiny_sam_hf_config() if cfg.sam.image_size <= 64
                      else SamHFConfig())
            sam = SamHF(hf_cfg)
            b.sam = sam
            b.sam_params = _init(
                sam, keys[7],
                jnp.zeros((1, hf_cfg.image_size, hf_cfg.image_size, 3)),
                jnp.zeros((1, 1, 4)),
            )
        else:
            from ..perception.sam import SAMLite

            sam = SAMLite(cfg.sam)
            b.sam = sam
            b.sam_params = _init(
                sam, keys[7],
                jnp.zeros((1, cfg.sam.image_size, cfg.sam.image_size, 3)),
                jnp.zeros((1, 1, 4)),
            )

    return b
