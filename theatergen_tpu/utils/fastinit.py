"""Fast parameter materialization + persistent-compile-cache setup.

``flax.Module.init`` on the real chip compiles one giant program; through
the remote-compile tunnel that costs minutes.  For benchmarking and
weightless operation we instead ``jax.eval_shape`` the init (pure trace, no
device work) and materialize leaves host-side with seeded numpy, then
``device_put`` — ~20 s for the full SD1.5 stack instead of a giant compile.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np


def setup_compile_cache(path: Optional[str] = None) -> None:
    """Enable JAX's persistent compilation cache (huge win through the
    axon remote-compile tunnel: recompiles become sub-second)."""
    path = path or os.environ.get(
        "THEATERGEN_JAX_CACHE",
        os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                     ".jax_cache"),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def fast_bundle(cfg) -> Any:
    """Full orchestrator Bundle (unet/ip-unet/vae/text/vision/controlnet/
    image-proj) with host-materialized params — the no-giant-init-compile
    path to a chip-ready bundle for benches and weightless runs.  bf16
    compute trees; fp32 encoders (matching init_bundle's dtypes)."""
    import dataclasses as dc

    import jax.numpy as jnp

    from ..models.clip import CLIPTextEncoder, CLIPVisionEncoder
    from ..models.controlnet import ControlNet
    from ..models.ip_adapter import ImageProjModel
    from ..models.unet import UNet2DCondition
    from ..models.vae import AutoencoderKL
    from ..pipelines.bundle import Bundle
    from .tokenizer import load_tokenizer

    H = cfg.unet.sample_size
    img_hw = cfg.pipeline.height
    L = cfg.text.max_length
    C = cfg.unet.cross_attention_dim

    unet = UNet2DCondition(cfg.unet)
    ip_cfg = dc.replace(cfg.unet, ip_num_tokens=cfg.ip_adapter.num_tokens)
    unet_ip = UNet2DCondition(ip_cfg)
    vae = AutoencoderKL(cfg.vae)
    text = CLIPTextEncoder(cfg.text)
    vision = CLIPVisionEncoder(cfg.vision)
    cn = ControlNet(cfg.controlnet)
    proj = ImageProjModel(cfg.ip_adapter)

    zero_lat = jnp.zeros((1, H, H, 4))
    t_in = jnp.zeros((1,), jnp.int32)
    bundle = Bundle(
        cfg=cfg, tokenizer=load_tokenizer(None, cfg.text.vocab_size),
        unet=unet,
        unet_params=materialize_params(lambda: unet.init(
            jax.random.key(0), zero_lat, t_in,
            jnp.zeros((1, L, C)))["params"], seed=0, dtype=jnp.bfloat16),
        vae=vae,
        vae_params=materialize_params(lambda: vae.init(
            jax.random.key(1),
            jnp.zeros((1, img_hw, img_hw, 3)))["params"],
            seed=1, dtype=jnp.bfloat16),
        text=text,
        text_params=materialize_params(lambda: text.init(
            jax.random.key(2), jnp.zeros((1, L), jnp.int32))["params"],
            seed=2, dtype=jnp.float32),
    )
    bundle.unet_ip = unet_ip
    bundle.unet_ip_params = materialize_params(lambda: unet_ip.init(
        jax.random.key(3), zero_lat, t_in,
        jnp.zeros((1, L + cfg.ip_adapter.num_tokens, C)))["params"],
        seed=3, dtype=jnp.bfloat16)
    bundle.vision = vision
    bundle.vision_params = materialize_params(lambda: vision.init(
        jax.random.key(4), jnp.zeros(
            (1, cfg.vision.image_size, cfg.vision.image_size, 3)))["params"],
        seed=4, dtype=jnp.float32)
    bundle.controlnet = cn
    bundle.controlnet_params = materialize_params(lambda: cn.init(
        jax.random.key(5), zero_lat, t_in, jnp.zeros((1, L, C)),
        jnp.zeros((1, img_hw, img_hw, 3)))["params"],
        seed=5, dtype=jnp.bfloat16)
    bundle.image_proj = proj
    bundle.image_proj_params = materialize_params(lambda: proj.init(
        jax.random.key(6),
        jnp.zeros((1, cfg.ip_adapter.clip_embeddings_dim)))["params"],
        seed=6, dtype=jnp.float32)
    return bundle


def materialize_params(init_fn, *example_args, seed: int = 0,
                       dtype=None, scale: float = 0.02) -> Any:
    """eval_shape ``init_fn(*example_args)`` and fill leaves with seeded
    host RNG.  ``dtype`` overrides every float leaf dtype (e.g. bf16).

    Float leaves ship as one packed transfer *per target dtype* and are
    sliced apart in a single jitted program — thousands of per-leaf
    ``device_put`` round trips over the remote tunnel cost minutes for
    SD-scale trees.  The buffers are cast to the target dtype on the
    HOST: shipping fp32 and casting on device doubles both the tunnel
    bytes and the peak HBM — for SDXL's 2.6B-param UNet that is a
    10.3 GB fp32 buffer coexisting with 5.1 GB of bf16 pieces, which
    exhausts a 16 GB v5e chip before the first denoise step.  Values are
    bit-identical either way (fp32→bf16 rounds the same on host and
    device); with a single target dtype the RNG stream is unchanged too.
    """
    shapes = jax.eval_shape(init_fn, *example_args)
    leaves, treedef = jax.tree_util.tree_flatten(shapes)
    # Generator+SFC64 emits fp32 normals directly — ~29× faster than
    # RandomState's fp64-then-cast (measured 4.6 s vs 132.6 s per 200M
    # draws); at SD-bundle scale (~3B params) that is minutes off every
    # bench startup.  Still seeded-deterministic.
    rng = np.random.Generator(np.random.SFC64(seed))

    # target dtype -> list of (leaf_index, shape, offset, size)
    groups: dict = {}
    out: list = [None] * len(leaves)
    for i, leaf in enumerate(leaves):
        if np.issubdtype(np.dtype(leaf.dtype), np.integer):
            out[i] = jax.device_put(np.zeros(leaf.shape, leaf.dtype))
            continue
        target = np.dtype(dtype) if dtype is not None else np.dtype(leaf.dtype)
        meta = groups.setdefault(target, [])
        off = meta[-1][2] + meta[-1][3] if meta else 0
        size = int(np.prod(leaf.shape)) if leaf.shape else 1
        meta.append((i, leaf.shape, off, size))

    for target, meta in groups.items():
        total = meta[-1][2] + meta[-1][3]
        flat = rng.standard_normal(total, dtype=np.float32)
        flat *= scale                      # in-place: no second 4B/elt temp
        packed = jax.device_put(np.asarray(flat, dtype=target))

        def unpack(buf, meta=meta):
            return tuple(
                jax.lax.dynamic_slice(buf, (off,), (size,)).reshape(shape)
                for _i, shape, off, size in meta)

        pieces = jax.jit(unpack)(packed)
        for (i, *_), piece in zip(meta, pieces):
            out[i] = piece

    return jax.tree_util.tree_unflatten(treedef, out)
