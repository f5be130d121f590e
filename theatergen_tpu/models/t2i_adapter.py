"""T2I-Adapter: lightweight structure conditioning for the SDXL path.

The reference's XL branch conditions the final pass with a T2I-Adapter over
the collage lineart instead of ControlNet (``generate.py:121-128``,
``models/pipelines.py:635-696,745-797``).  Architecture follows the
adapter-XL recipe: pixel-unshuffle the hint to latent resolution, then a
conv stem and per-level residual stages (downsampling between levels)
emitting one feature map per UNet down level; the UNet adds each map to its
hidden state at the end of the matching level
(``UNet2DCondition(..., level_residuals=...)``).

Checkpoint provenance note: the reference never pins an adapter
checkpoint — its XL branch references an **undefined** ``t2i_ckpt``
(``generate.py:123`` raises NameError as shipped), so there is no
ground-truth file to port.  This module is therefore a TPU-native
functional equivalent sized to OUR UNet's levels (trained/persisted via
the orbax snapshot path), not a diffusers ``FullAdapterXL`` layout clone;
a TencentARC-weights converter would additionally need diffusers'
intra-block injection semantics, which the reference does not exercise.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import UNetConfig
from .layers import get_dtype


def pixel_unshuffle(x: jnp.ndarray, factor: int) -> jnp.ndarray:
    """[B, H, W, C] → [B, H/f, W/f, C*f*f]."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // factor, factor, w // factor, factor, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h // factor, w // factor, c * factor * factor)


class AdapterResBlock(nn.Module):
    ch: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="block1")(x)
        h = nn.relu(h)
        h = nn.Conv(self.ch, (3, 3), padding=1, dtype=self.dtype,
                    name="block2")(h)
        return x + h


class T2IAdapter(nn.Module):
    """hint [B, H, W, 3] in [0,1] → tuple of per-level features."""

    unet: UNetConfig
    num_res_blocks: int = 2
    downscale: int = 8   # hint at pixel res; latents at H/downscale

    @nn.compact
    def __call__(self, hint: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = self.unet
        dtype = get_dtype(cfg.dtype)
        x = pixel_unshuffle(hint.astype(dtype), self.downscale)
        feats = []
        for i, ch in enumerate(cfg.block_out_channels):
            if i > 0:
                x = nn.avg_pool(x, (2, 2), strides=(2, 2))
            x = nn.Conv(ch, (3, 3), padding=1, dtype=dtype,
                        name=f"in_conv_{i}")(x)
            for j in range(self.num_res_blocks):
                x = AdapterResBlock(ch, dtype=dtype,
                                    name=f"body_{i}_{j}")(x)
            feats.append(x)
        return tuple(feats)
