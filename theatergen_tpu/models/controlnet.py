"""ControlNet: UNet-encoder copy + zero-conv residual heads.

Equivalent of diffusers' ``ControlNetModel`` as used by the reference
(v1.1 lineart, ``generate.py:89-95``; residuals consumed per step in the
final pass, ``models/pipelines.py:770-816``).  Reuses
:class:`..models.unet.UNetEncoder`/:class:`UNetMid` verbatim so the
architecture can load a ported diffusers ControlNet checkpoint.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import ControlNetConfig
from .layers import TimestepEmbedding, get_dtype, timestep_embedding
from .unet import UNetEncoder, UNetMid


class ConditioningEmbedding(nn.Module):
    """Hint image (e.g. lineart) → latent-resolution feature map via a small
    stride-2 conv stack ending in a zero conv."""

    out_channels: int
    embed_channels: Tuple[int, ...]
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, cond: jnp.ndarray) -> jnp.ndarray:
        h = nn.Conv(self.embed_channels[0], (3, 3), padding=1,
                    dtype=self.dtype, name="conv_in")(cond)
        h = nn.silu(h)
        for i in range(len(self.embed_channels) - 1):
            h = nn.Conv(self.embed_channels[i], (3, 3), padding=1,
                        dtype=self.dtype, name=f"blocks_{2 * i}")(h)
            h = nn.silu(h)
            h = nn.Conv(self.embed_channels[i + 1], (3, 3), strides=2,
                        padding=1, dtype=self.dtype,
                        name=f"blocks_{2 * i + 1}")(h)
            h = nn.silu(h)
        return nn.Conv(self.out_channels, (3, 3), padding=1,
                       kernel_init=nn.initializers.zeros,
                       bias_init=nn.initializers.zeros,
                       dtype=self.dtype, name="conv_out")(h)


class ControlNet(nn.Module):
    cfg: ControlNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,          # [B, h, w, 4] latent
        timesteps: jnp.ndarray,
        context: jnp.ndarray,
        cond_image: jnp.ndarray,      # [B, H, W, 3] hint in [0, 1]
        conditioning_scale: jnp.ndarray | float = 1.0,
    ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
        ucfg = self.cfg.unet
        dtype = get_dtype(ucfg.dtype)
        sample = sample.astype(dtype)
        context = context.astype(dtype)

        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        temb = timestep_embedding(timesteps, ucfg.block_out_channels[0])
        temb = TimestepEmbedding(
            ucfg.block_out_channels[0] * ucfg.time_embed_mult, dtype=dtype,
            name="time_embedding",
        )(temb.astype(dtype))
        if temb.shape[0] != sample.shape[0]:
            temb = jnp.broadcast_to(temb, (sample.shape[0],) + temb.shape[1:])

        cond = ConditioningEmbedding(
            ucfg.block_out_channels[0], self.cfg.conditioning_embed_channels,
            dtype=dtype, name="controlnet_cond_embedding",
        )(cond_image.astype(dtype))

        # encoder, with the hint injected after conv_in: run the shared
        # encoder on (sample) and add cond to its first feature map by
        # wrapping conv_in — here we simply add to the first skip by running
        # the encoder on the sum at the conv_in level.
        h, skips = UNetEncoder(ucfg, name="encoder")(
            sample, temb, context, cond_hint=cond
        )
        h = UNetMid(ucfg, name="mid")(h, temb, context)

        scale = jnp.asarray(conditioning_scale, dtype)
        down_res = tuple(
            nn.Conv(s.shape[-1], (1, 1),
                    kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros,
                    dtype=dtype, name=f"controlnet_down_blocks_{i}")(s) * scale
            for i, s in enumerate(skips)
        )
        mid_res = nn.Conv(h.shape[-1], (1, 1),
                          kernel_init=nn.initializers.zeros,
                          bias_init=nn.initializers.zeros,
                          dtype=dtype, name="controlnet_mid_block")(h) * scale
        return down_res, mid_res
