"""AutoencoderKL (flax, NHWC) — the SD latent codec.

Architecture parity with diffusers' ``AutoencoderKL`` as loaded by the
reference (``sd-vae-ft-mse``, ``generate.py:59,77``): encoder/decoder with
ResNet stages, a single mid self-attention block, GN+silu heads, and the
0.18215 latent scaling applied by the pipelines
(reference ``models/pipelines.py:131-173``).
"""

from __future__ import annotations

from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import VAEConfig
from .layers import Downsample2D, GroupNorm, ResnetBlock2D, Upsample2D, get_dtype


class VAEAttention(nn.Module):
    """Single-head spatial self-attention used in VAE mid blocks."""

    groups: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        y = GroupNorm(self.groups, name="group_norm")(x).reshape(b, h * w, c)
        q = nn.Dense(c, dtype=self.dtype, name="to_q")(y)
        k = nn.Dense(c, dtype=self.dtype, name="to_k")(y)
        v = nn.Dense(c, dtype=self.dtype, name="to_v")(y)
        out = jax.nn.dot_product_attention(
            q[:, :, None, :], k[:, :, None, :], v[:, :, None, :]
        )[:, :, 0, :]
        out = nn.Dense(c, dtype=self.dtype, name="to_out_0")(out)
        return residual + out.reshape(b, h, w, c)


class Encoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dtype,
                    name="conv_in")(x.astype(dtype))
        for i, ch in enumerate(cfg.block_out_channels):
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                                  name=f"down_blocks_{i}_resnets_{j}")(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          name="mid_resnets_0")(h)
        h = VAEAttention(cfg.norm_num_groups, dtype=dtype,
                         name="mid_attentions_0")(h)
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          name="mid_resnets_1")(h)
        h = GroupNorm(cfg.norm_num_groups, name="conv_norm_out")(h)
        h = nn.silu(h)
        # 2*latent: mean and logvar of the diagonal Gaussian posterior
        h = nn.Conv(2 * cfg.latent_channels, (3, 3), padding=1, dtype=dtype,
                    name="conv_out")(h)
        return nn.Conv(2 * cfg.latent_channels, (1, 1), dtype=dtype,
                       name="quant_conv")(h)


class Decoder(nn.Module):
    cfg: VAEConfig

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        z = nn.Conv(cfg.latent_channels, (1, 1), dtype=dtype,
                    name="post_quant_conv")(z.astype(dtype))
        ch = cfg.block_out_channels[-1]
        h = nn.Conv(ch, (3, 3), padding=1, dtype=dtype, name="conv_in")(z)
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          name="mid_resnets_0")(h)
        h = VAEAttention(cfg.norm_num_groups, dtype=dtype,
                         name="mid_attentions_0")(h)
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          name="mid_resnets_1")(h)
        for idx, ch in enumerate(reversed(cfg.block_out_channels)):
            for j in range(cfg.layers_per_block + 1):
                h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                                  name=f"up_blocks_{idx}_resnets_{j}")(h)
            if idx < len(cfg.block_out_channels) - 1:
                h = Upsample2D(ch, dtype=dtype,
                               name=f"up_blocks_{idx}_upsamplers_0")(h)
        h = GroupNorm(cfg.norm_num_groups, name="conv_norm_out")(h)
        h = nn.silu(h)
        return nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dtype,
                       name="conv_out")(h)


class AutoencoderKL(nn.Module):
    """``encode`` → (mean, logvar); ``decode`` latent → image in [-1, 1].

    The pipelines apply/remove ``cfg.scaling_factor`` themselves, matching
    the reference's explicit 0.18215 handling (``models/pipelines.py:165``).
    """

    cfg: VAEConfig

    def setup(self):
        self.encoder = Encoder(self.cfg)
        self.decoder = Decoder(self.cfg)

    def encode(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        moments = self.encoder(x)
        mean, logvar = jnp.split(moments, 2, axis=-1)
        return mean, jnp.clip(logvar, -30.0, 20.0)

    def decode(self, z: jnp.ndarray) -> jnp.ndarray:
        return self.decoder(z)

    def __call__(self, x: jnp.ndarray, rng: Optional[jax.Array] = None):
        mean, logvar = self.encode(x)
        if rng is not None:
            z = mean + jnp.exp(0.5 * logvar) * jax.random.normal(
                rng, mean.shape, mean.dtype
            )
        else:
            z = mean
        return self.decode(z), mean, logvar
