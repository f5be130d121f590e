"""SD-style conditional UNet (flax), with ControlNet sharing the encoder.

Re-implementation of the reference's forked diffusers UNet stack
(``models/unet_2d_condition.py``, ``models/unet_2d_blocks.py``,
``models/transformer_2d.py`` — SURVEY.md §2.8) as one flat flax module:

- cross-attention layers carry optional decoupled IP-Adapter projections
  (``ip_tokens``) instead of swap-in processor objects
  (reference ``ip_adapter/ip_adapter.py:95-125``);
- attention introspection is a static ``capture_keys`` tuple: the named
  layers run the explicit-softmax path and ``sow`` their probability maps
  into the ``"attn"`` collection (reference ``attn_key`` stamping,
  ``models/unet_2d_condition.py:903,951,981``);
- ControlNet residual injection is plain argument passing
  (reference ``models/unet_2d_condition.py:735-736,895``).

Layout is NHWC; compute dtype per config (bf16 on TPU), norm stats fp32.
Guidance ``attn_keys`` use the reference 4-tuple format
``(place, block_index, attention_index, layer)``.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..config import UNetConfig
from .layers import (
    Downsample2D, GroupNorm, ResnetBlock2D, TimestepEmbedding, Transformer2D,
    Upsample2D, get_dtype, timestep_embedding,
)

AttnKey = Tuple[str, int, int, int]


def _captures(capture_keys: Sequence[AttnKey], place: str, block: int,
              attn_idx: int) -> bool:
    return any(k[0] == place and k[1] == block and k[2] == attn_idx
               for k in capture_keys)


class UNetEncoder(nn.Module):
    """conv_in + down blocks. Shared verbatim by :class:`UNet2DCondition`
    and :class:`theatergen_tpu.models.controlnet.ControlNet` (ControlNet is
    a trained copy of the UNet encoder, as in diffusers)."""

    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,          # [B, H, W, C_in]
        temb: jnp.ndarray,            # [B, time_dim]
        context: jnp.ndarray,         # [B, L, ctx_dim]
        *,
        ip_scale=1.0,
        capture_keys: Tuple[AttnKey, ...] = (),
        cond_hint: Optional[jnp.ndarray] = None,
    ):
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dtype,
                    name="conv_in")(sample)
        if cond_hint is not None:
            # ControlNet hint injection right after conv_in (diffusers
            # ControlNetModel semantics).
            h = h + cond_hint.astype(h.dtype)
        skips = [h]
        for i, ch in enumerate(cfg.block_out_channels):
            has_attn = cfg.attention_levels[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                                  fast_norm=cfg.fast_norm,
                                  name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        cfg.num_attention_heads, ch // cfg.num_attention_heads,
                        depth=cfg.transformer_layers_per_block,
                        ip_tokens=cfg.ip_num_tokens,
                        groups=cfg.norm_num_groups, fast_norm=cfg.fast_norm,
                        use_flash=cfg.flash_attention, dtype=dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, context, ip_scale=ip_scale,
                      capture_probs=_captures(capture_keys, "down", i, j))
                skips.append(h)
            if i < len(cfg.block_out_channels) - 1:
                h = Downsample2D(ch, dtype=dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)
        return h, skips


class UNetMid(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, h, temb, context, *, ip_scale=1.0,
                 capture_keys: Tuple[AttnKey, ...] = ()):
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        ch = cfg.block_out_channels[-1]
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          fast_norm=cfg.fast_norm,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(
            cfg.num_attention_heads, ch // cfg.num_attention_heads,
            depth=cfg.transformer_layers_per_block,
            ip_tokens=cfg.ip_num_tokens, groups=cfg.norm_num_groups,
            fast_norm=cfg.fast_norm,
            use_flash=cfg.flash_attention, dtype=dtype,
            name="mid_block_attentions_0",
        )(h, context, ip_scale=ip_scale,
          capture_probs=_captures(capture_keys, "mid", 0, 0))
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          fast_norm=cfg.fast_norm,
                          name="mid_block_resnets_1")(h, temb)
        return h


class UNet2DCondition(nn.Module):
    """Full conditional UNet.

    Call returns ``eps`` prediction ``[B, H, W, out_channels]``.  Pass
    ``mutable=["attn"]`` to ``apply`` when ``capture_keys`` is non-empty to
    receive the sown cross-attention maps.
    """

    cfg: UNetConfig

    @nn.compact
    def __call__(
        self,
        sample: jnp.ndarray,                    # [B, H, W, in_ch]
        timesteps: jnp.ndarray,                 # [B] int32/float32
        context: jnp.ndarray,                   # [B, L, ctx]
        *,
        ip_scale=1.0,
        capture_keys: Tuple[AttnKey, ...] = (),
        down_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        mid_residual: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        sample = sample.astype(dtype)
        context = context.astype(dtype)

        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(
            cfg.block_out_channels[0] * cfg.time_embed_mult, dtype=dtype,
            name="time_embedding",
        )(temb.astype(dtype))
        if temb.shape[0] != sample.shape[0]:
            temb = jnp.broadcast_to(temb, (sample.shape[0],) + temb.shape[1:])

        h, skips = UNetEncoder(cfg, name="encoder")(
            sample, temb, context, ip_scale=ip_scale, capture_keys=capture_keys
        )
        if down_residuals is not None:
            skips = [s + r.astype(s.dtype) for s, r in zip(skips, down_residuals)]

        h = UNetMid(cfg, name="mid")(
            h, temb, context, ip_scale=ip_scale, capture_keys=capture_keys
        )
        if mid_residual is not None:
            h = h + mid_residual.astype(h.dtype)

        n_levels = len(cfg.block_out_channels)
        for idx in range(n_levels):
            i = n_levels - 1 - idx              # source level index
            ch = cfg.block_out_channels[i]
            has_attn = cfg.attention_levels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                                  fast_norm=cfg.fast_norm,
                                  name=f"up_blocks_{idx}_resnets_{j}")(h, temb)
                if has_attn:
                    h = Transformer2D(
                        cfg.num_attention_heads, ch // cfg.num_attention_heads,
                        depth=cfg.transformer_layers_per_block,
                        ip_tokens=cfg.ip_num_tokens,
                        groups=cfg.norm_num_groups, fast_norm=cfg.fast_norm,
                        use_flash=cfg.flash_attention, dtype=dtype,
                        name=f"up_blocks_{idx}_attentions_{j}",
                    )(h, context, ip_scale=ip_scale,
                      capture_probs=_captures(capture_keys, "up", idx, j))
            if idx < n_levels - 1:
                h = Upsample2D(ch, dtype=dtype,
                               name=f"up_blocks_{idx}_upsamplers_0")(h)

        h = GroupNorm(cfg.norm_num_groups,
                      dtype=dtype if cfg.fast_norm else None,
                      name="conv_norm_out")(h)
        h = nn.silu(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dtype,
                    name="conv_out")(h)
        return h
