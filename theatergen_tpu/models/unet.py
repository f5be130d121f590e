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
              attn_idx: int) -> Tuple[int, ...]:
    """Transformer-block layer indices to capture at this attention module
    (4th key field — reference attn-key format, models/transformer_2d.py:
    299-304 stamps per transformer-block layer)."""
    return tuple(k[3] for k in capture_keys
                 if k[0] == place and k[1] == block and k[2] == attn_idx)


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
        level_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,
        max_level: Optional[int] = None,
        objs: Optional[jnp.ndarray] = None,
    ):
        """``max_level``: stop after that many levels' resnet/attn layers
        (no trailing downsample) — the partial down path of a DeepCache
        shallow step (arXiv 2312.00858). ``None`` runs the full encoder."""
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        h = nn.Conv(cfg.block_out_channels[0], (3, 3), padding=1, dtype=dtype,
                    name="conv_in")(sample)
        if cond_hint is not None:
            # ControlNet hint injection right after conv_in (diffusers
            # ControlNetModel semantics).
            h = h + cond_hint.astype(h.dtype)
        skips = [h]
        levels = (cfg.block_out_channels if max_level is None
                  else cfg.block_out_channels[:max_level])
        for i, ch in enumerate(levels):
            has_attn = cfg.attention_levels[i]
            for j in range(cfg.layers_per_block):
                h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                                  fast_norm=cfg.fast_norm,
                                  quantized=cfg.quantized,
                                  name=f"down_blocks_{i}_resnets_{j}")(h, temb)
                if has_attn:
                    heads = cfg.heads_at(i)
                    h = Transformer2D(
                        heads, ch // heads,
                        depth=cfg.depth_at(i),
                        ip_tokens=cfg.ip_num_tokens,
                        groups=cfg.norm_num_groups, fast_norm=cfg.fast_norm,
                        quantized=cfg.quantized, fused_ff=cfg.fused_ff,
                        use_flash=cfg.flash_attention, dtype=dtype,
                        name=f"down_blocks_{i}_attentions_{j}",
                    )(h, context, ip_scale=ip_scale, objs=objs,
                      capture_layers=_captures(capture_keys, "down", i, j))
                skips.append(h)
            if level_residuals is not None and i < len(level_residuals):
                # T2I-Adapter structure features, added at the end of each
                # level (the reference XL path's adapter_state injection,
                # models/pipelines.py:745-797)
                h = h + level_residuals[i].astype(h.dtype)
            if i < len(levels) - 1:
                h = Downsample2D(ch, dtype=dtype,
                                 name=f"down_blocks_{i}_downsamplers_0")(h)
                skips.append(h)
        return h, skips


class UNetMid(nn.Module):
    cfg: UNetConfig

    @nn.compact
    def __call__(self, h, temb, context, *, ip_scale=1.0,
                 capture_keys: Tuple[AttnKey, ...] = (),
                 objs: Optional[jnp.ndarray] = None):
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        ch = cfg.block_out_channels[-1]
        last = len(cfg.block_out_channels) - 1
        heads = cfg.heads_at(last)
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          fast_norm=cfg.fast_norm, quantized=cfg.quantized,
                          name="mid_block_resnets_0")(h, temb)
        h = Transformer2D(
            heads, ch // heads,
            depth=cfg.depth_at(last),
            ip_tokens=cfg.ip_num_tokens, groups=cfg.norm_num_groups,
            fast_norm=cfg.fast_norm, quantized=cfg.quantized,
            fused_ff=cfg.fused_ff,
            use_flash=cfg.flash_attention, dtype=dtype,
            name="mid_block_attentions_0",
        )(h, context, ip_scale=ip_scale, objs=objs,
          capture_layers=_captures(capture_keys, "mid", 0, 0))
        h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                          fast_norm=cfg.fast_norm, quantized=cfg.quantized,
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
        pooled_text: Optional[jnp.ndarray] = None,   # SDXL [B, pooled_dim]
        time_ids: Optional[jnp.ndarray] = None,      # SDXL [B, 6]
        level_residuals: Optional[Tuple[jnp.ndarray, ...]] = None,  # T2I
        deep_cache: Optional[jnp.ndarray] = None,
        return_deep_cache: bool = False,
        cache_level: int = 1,
        objs: Optional[jnp.ndarray] = None,   # GLIGEN grounding tokens
    ) -> jnp.ndarray:
        """DeepCache (arXiv 2312.00858) support:

        - ``return_deep_cache=True``: full forward, returns
          ``(eps, cache)`` where ``cache`` is the feature entering the
          ``cache_level``-shallowest up block (right after the preceding
          Upsample2D) — the temporally-smooth deep feature.
        - ``deep_cache=<cache>``: shallow forward — only the first
          ``cache_level`` encoder levels and the last ``cache_level`` up
          blocks run; mid and all deeper blocks are skipped, ``cache``
          substitutes their output. With a cache produced at the same
          ``(sample, t, context)`` this is EXACTLY the full forward;
          reusing the previous step's cache is the DeepCache
          approximation (~70% FLOPs saved at ``cache_level=1`` on SD1.5).
        """
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        sample = sample.astype(dtype)
        context = context.astype(dtype)

        if timesteps.ndim == 0:
            timesteps = timesteps[None]
        time_dim = cfg.block_out_channels[0] * cfg.time_embed_mult
        temb = timestep_embedding(timesteps, cfg.block_out_channels[0])
        temb = TimestepEmbedding(
            time_dim, dtype=dtype, quantized=cfg.quantized,
            name="time_embedding",
        )(temb.astype(dtype))
        if temb.shape[0] != sample.shape[0]:
            temb = jnp.broadcast_to(temb, (sample.shape[0],) + temb.shape[1:])
        if cfg.addition_embed_type == "text_time":
            # SDXL micro-conditioning (diffusers add_embedding):
            # per-id sinusoids ++ pooled text → MLP → added to temb
            assert pooled_text is not None and time_ids is not None
            b_sz = time_ids.shape[0]
            tid = timestep_embedding(
                time_ids.reshape(-1), cfg.addition_time_embed_dim
            ).reshape(b_sz, -1)
            add = jnp.concatenate(
                [pooled_text.astype(dtype), tid.astype(dtype)], axis=-1)
            add = TimestepEmbedding(time_dim, dtype=dtype,
                                    name="add_embedding")(add)
            if add.shape[0] != temb.shape[0]:
                add = jnp.broadcast_to(add, temb.shape)
            temb = temb + add

        n_levels = len(cfg.block_out_channels)
        resume_idx = n_levels - cache_level     # first up block of a
                                                # shallow forward

        def up_block(h, idx, skips):
            i = n_levels - 1 - idx              # source level index
            ch = cfg.block_out_channels[i]
            has_attn = cfg.attention_levels[i]
            for j in range(cfg.layers_per_block + 1):
                skip = skips.pop()
                h = jnp.concatenate([h, skip.astype(h.dtype)], axis=-1)
                h = ResnetBlock2D(ch, groups=cfg.norm_num_groups, dtype=dtype,
                                  fast_norm=cfg.fast_norm,
                                  quantized=cfg.quantized,
                                  name=f"up_blocks_{idx}_resnets_{j}")(h, temb)
                if has_attn:
                    heads = cfg.heads_at(i)
                    h = Transformer2D(
                        heads, ch // heads,
                        depth=cfg.depth_at(i),
                        ip_tokens=cfg.ip_num_tokens,
                        groups=cfg.norm_num_groups, fast_norm=cfg.fast_norm,
                        quantized=cfg.quantized, fused_ff=cfg.fused_ff,
                        use_flash=cfg.flash_attention, dtype=dtype,
                        name=f"up_blocks_{idx}_attentions_{j}",
                    )(h, context, ip_scale=ip_scale, objs=objs,
                      capture_layers=_captures(capture_keys, "up", idx, j))
            if idx < n_levels - 1:
                h = Upsample2D(ch, dtype=dtype,
                               name=f"up_blocks_{idx}_upsamplers_0")(h)
            return h

        cache_out = None
        if deep_cache is None:
            h, skips = UNetEncoder(cfg, name="encoder")(
                sample, temb, context, ip_scale=ip_scale,
                capture_keys=capture_keys, level_residuals=level_residuals,
                objs=objs,
            )
            if down_residuals is not None:
                skips = [s + r.astype(s.dtype)
                         for s, r in zip(skips, down_residuals)]

            h = UNetMid(cfg, name="mid")(
                h, temb, context, ip_scale=ip_scale,
                capture_keys=capture_keys, objs=objs,
            )
            if mid_residual is not None:
                h = h + mid_residual.astype(h.dtype)

            for idx in range(n_levels):
                if idx == resume_idx:
                    cache_out = h
                h = up_block(h, idx, skips)
        else:
            # shallow forward: partial encoder (fresh skip connections for
            # the shallow levels), cached feature replaces everything deeper
            h, skips = UNetEncoder(cfg, name="encoder")(
                sample, temb, context, ip_scale=ip_scale,
                capture_keys=capture_keys, level_residuals=level_residuals,
                max_level=cache_level, objs=objs,
            )
            if down_residuals is not None:
                # shallow skips are a prefix of the full skip stack, so the
                # residual ordering lines up; deeper residuals are unused
                skips = [s + r.astype(s.dtype)
                         for s, r in zip(skips, down_residuals)]
            h = deep_cache.astype(dtype)
            for idx in range(resume_idx, n_levels):
                h = up_block(h, idx, skips)

        h = GroupNorm(cfg.norm_num_groups,
                      dtype=dtype if cfg.fast_norm else None,
                      act="silu", name="conv_norm_out")(h)
        h = nn.Conv(cfg.out_channels, (3, 3), padding=1, dtype=dtype,
                    name="conv_out")(h)
        if return_deep_cache:
            return h, cache_out
        return h
