"""Checkpoint-faithful Swin Transformer backbone (flax, NHWC, static shapes).

GroundingDINO's vision tower is a Swin-T producing stage-2/3/4 feature maps
(the reference loads the external GroundingDINO SwinT-OGC checkpoint,
``generate.py:139-141``); HF ``SwinBackbone`` is the porting source.
Numerics match transformers' Swin (validated in tests/test_gdino.py).

TPU-first choices: NHWC activations; window partition / cyclic shift are
static reshapes + ``jnp.roll`` (window size and resolutions are config
constants); the shifted-window attention masks and relative-position
gather indices are precomputed in numpy at trace time; softmax in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class SwinConfig:
    """Mirrors transformers' SwinConfig (backbone subset).

    Defaults are Swin-T (microsoft/swin-tiny-patch4-window7-224) as used by
    IDEA-Research/grounding-dino-tiny."""

    image_size: int = 224
    patch_size: int = 4
    num_channels: int = 3
    embed_dim: int = 96
    depths: Tuple[int, ...] = (2, 2, 6, 2)
    num_heads: Tuple[int, ...] = (3, 6, 12, 24)
    window_size: int = 7
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    # backbone taps: stage indices (1-based as HF "stage{i}") to emit
    out_stages: Tuple[int, ...] = (2, 3, 4)

    def stage_dim(self, stage: int) -> int:
        return int(self.embed_dim * 2 ** (stage - 1))


def tiny_swin_config() -> SwinConfig:
    return SwinConfig(image_size=64, patch_size=4, embed_dim=16,
                      depths=(1, 2), num_heads=(2, 2), window_size=4,
                      out_stages=(1, 2))


def _rel_pos_index(ws: int) -> np.ndarray:
    """[ws*ws, ws*ws] gather indices into the ((2ws-1)^2, heads) bias
    table (HF SwinSelfAttention buffer)."""
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws),
                                  indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += ws - 1
    rel[:, :, 1] += ws - 1
    rel[:, :, 0] *= 2 * ws - 1
    return rel.sum(-1)


def _shift_attn_mask(h: int, w: int, ws: int, shift: int) -> np.ndarray:
    """Additive [-100/0] mask [num_windows, ws*ws, ws*ws] for SW-MSA
    (HF SwinLayer.get_attn_mask), computed statically."""
    img = np.zeros((h, w))
    count = 0
    for hs in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
        for wsl in (slice(0, -ws), slice(-ws, -shift), slice(-shift, None)):
            img[hs, wsl] = count
            count += 1
    img = img.reshape(h // ws, ws, w // ws, ws)
    win = img.transpose(0, 2, 1, 3).reshape(-1, ws * ws)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def window_partition(x: jnp.ndarray, ws: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    x = x.reshape(b, h // ws, ws, w // ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws * ws, c)


def window_reverse(win: jnp.ndarray, ws: int, h: int, w: int) -> jnp.ndarray:
    c = win.shape[-1]
    x = win.reshape(-1, h // ws, w // ws, ws, ws, c)
    return jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, h, w, c)


class SwinAttention(nn.Module):
    """Windowed MHA with relative position bias (HF SwinSelfAttention +
    SwinSelfOutput)."""

    cfg: SwinConfig
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask) -> jnp.ndarray:
        # x: [num_windows_total, T, C]; mask: [nw, T, T] additive or None
        ws = self.cfg.window_size
        t = x.shape[1]
        hd = self.dim // self.heads
        bias_table = self.param(
            "relative_position_bias_table", nn.initializers.zeros,
            ((2 * ws - 1) ** 2, self.heads))
        q = nn.Dense(self.dim, use_bias=self.cfg.qkv_bias, name="query")(x)
        k = nn.Dense(self.dim, use_bias=self.cfg.qkv_bias, name="key")(x)
        v = nn.Dense(self.dim, use_bias=self.cfg.qkv_bias, name="value")(x)

        def split(y):
            return y.reshape(-1, t, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        logits = jnp.einsum("bhqc,bhkc->bhqk", q, k) / (hd ** 0.5)
        rel = bias_table[_rel_pos_index(ws).reshape(-1)]
        rel = rel.reshape(t, t, self.heads).transpose(2, 0, 1)
        logits = logits + rel[None]
        if mask is not None:
            nw = mask.shape[0]
            logits = logits.reshape(-1, nw, self.heads, t, t)
            logits = logits + mask[None, :, None]
            logits = logits.reshape(-1, self.heads, t, t)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(-1, t, self.dim)
        return nn.Dense(self.dim, name="output")(out)


class SwinLayer(nn.Module):
    """W-MSA / SW-MSA block, pre-LN (HF SwinLayer, always_partition)."""

    cfg: SwinConfig
    dim: int
    heads: int
    resolution: Tuple[int, int]
    shift: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, H*W, C]
        cfg = self.cfg
        h, w = self.resolution
        # HF backbone path runs with always_partition=True: the configured
        # window size and shift apply even when the resolution is smaller
        # (windows pad up), keeping every shape static.
        ws = cfg.window_size
        shift = self.shift
        b = x.shape[0]
        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="layernorm_before")(x)
        x = x.reshape(b, h, w, self.dim)
        pad_r = (ws - w % ws) % ws
        pad_b = (ws - h % ws) % ws
        if pad_r or pad_b:
            x = jnp.pad(x, ((0, 0), (0, pad_b), (0, pad_r), (0, 0)))
        hp, wp = h + pad_b, w + pad_r
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
            mask = jnp.asarray(_shift_attn_mask(hp, wp, ws, shift))
        else:
            mask = None
        win = window_partition(x, ws)
        win = SwinAttention(cfg, self.dim, self.heads,
                            name="attention")(win, mask)
        x = window_reverse(win, ws, hp, wp)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = x[:, :h, :w].reshape(b, h * w, self.dim)
        x = shortcut + x
        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="layernorm_after")(x)
        y = nn.Dense(int(self.dim * cfg.mlp_ratio), name="intermediate")(y)
        y = nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, name="output")(y)
        return x + y


class SwinPatchMerging(nn.Module):
    """2×2 neighborhood concat → LN → linear halving (HF SwinPatchMerging)."""

    cfg: SwinConfig
    dim: int
    resolution: Tuple[int, int]

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h, w = self.resolution
        b = x.shape[0]
        x = x.reshape(b, h, w, self.dim)
        if h % 2 or w % 2:
            x = jnp.pad(x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)))
        parts = [x[:, 0::2, 0::2], x[:, 1::2, 0::2],
                 x[:, 0::2, 1::2], x[:, 1::2, 1::2]]
        x = jnp.concatenate(parts, axis=-1)
        x = x.reshape(b, -1, 4 * self.dim)
        x = nn.LayerNorm(epsilon=self.cfg.layer_norm_eps, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, name="reduction")(x)


class SwinBackbone(nn.Module):
    """Patch embed → stages → per-out-stage LayerNorm; emits NHWC feature
    maps for ``cfg.out_stages`` (HF SwinBackbone semantics)."""

    cfg: SwinConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        cfg = self.cfg
        b = pixels.shape[0]
        g = pixels.shape[1] // cfg.patch_size
        x = nn.Conv(cfg.embed_dim, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size, name="patch_embed")(pixels)
        x = x.reshape(b, g * g, cfg.embed_dim)
        x = nn.LayerNorm(epsilon=1e-5, name="embed_norm")(x)

        outs = []
        res = (g, g)
        for si, depth in enumerate(cfg.depths):
            dim = cfg.stage_dim(si + 1)
            for li in range(depth):
                shift = 0 if li % 2 == 0 else cfg.window_size // 2
                x = SwinLayer(cfg, dim, cfg.num_heads[si], res, shift,
                              name=f"stage_{si}_block_{li}")(x)
            if (si + 1) in cfg.out_stages:
                y = nn.LayerNorm(epsilon=1e-5, name=f"out_norm_{si + 1}")(x)
                outs.append(y.reshape(b, res[0], res[1], dim))
            if si < len(cfg.depths) - 1:
                x = SwinPatchMerging(cfg, dim, res,
                                     name=f"downsample_{si}")(x)
                res = ((res[0] + 1) // 2, (res[1] + 1) // 2)
        return tuple(outs)
