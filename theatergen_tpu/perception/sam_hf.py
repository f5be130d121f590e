"""Checkpoint-faithful SAM (Segment Anything) in flax, NHWC/TPU-first.

The reference segments characters with HF ``SamModel`` box prompts
(``models/sam.py:15-56``).  ``SAMLite`` (perception/sam.py) keeps the
orchestrator running without weights; this module is the *weight-loadable*
equivalent: architecture and numerics match ``transformers``' SAM
(``facebook/sam-vit-base``-style checkpoints port via
``models/weights.py::port_sam``), validated by tiny-config torch golden
tests (tests/test_sam_hf.py).

TPU-first choices (semantics-preserving):
- NHWC activations end-to-end; window partition/unpartition are static
  reshape/transposes (image/patch/window sizes are config constants, so
  every shape is known at trace time — no dynamic padding).
- One fused QKV matmul per vision layer; softmax in fp32.
- The decomposed relative-position bias uses statically precomputed gather
  indices (pure numpy at trace time) instead of runtime interpolation.
- The two-way mask decoder folds the (batch × prompt) axes for its
  attentions, so multi-box turns run as one batched MXU matmul.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# ----------------------------------------------------------------- config


@dataclasses.dataclass(frozen=True)
class SamHFConfig:
    """Mirrors transformers' SamConfig (vision / prompt-encoder / decoder).

    Defaults are facebook/sam-vit-base; tests use a tiny instance.
    """

    # vision encoder
    image_size: int = 1024
    patch_size: int = 16
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    output_channels: int = 256
    window_size: int = 14
    global_attn_indexes: Tuple[int, ...] = (2, 5, 8, 11)
    use_rel_pos: bool = True
    use_abs_pos: bool = True
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-6
    # prompt encoder
    prompt_hidden_size: int = 256
    mask_input_channels: int = 16
    num_pos_feats: int = 128
    # mask decoder
    decoder_hidden_size: int = 256
    decoder_num_layers: int = 2
    decoder_num_heads: int = 8
    decoder_mlp_dim: int = 2048
    attention_downsample_rate: int = 2
    num_multimask_outputs: int = 3
    iou_head_depth: int = 3
    iou_head_hidden_dim: int = 256

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size


def tiny_sam_hf_config() -> SamHFConfig:
    """Small config for CPU tests (matches tests' torch SamConfig)."""
    return SamHFConfig(
        image_size=64, patch_size=8, hidden_size=32, num_layers=3,
        num_heads=2, output_channels=16, window_size=4,
        global_attn_indexes=(1,), prompt_hidden_size=16, num_pos_feats=8,
        decoder_hidden_size=16, decoder_num_heads=2, decoder_mlp_dim=32,
        iou_head_hidden_dim=16, mask_input_channels=8,
    )


# --------------------------------------------------- decomposed rel-pos


def _rel_pos_indices(q_size: int, k_size: int) -> np.ndarray:
    """Static gather indices into a (2*max(q,k)-1, C) rel-pos table
    (transformers SamVisionAttention.get_rel_pos for equal q/k grids)."""
    q = np.arange(q_size)[:, None] * max(k_size / q_size, 1.0)
    k = np.arange(k_size)[None, :] * max(q_size / k_size, 1.0)
    return ((q - k) + (k_size - 1) * max(q_size / k_size, 1.0)).astype(np.int64)


def _resize_rel_pos(rel_pos: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear resize along axis 0 when the stored table length differs
    from 2*size-1 (HF interpolates with align_corners=False)."""
    if rel_pos.shape[0] == target_len:
        return rel_pos
    return jax.image.resize(
        rel_pos, (target_len, rel_pos.shape[1]), method="linear"
    )


def decomposed_rel_pos_bias(
    query: jnp.ndarray,          # [B, H*W, C_head] per-head-folded queries
    rel_pos_h: jnp.ndarray,      # [Lh, C_head]
    rel_pos_w: jnp.ndarray,      # [Lw, C_head]
    size: int,
) -> jnp.ndarray:
    """MViTv2 decomposed relative position bias for a square size×size
    grid; returns [B, H*W, H*W] to add to attention logits."""
    idx = _rel_pos_indices(size, size)
    rh = _resize_rel_pos(rel_pos_h, 2 * size - 1)[idx]   # [s, s, C]
    rw = _resize_rel_pos(rel_pos_w, 2 * size - 1)[idx]
    b = query.shape[0]
    q = query.reshape(b, size, size, -1)
    bias_h = jnp.einsum("bhwc,hkc->bhwk", q, rh)
    bias_w = jnp.einsum("bhwc,wkc->bhwk", q, rw)
    bias = bias_h[:, :, :, :, None] + bias_w[:, :, :, None, :]
    return bias.reshape(b, size * size, size * size)


# ------------------------------------------------------- vision encoder


class SamVisionAttention(nn.Module):
    """Fused-QKV multi-head attention with decomposed rel-pos bias.

    ``size`` is the static side length of the (square) token grid this
    layer attends over (window size for windowed layers, full grid for
    global layers)."""

    cfg: SamHFConfig
    size: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, s, s, C]
        cfg = self.cfg
        b, s, _, c = x.shape
        heads = cfg.num_heads
        hd = c // heads
        qkv = nn.Dense(3 * c, use_bias=cfg.qkv_bias, name="qkv")(x)
        qkv = qkv.reshape(b, s * s, 3, heads, hd)
        # fold heads into batch: [3, B*heads, s*s, hd]
        qkv = jnp.transpose(qkv, (2, 0, 3, 1, 4)).reshape(
            3, b * heads, s * s, hd)
        q, k, v = qkv[0], qkv[1], qkv[2]
        logits = jnp.einsum("bqc,bkc->bqk", q * (hd ** -0.5), k)
        if cfg.use_rel_pos:
            rel_h = self.param("rel_pos_h", nn.initializers.zeros,
                               (2 * self.size - 1, hd))
            rel_w = self.param("rel_pos_w", nn.initializers.zeros,
                               (2 * self.size - 1, hd))
            logits = logits + decomposed_rel_pos_bias(q, rel_h, rel_w, s)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bqk,bkc->bqc", probs.astype(v.dtype), v)
        out = out.reshape(b, heads, s, s, hd)
        out = jnp.transpose(out, (0, 2, 3, 1, 4)).reshape(b, s, s, c)
        return nn.Dense(c, name="proj")(out)


def window_partition(x: jnp.ndarray, ws: int) -> Tuple[jnp.ndarray, int]:
    """[B, H, W, C] → [B*nw, ws, ws, C]; pads bottom/right to a multiple
    of ``ws`` (all sizes static)."""
    b, h, w, c = x.shape
    pad_h = (ws - h % ws) % ws
    pad_w = (ws - w % ws) % ws
    if pad_h or pad_w:
        x = jnp.pad(x, ((0, 0), (0, pad_h), (0, pad_w), (0, 0)))
    ph, pw = h + pad_h, w + pad_w
    x = x.reshape(b, ph // ws, ws, pw // ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, ws, ws, c)
    return x, ph


def window_unpartition(win: jnp.ndarray, ws: int, padded: int, orig: int
                       ) -> jnp.ndarray:
    nw = padded // ws
    c = win.shape[-1]
    x = win.reshape(-1, nw, nw, ws, ws, c)
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5)).reshape(-1, padded, padded, c)
    return x[:, :orig, :orig]


class SamVisionLayer(nn.Module):
    cfg: SamHFConfig
    window: int   # 0 = global

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm1")(x)
        if self.window > 0:
            orig = h.shape[1]
            h, padded = window_partition(h, self.window)
            h = SamVisionAttention(cfg, self.window, name="attn")(h)
            h = window_unpartition(h, self.window, padded, orig)
        else:
            h = SamVisionAttention(cfg, cfg.grid_size, name="attn")(h)
        x = x + h
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, name="layer_norm2")(x)
        d = cfg.hidden_size
        h = nn.Dense(int(d * cfg.mlp_ratio), name="mlp_lin1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(d, name="mlp_lin2")(h)
        return x + h


class SamVisionEncoder(nn.Module):
    """Patchify → windowed/global ViT → neck; output [B, g, g, out_ch]."""

    cfg: SamHFConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray) -> jnp.ndarray:  # [B,S,S,3]
        cfg = self.cfg
        g = cfg.grid_size
        x = nn.Conv(cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
                    strides=cfg.patch_size, name="patch_embed")(pixels)
        if cfg.use_abs_pos:
            pos = self.param("pos_embed", nn.initializers.zeros,
                             (1, g, g, cfg.hidden_size))
            x = x + pos
        for i in range(cfg.num_layers):
            win = 0 if i in cfg.global_attn_indexes else cfg.window_size
            x = SamVisionLayer(cfg, win, name=f"layers_{i}")(x)
        x = nn.Conv(cfg.output_channels, (1, 1), use_bias=False,
                    name="neck_conv1")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="neck_ln1")(x)
        x = nn.Conv(cfg.output_channels, (3, 3), padding=1, use_bias=False,
                    name="neck_conv2")(x)
        return nn.LayerNorm(epsilon=1e-6, name="neck_ln2")(x)


# ------------------------------------------------------- prompt encoder


class SamPositionalEmbedding(nn.Module):
    """Random-Fourier point encoding shared by the prompt encoder and the
    decoder's image-wide positional grid."""

    cfg: SamHFConfig

    @nn.compact
    def __call__(self, coords: jnp.ndarray) -> jnp.ndarray:  # [...,2] in [0,1]
        pe = self.param(
            "positional_embedding",
            nn.initializers.normal(float(self.cfg.prompt_hidden_size // 2)),
            (2, self.cfg.num_pos_feats),
        )
        c = (2 * coords - 1).astype(pe.dtype) @ pe * (2 * jnp.pi)
        return jnp.concatenate([jnp.sin(c), jnp.cos(c)], axis=-1)


class SamPromptEncoder(nn.Module):
    """Box (and point) prompts → sparse embeddings; no-mask dense embed.

    Boxes are in *pixel* coordinates of ``cfg.image_size`` (HF convention:
    +0.5 pixel-center shift then normalization inside)."""

    cfg: SamHFConfig

    def setup(self):
        d = self.cfg.prompt_hidden_size
        self.shared_embedding = SamPositionalEmbedding(self.cfg)
        # 0: negative point, 1: positive point, 2/3: box corners
        self.point_embed = self.param(
            "point_embed", nn.initializers.normal(0.02), (4, d))
        self.not_a_point_embed = self.param(
            "not_a_point_embed", nn.initializers.normal(0.02), (d,))
        self.no_mask_embed = self.param(
            "no_mask_embed", nn.initializers.normal(0.02), (d,))

    def embed_boxes(self, boxes: jnp.ndarray) -> jnp.ndarray:
        """[B, Nb, 4] pixel xyxy → [B, Nb, 2, D]."""
        s = float(self.cfg.image_size)
        corners = (boxes.reshape(*boxes.shape[:-1], 2, 2) + 0.5) / s
        emb = self.shared_embedding(corners)
        return emb + self.point_embed[None, None, 2:4]

    def embed_points(self, points: jnp.ndarray, labels: jnp.ndarray
                     ) -> jnp.ndarray:
        """[B, P, N, 2] pixel xy + labels {-10 pad, -1 bg, 0 neg, 1 pos}
        → [B, P, N, D]."""
        s = float(self.cfg.image_size)
        emb = self.shared_embedding((points + 0.5) / s)
        lab = labels[..., None]
        emb = jnp.where(lab == -1, self.not_a_point_embed, emb)
        emb = jnp.where(lab == -10, 0.0, emb)
        emb = jnp.where(lab == 0, emb + self.point_embed[0], emb)
        emb = jnp.where(lab == 1, emb + self.point_embed[1], emb)
        return emb

    def dense_no_mask(self, batch: int) -> jnp.ndarray:
        g = self.cfg.grid_size
        return jnp.broadcast_to(
            self.no_mask_embed[None, None, None, :],
            (batch, g, g, self.cfg.prompt_hidden_size),
        )

    def __call__(self, boxes: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        return self.embed_boxes(boxes), self.dense_no_mask(boxes.shape[0])

    def image_wide_pe(self) -> jnp.ndarray:
        """[g, g, D] positional grid for the decoder (HF
        get_image_wide_positional_embeddings)."""
        g = self.cfg.grid_size
        coords = (jnp.arange(g, dtype=jnp.float32) + 0.5) / g
        x = jnp.broadcast_to(coords[None, :], (g, g))
        y = jnp.broadcast_to(coords[:, None], (g, g))
        return self.shared_embedding(jnp.stack([x, y], axis=-1))


# --------------------------------------------------------- mask decoder


class SamDecoderAttention(nn.Module):
    """Attention with optional internal-dim downsampling (HF SamAttention).

    Operates on [B, P, T, D]; the B*P fold keeps one batched matmul."""

    cfg: SamHFConfig
    downsample: int = 1

    @nn.compact
    def __call__(self, q_in, k_in, v_in):
        cfg = self.cfg
        d = cfg.decoder_hidden_size
        inner = d // self.downsample
        heads = cfg.decoder_num_heads
        hd = inner // heads
        b, p = q_in.shape[:2]

        def split(x):
            return x.reshape(b * p, x.shape[2], heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(inner, name="q_proj")(q_in))
        k = split(nn.Dense(inner, name="k_proj")(k_in))
        v = split(nn.Dense(inner, name="v_proj")(v_in))
        logits = jnp.einsum("bhqc,bhkc->bhqk", q * (hd ** -0.5), k)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, p, -1, inner)
        return nn.Dense(d, name="out_proj")(out)


class SamTwoWayBlock(nn.Module):
    """sparse self-attn → sparse→image cross → MLP → image→sparse cross."""

    cfg: SamHFConfig
    skip_first_layer_pe: bool = False

    @nn.compact
    def __call__(self, queries, keys, query_pe, key_pe):
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        if self.skip_first_layer_pe:
            queries = SamDecoderAttention(cfg, 1, name="self_attn")(
                queries, queries, queries)
        else:
            q = queries + query_pe
            queries = queries + SamDecoderAttention(cfg, 1, name="self_attn")(
                q, q, queries)
        queries = nn.LayerNorm(epsilon=eps, name="layer_norm1")(queries)

        q = queries + query_pe
        k = keys + key_pe
        queries = queries + SamDecoderAttention(
            cfg, cfg.attention_downsample_rate,
            name="cross_attn_token_to_image")(q, k, keys)
        queries = nn.LayerNorm(epsilon=eps, name="layer_norm2")(queries)

        h = nn.Dense(cfg.decoder_mlp_dim, name="mlp_lin1")(queries)
        h = nn.Dense(cfg.decoder_hidden_size, name="mlp_lin2")(nn.relu(h))
        queries = nn.LayerNorm(epsilon=eps, name="layer_norm3")(queries + h)

        q = queries + query_pe
        k = keys + key_pe
        keys = keys + SamDecoderAttention(
            cfg, cfg.attention_downsample_rate,
            name="cross_attn_image_to_token")(k, q, queries)
        keys = nn.LayerNorm(epsilon=eps, name="layer_norm4")(keys)
        return queries, keys


class SamFeedForwardHead(nn.Module):
    """proj_in → relu → hidden layers → proj_out (HF SamFeedForward)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    sigmoid_output: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.relu(nn.Dense(self.hidden_dim, name="proj_in")(x))
        for i in range(self.num_layers - 2):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        x = nn.Dense(self.output_dim, name="proj_out")(x)
        return jax.nn.sigmoid(x) if self.sigmoid_output else x


class SamMaskDecoder(nn.Module):
    cfg: SamHFConfig

    @nn.compact
    def __call__(
        self,
        image_embed: jnp.ndarray,   # [B, g, g, D] (dense prompt added here)
        image_pe: jnp.ndarray,      # [g, g, D]
        sparse: jnp.ndarray,        # [B, P, T_s, D]
        dense: jnp.ndarray,         # [B, g, g, D]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """→ (mask logits [B, P, M+1, 4g, 4g], iou [B, P, M+1]) — callers
        slice [1:] for multimask (HF multimask_output=True)."""
        cfg = self.cfg
        d = cfg.decoder_hidden_size
        m = cfg.num_multimask_outputs + 1
        b, p = sparse.shape[:2]
        g = image_embed.shape[1]

        iou_token = self.param("iou_token", nn.initializers.normal(0.02),
                               (1, d))
        mask_tokens = self.param("mask_tokens", nn.initializers.normal(0.02),
                                 (m, d))
        out_tokens = jnp.concatenate([iou_token, mask_tokens], axis=0)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(out_tokens[None, None], (b, p, 1 + m, d)),
             sparse], axis=2)

        img = (image_embed + dense).reshape(b, 1, g * g, d)
        img = jnp.broadcast_to(img, (b, p, g * g, d))
        pe = jnp.broadcast_to(image_pe.reshape(1, 1, g * g, d), img.shape)

        queries, keys = tokens, img
        for i in range(cfg.decoder_num_layers):
            queries, keys = SamTwoWayBlock(
                cfg, skip_first_layer_pe=(i == 0), name=f"layers_{i}"
            )(queries, keys, tokens, pe)
        q = queries + tokens
        k = keys + pe
        queries = queries + SamDecoderAttention(
            cfg, cfg.attention_downsample_rate,
            name="final_attn_token_to_image")(q, k, keys)
        # HF layer_norm_final_attn uses torch's default eps (1e-5)
        queries = nn.LayerNorm(epsilon=1e-5, name="layer_norm_final_attn")(
            queries)

        iou_out = queries[:, :, 0]
        mask_out = queries[:, :, 1:1 + m]

        up = keys.reshape(b * p, g, g, d)
        up = nn.ConvTranspose(d // 4, (2, 2), strides=(2, 2),
                              name="upscale_conv1")(up)
        up = nn.LayerNorm(epsilon=1e-6, name="upscale_layer_norm")(up)
        up = nn.gelu(up, approximate=False)
        up = nn.ConvTranspose(d // 8, (2, 2), strides=(2, 2),
                              name="upscale_conv2")(up)
        up = nn.gelu(up, approximate=False)          # [B*P, 4g, 4g, d/8]
        up = up.reshape(b, p, 4 * g * 4 * g, d // 8)

        hyper = jnp.stack(
            [SamFeedForwardHead(d, d // 8, 3, name=f"hyper_mlps_{i}")(
                mask_out[:, :, i]) for i in range(m)], axis=2)
        masks = jnp.einsum("bpmc,bpnc->bpmn", hyper, up)
        masks = masks.reshape(b, p, m, 4 * g, 4 * g)

        iou = SamFeedForwardHead(
            cfg.iou_head_hidden_dim, m, cfg.iou_head_depth,
            name="iou_prediction_head")(iou_out)
        return masks, iou


# ------------------------------------------------------------ top level

# HF SamProcessor pixel normalization (ImageNet), applied to [0,1] inputs.
SAM_PIXEL_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
SAM_PIXEL_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(image01: jnp.ndarray) -> jnp.ndarray:
    """[..., H, W, 3] in [0,1] → normalized (HF SamProcessor semantics;
    resizing to cfg.image_size is the caller's concern)."""
    return (image01 - SAM_PIXEL_MEAN) / SAM_PIXEL_STD


class SamHF(nn.Module):
    """Full SAM: vision encoder + prompt encoder + mask decoder.

    ``__call__(pixels, boxes)`` mirrors the reference's box-prompted use
    (``models/sam.py:26-56``): pixels [B, S, S, 3] normalized, boxes
    [B, Nb, 4] in pixel xyxy → (mask logits [B, Nb, 3, 4g, 4g],
    iou [B, Nb, 3]) — the 3 multimask candidates the selection rules
    consume."""

    cfg: SamHFConfig

    def setup(self):
        self.vision_encoder = SamVisionEncoder(self.cfg)
        self.prompt_encoder = SamPromptEncoder(self.cfg)
        self.mask_decoder = SamMaskDecoder(self.cfg)

    def encode_image(self, pixels: jnp.ndarray) -> jnp.ndarray:
        return self.vision_encoder(pixels)

    def decode(self, image_embed: jnp.ndarray, boxes: jnp.ndarray,
               multimask: bool = True):
        sparse, dense = self.prompt_encoder(boxes)
        pe = self.prompt_encoder.image_wide_pe()
        masks, iou = self.mask_decoder(image_embed, pe, sparse, dense)
        if multimask:
            return masks[:, :, 1:], iou[:, :, 1:]
        return masks[:, :, :1], iou[:, :, :1]

    def __call__(self, pixels: jnp.ndarray, boxes: jnp.ndarray,
                 multimask: bool = True):
        return self.decode(self.encode_image(pixels), boxes, multimask)
