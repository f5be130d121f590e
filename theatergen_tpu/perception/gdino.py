"""Checkpoint-faithful Grounding DINO (flax), TPU-first.

The reference detects characters with an external GroundingDINO checkout
(``utils/detector.py:5-21``, loaded at ``generate.py:139-141``).  This is
the weight-loadable equivalent: Swin backbone (perception/swin.py) + BERT
text tower (perception/bert.py) + feature-enhancer encoder (bidirectional
vision/text fusion, text self-attention, multiscale deformable attention)
+ language-guided query selection + cross-modality decoder with iterative
box refinement + contrastive class / MLP box heads.  Architecture and
numerics match HF ``GroundingDinoForObjectDetection`` (IDEA-Research
checkpoints port via ``models/weights.py::port_grounding_dino``; golden
tests in tests/test_gdino.py).

TPU-first choices (semantics-preserving):
- Fixed-size single-image inference: pixel masks are all-valid, so the
  sine position grids, encoder reference points, and first-stage proposal
  geometry are static numpy constants folded into the trace (the
  reference's dynamic mask plumbing exists only for ragged batches).
- Multiscale deformable attention is a vectorized gather + bilinear blend
  per (static) level — no dynamic loops; everything lands on batched
  einsums apart from the 4-corner gathers.
- Softmax in fp32; text-block masks are additive constants.
"""

from __future__ import annotations

import dataclasses
import math
from typing import List, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from .bert import BertConfig, BertTextEncoder, tiny_bert_config
from .swin import SwinBackbone, SwinConfig, tiny_swin_config

# BERT [CLS], [SEP], '.', '?' — phrase delimiters (HF SPECIAL_TOKENS)
SPECIAL_TOKEN_IDS = (101, 102, 1012, 1029)


@dataclasses.dataclass(frozen=True)
class GroundingDinoConfig:
    """Mirrors HF GroundingDinoConfig (inference subset); defaults are
    IDEA-Research/grounding-dino-tiny."""

    swin: SwinConfig = dataclasses.field(default_factory=SwinConfig)
    bert: BertConfig = dataclasses.field(default_factory=BertConfig)
    image_size: int = 800
    d_model: int = 256
    num_queries: int = 900
    encoder_layers: int = 6
    decoder_layers: int = 6
    encoder_attention_heads: int = 8
    decoder_attention_heads: int = 8
    encoder_ffn_dim: int = 2048
    decoder_ffn_dim: int = 2048
    num_feature_levels: int = 4
    encoder_n_points: int = 4
    decoder_n_points: int = 4
    max_text_len: int = 256
    layer_norm_eps: float = 1e-5
    positional_embedding_temperature: float = 20.0

    @property
    def level_shapes(self) -> Tuple[Tuple[int, int], ...]:
        """Static (h, w) of each feature level (backbone stages at strides
        8/16/32 + one extra stride-2 conv level).  Patch merging rounds UP
        (SwinPatchMerging pads odd resolutions), so sizes track ceil, not
        floor."""
        per_stage = {}
        s = self.image_size // self.swin.patch_size
        for stage in range(1, len(self.swin.depths) + 1):
            per_stage[stage] = s
            s = (s + 1) // 2
        shapes = [(per_stage[st], per_stage[st])
                  for st in self.swin.out_stages]
        for _ in range(self.num_feature_levels - len(self.swin.out_stages)):
            s = (shapes[-1][0] + 1) // 2
            shapes.append((s, s))
        return tuple(shapes)


def tiny_gdino_config() -> GroundingDinoConfig:
    return GroundingDinoConfig(
        swin=tiny_swin_config(), bert=tiny_bert_config(), image_size=64,
        d_model=32, num_queries=10, encoder_layers=2, decoder_layers=2,
        encoder_attention_heads=4, decoder_attention_heads=4,
        encoder_ffn_dim=64, decoder_ffn_dim=64, num_feature_levels=3,
        max_text_len=32,
    )


# ----------------------------------------------------- static geometry


def sine_position_2d(h: int, w: int, d_model: int, temperature: float
                     ) -> np.ndarray:
    """[h, w, d_model] DETR-style sine grid (HF
    GroundingDinoSinePositionEmbedding with an all-valid mask)."""
    half = d_model // 2
    eps = 1e-6
    y = (np.arange(1, h + 1, dtype=np.float32) / (h + eps) * 2 * np.pi)
    x = (np.arange(1, w + 1, dtype=np.float32) / (w + eps) * 2 * np.pi)
    dim_t = temperature ** (2 * (np.arange(half) // 2) / half)
    py = y[:, None] / dim_t        # [h, half]
    px = x[:, None] / dim_t
    py = np.stack([np.sin(py[:, 0::2]), np.cos(py[:, 1::2])],
                  axis=2).reshape(h, -1)
    px = np.stack([np.sin(px[:, 0::2]), np.cos(px[:, 1::2])],
                  axis=2).reshape(w, -1)
    pos = np.concatenate(
        [np.broadcast_to(py[:, None], (h, w, py.shape[-1])),
         np.broadcast_to(px[None, :], (h, w, px.shape[-1]))], axis=-1)
    return pos.astype(np.float32)


def encoder_reference_points(shapes: Sequence[Tuple[int, int]]
                             ) -> np.ndarray:
    """[S_total, 2] per-position normalized centers (all-valid masks make
    every level's valid_ratio 1, so the L axis is a broadcast)."""
    refs = []
    for h, w in shapes:
        ry = (np.arange(h, dtype=np.float32) + 0.5) / h
        rx = (np.arange(w, dtype=np.float32) + 0.5) / w
        gy, gx = np.meshgrid(ry, rx, indexing="ij")
        refs.append(np.stack([gx, gy], -1).reshape(-1, 2))
    return np.concatenate(refs, 0)


def output_proposals(shapes: Sequence[Tuple[int, int]]
                     ) -> Tuple[np.ndarray, np.ndarray]:
    """First-stage proposal logits [S, 4] + validity [S] (HF
    generate_encoder_output_proposals with all-valid padding)."""
    props = []
    for lvl, (h, w) in enumerate(shapes):
        gy, gx = np.meshgrid(np.arange(h, dtype=np.float32),
                             np.arange(w, dtype=np.float32), indexing="ij")
        grid = np.stack([(gx + 0.5) / w, (gy + 0.5) / h], -1)
        wh = np.full_like(grid, 0.05 * 2.0 ** lvl)
        props.append(np.concatenate([grid, wh], -1).reshape(-1, 4))
    p = np.concatenate(props, 0)
    valid = ((p > 0.01) & (p < 0.99)).all(-1)
    logit = np.log(p / (1 - p))
    logit[~valid] = np.inf
    return logit.astype(np.float32), valid


def get_sine_pos_embed(pos: jnp.ndarray, num_pos_feats: int,
                       temperature: float = 10000.0,
                       exchange_xy: bool = True) -> jnp.ndarray:
    """[..., n] positions → [..., n*num_pos_feats] sine embeddings (HF
    get_sine_pos_embed)."""
    scale = 2 * math.pi
    dim_t = temperature ** (
        2 * (jnp.arange(num_pos_feats) // 2) / num_pos_feats)

    def embed(x):          # [...] → [..., num_pos_feats]
        sx = x[..., None] * scale / dim_t
        return jnp.stack([jnp.sin(sx[..., 0::2]), jnp.cos(sx[..., 1::2])],
                         axis=-1).reshape(*x.shape, num_pos_feats)

    parts = [embed(pos[..., i]) for i in range(pos.shape[-1])]
    if exchange_xy and len(parts) >= 2:
        parts[0], parts[1] = parts[1], parts[0]
    return jnp.concatenate(parts, axis=-1)


# ------------------------------------------- multiscale deformable attn


def ms_deform_attention(
    value: jnp.ndarray,                      # [B, S, H, D]
    shapes: Sequence[Tuple[int, int]],       # static level shapes
    sampling_locations: jnp.ndarray,         # [B, Q, H, L, P, 2] in [0,1]
    attention_weights: jnp.ndarray,          # [B, Q, H, L, P] (softmaxed)
) -> jnp.ndarray:
    """Gather-based grid_sample equivalent of HF
    MultiScaleDeformableAttention (bilinear, zeros padding,
    align_corners=False).  Returns [B, Q, H*D]."""
    b, _, heads, d = value.shape
    q = sampling_locations.shape[1]
    out = jnp.zeros((b, heads, q, d), value.dtype)
    start = 0
    for lvl, (h, w) in enumerate(shapes):
        v = value[:, start:start + h * w]          # [B, hw, H, D]
        start += h * w
        v = v.transpose(0, 2, 1, 3)                # [B, H, hw, D]
        loc = sampling_locations[:, :, :, lvl]     # [B, Q, H, P, 2]
        ix = loc[..., 0] * w - 0.5
        iy = loc[..., 1] * h - 0.5
        x0 = jnp.floor(ix)
        y0 = jnp.floor(iy)
        fx = ix - x0
        fy = iy - y0
        aw = attention_weights[:, :, :, lvl]       # [B, Q, H, P]
        sampled = jnp.zeros((b, heads, q, loc.shape[3], d), value.dtype)
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                wgt = (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                inb = ((xi >= 0) & (xi < w) & (yi >= 0) & (yi < h))
                idx = (jnp.clip(yi, 0, h - 1) * w +
                       jnp.clip(xi, 0, w - 1)).astype(jnp.int32)
                # [B, Q, H, P] → [B, H, Q*P]
                idx = idx.transpose(0, 2, 1, 3).reshape(b, heads, -1)
                g = jnp.take_along_axis(v, idx[..., None], axis=2)
                g = g.reshape(b, heads, q, -1, d)
                wmask = (wgt * inb).transpose(0, 2, 1, 3)  # [B, H, Q, P]
                sampled = sampled + g * wmask[..., None].astype(value.dtype)
        out = out + jnp.einsum(
            "bhqpd,bhqp->bhqd", sampled, aw.transpose(0, 2, 1, 3))
    return out.transpose(0, 2, 1, 3).reshape(b, q, heads * d)


class DeformableAttention(nn.Module):
    """HF GroundingDinoMultiscaleDeformableAttention."""

    cfg: GroundingDinoConfig
    num_heads: int
    n_points: int

    @nn.compact
    def __call__(self, hidden_states, encoder_hidden_states,
                 position_embeddings, reference_points, shapes):
        """hidden_states [B, Q, D]; encoder_hidden_states [B, S, D];
        reference_points [B, Q, 2 or 4] (valid-ratio-free)."""
        cfg = self.cfg
        d = cfg.d_model
        levels = len(shapes)
        if position_embeddings is not None:
            hidden_states = hidden_states + position_embeddings
        b, q = hidden_states.shape[:2]
        value = nn.Dense(d, name="value_proj")(encoder_hidden_states)
        value = value.reshape(b, -1, self.num_heads, d // self.num_heads)
        offsets = nn.Dense(self.num_heads * levels * self.n_points * 2,
                           name="sampling_offsets")(hidden_states)
        offsets = offsets.reshape(b, q, self.num_heads, levels,
                                  self.n_points, 2)
        weights = nn.Dense(self.num_heads * levels * self.n_points,
                           name="attention_weights")(hidden_states)
        weights = jax.nn.softmax(
            weights.reshape(b, q, self.num_heads, levels * self.n_points)
            .astype(jnp.float32), axis=-1).astype(hidden_states.dtype)
        weights = weights.reshape(b, q, self.num_heads, levels,
                                  self.n_points)
        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray([[wd, ht] for ht, wd in shapes],
                                     jnp.float32)
            locs = (reference_points[:, :, None, None, None, :]
                    + offsets / normalizer[None, None, None, :, None, :])
        else:
            locs = (reference_points[:, :, None, None, None, :2]
                    + offsets / self.n_points
                    * reference_points[:, :, None, None, None, 2:] * 0.5)
        out = ms_deform_attention(value, shapes, locs, weights)
        return nn.Dense(d, name="output_proj")(out)


# ------------------------------------------------------- encoder layers


class MultiheadAttention(nn.Module):
    """HF GroundingDinoMultiheadAttention (separate q/k/v/out)."""

    d_model: int
    num_heads: int

    @nn.compact
    def __call__(self, queries, keys, values, mask=None):
        d = self.d_model
        hd = d // self.num_heads
        b, tq = queries.shape[:2]
        tk = keys.shape[1]

        def split(y, t):
            return y.reshape(b, t, self.num_heads, hd).transpose(0, 2, 1, 3)

        qh = split(nn.Dense(d, name="query")(queries), tq)
        kh = split(nn.Dense(d, name="key")(keys), tk)
        vh = split(nn.Dense(d, name="value")(values), tk)
        logits = jnp.einsum("bhqc,bhkc->bhqk", qh, kh) / (hd ** 0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", probs.astype(vh.dtype), vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, tq, d)
        return nn.Dense(d, name="out_proj")(out)


class TextEnhancerLayer(nn.Module):
    """Text self-attention sub-layer (HF GroundingDinoTextEnhancerLayer);
    post-LN, half the encoder heads / FFN width."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, text, text_pos, self_attn_mask):
        cfg = self.cfg
        heads = cfg.encoder_attention_heads // 2
        add_mask = None
        if self_attn_mask is not None:   # [B, T, T] bool, True = attend
            add_mask = ((1.0 - self_attn_mask[:, None].astype(jnp.float32))
                        * jnp.finfo(jnp.float32).min)
        qk = text + text_pos
        attn = MultiheadAttention(cfg.d_model, heads, name="self_attn")(
            qk, qk, text, add_mask)
        text = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="layer_norm_before")(text + attn)
        h = nn.Dense(cfg.encoder_ffn_dim // 2, name="fc1")(text)
        h = nn.Dense(cfg.d_model, name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="layer_norm_after")(text + h)


class BiMultiHeadAttention(nn.Module):
    """Bidirectional vision↔text cross-attention (HF
    GroundingDinoBiMultiHeadAttention numerics: shared logits, global
    max-subtraction, ±50000 clamp)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask):
        cfg = self.cfg
        embed = cfg.encoder_ffn_dim // 2
        heads = cfg.encoder_attention_heads // 2
        hd = embed // heads
        b, tv = vision.shape[:2]
        tt = text.shape[1]

        def split(y, t):
            return y.reshape(b, t, heads, hd).transpose(0, 2, 1, 3)

        vq = split(nn.Dense(embed, name="vision_proj")(vision) * hd ** -0.5,
                   tv)
        tk = split(nn.Dense(embed, name="text_proj")(text), tt)
        vv = split(nn.Dense(embed, name="values_vision_proj")(vision), tv)
        tv_ = split(nn.Dense(embed, name="values_text_proj")(text), tt)

        logits = jnp.einsum("bhvc,bhtc->bhvt", vq, tk)
        logits = logits - jnp.max(logits)
        logits = jnp.clip(logits, -50000, 50000)

        logits_t = logits.transpose(0, 1, 3, 2)   # [B, H, T, V]
        logits_t = logits_t - jnp.max(logits_t, axis=-1, keepdims=True)
        logits_t = jnp.clip(logits_t, -50000, 50000)
        # all-valid vision → no mask on the text→vision softmax
        text_attn = jax.nn.softmax(logits_t.astype(jnp.float32), axis=-1)

        if text_pad_mask is not None:   # [B, T] bool, True = padding
            logits = jnp.where(text_pad_mask[:, None, None, :],
                               -jnp.inf, logits)
        vision_attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)

        v_out = jnp.einsum("bhvt,bhtc->bhvc",
                           vision_attn.astype(tv_.dtype), tv_)
        t_out = jnp.einsum("bhtv,bhvc->bhtc",
                           text_attn.astype(vv.dtype), vv)
        v_out = v_out.transpose(0, 2, 1, 3).reshape(b, tv, embed)
        t_out = t_out.transpose(0, 2, 1, 3).reshape(b, tt, embed)
        return (nn.Dense(cfg.d_model, name="out_vision_proj")(v_out),
                nn.Dense(cfg.d_model, name="out_text_proj")(t_out))


class FusionLayer(nn.Module):
    """Pre-LN fusion with layer-scale residuals (HF
    GroundingDinoFusionLayer; drop-path is identity at inference)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, text_pad_mask):
        cfg = self.cfg
        vn = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                          name="layer_norm_vision")(vision)
        tn = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                          name="layer_norm_text")(text)
        dv, dt = BiMultiHeadAttention(cfg, name="attn")(vn, tn,
                                                        text_pad_mask)
        vision_param = self.param("vision_param",
                                  nn.initializers.constant(1e-4),
                                  (cfg.d_model,))
        text_param = self.param("text_param",
                                nn.initializers.constant(1e-4),
                                (cfg.d_model,))
        return vn + vision_param * dv, tn + text_param * dt


class DeformableLayer(nn.Module):
    """Deformable self-attention over the multiscale map + FFN, post-LN
    (HF GroundingDinoDeformableLayer)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, vision_pos, reference_points, shapes):
        cfg = self.cfg
        attn = DeformableAttention(
            cfg, cfg.encoder_attention_heads, cfg.encoder_n_points,
            name="self_attn")(vision, vision, vision_pos,
                              reference_points, shapes)
        vision = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                              name="self_attn_layer_norm")(vision + attn)
        h = nn.Dense(cfg.encoder_ffn_dim, name="fc1")(vision)
        h = nn.Dense(cfg.d_model, name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="final_layer_norm")(vision + h)


class EncoderLayer(nn.Module):
    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, vision, text, vision_pos, text_pos, reference_points,
                 shapes, text_self_mask, text_pad_mask):
        vision, text = FusionLayer(self.cfg, name="fusion_layer")(
            vision, text, text_pad_mask)
        text = TextEnhancerLayer(self.cfg, name="text_enhancer_layer")(
            text, text_pos, text_self_mask)
        vision = DeformableLayer(self.cfg, name="deformable_layer")(
            vision, vision_pos, reference_points, shapes)
        return vision, text


class MLPHead(nn.Module):
    """relu MLP (HF GroundingDinoMLPPredictionHead)."""

    hidden_dim: int
    output_dim: int
    num_layers: int

    @nn.compact
    def __call__(self, x):
        for i in range(self.num_layers - 1):
            x = nn.relu(nn.Dense(self.hidden_dim, name=f"layers_{i}")(x))
        return nn.Dense(self.output_dim,
                        name=f"layers_{self.num_layers - 1}")(x)


class DecoderLayer(nn.Module):
    """self-attn → text cross-attn → deformable vision cross-attn → FFN,
    post-LN (HF GroundingDinoDecoderLayer)."""

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, hidden, query_pos, reference_points, shapes,
                 vision_states, text_states, text_cross_mask):
        cfg = self.cfg
        eps = cfg.layer_norm_eps
        qk = hidden + query_pos
        attn = MultiheadAttention(cfg.d_model, cfg.decoder_attention_heads,
                                  name="self_attn")(qk, qk, hidden)
        hidden = nn.LayerNorm(epsilon=eps, name="self_attn_layer_norm")(
            hidden + attn)
        attn = MultiheadAttention(
            cfg.d_model, cfg.decoder_attention_heads,
            name="encoder_attn_text")(hidden + query_pos, text_states,
                                      text_states, text_cross_mask)
        hidden = nn.LayerNorm(epsilon=eps,
                              name="encoder_attn_text_layer_norm")(
            hidden + attn)
        attn = DeformableAttention(
            cfg, cfg.decoder_attention_heads, cfg.decoder_n_points,
            name="encoder_attn")(hidden, vision_states, query_pos,
                                 reference_points, shapes)
        hidden = nn.LayerNorm(epsilon=eps, name="encoder_attn_layer_norm")(
            hidden + attn)
        h = nn.Dense(cfg.decoder_ffn_dim, name="fc1")(hidden)
        h = nn.Dense(cfg.d_model, name="fc2")(nn.relu(h))
        return nn.LayerNorm(epsilon=eps, name="final_layer_norm")(hidden + h)


def _logit(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, eps, 1 - eps)
    return jnp.log(x / (1 - x))


def contrastive_logits(vision: jnp.ndarray, text: jnp.ndarray,
                       text_token_mask: jnp.ndarray, max_text_len: int
                       ) -> jnp.ndarray:
    """[B, Q, D] × [B, T, D] → [B, Q, max_text_len] (-inf outside valid
    text tokens; HF GroundingDinoContrastiveEmbedding)."""
    out = jnp.einsum("bqd,btd->bqt", vision, text)
    out = jnp.where(text_token_mask[:, None, :], out, -jnp.inf)
    pad = max_text_len - out.shape[-1]
    if pad > 0:
        out = jnp.pad(out, ((0, 0), (0, 0), (0, pad)),
                      constant_values=-jnp.inf)
    return out[..., :max_text_len]


class GroundingDinoForDetection(nn.Module):
    """Full detector: (pixels, tokenized text) → (logits, boxes).

    ``pixels`` [B, S, S, 3] ImageNet-normalized NHWC; text inputs are the
    outputs of :func:`prepare_text_inputs`.  Returns per-query token
    logits [B, Q, max_text_len] and cxcywh boxes [B, Q, 4] in [0, 1].
    """

    cfg: GroundingDinoConfig

    @nn.compact
    def __call__(self, pixels, input_ids, text_self_mask=None,
                 position_ids=None, token_type_ids=None,
                 text_token_mask=None):
        cfg = self.cfg
        shapes = cfg.level_shapes
        b = pixels.shape[0]
        d = cfg.d_model

        if text_token_mask is None:
            text_token_mask = jnp.ones_like(input_ids, dtype=bool)

        # ---- text tower
        text = BertTextEncoder(cfg.bert, name="text_backbone")(
            input_ids, text_self_mask, token_type_ids, position_ids)
        text = nn.Dense(d, name="text_projection")(text)

        # ---- vision tower + input projections
        feats = SwinBackbone(cfg.swin, name="backbone")(pixels)
        maps: List[jnp.ndarray] = []
        for i, f in enumerate(feats):
            x = nn.Conv(d, (1, 1), name=f"input_proj_{i}_conv")(f)
            x = nn.GroupNorm(num_groups=32 if d % 32 == 0 else d,
                             epsilon=1e-5, name=f"input_proj_{i}_norm")(x)
            maps.append(x)
        for i in range(len(feats), cfg.num_feature_levels):
            src = feats[-1] if i == len(feats) else maps[-1]
            x = nn.Conv(d, (3, 3), strides=2, padding=1,
                        name=f"input_proj_{i}_conv")(src)
            x = nn.GroupNorm(num_groups=32 if d % 32 == 0 else d,
                             epsilon=1e-5, name=f"input_proj_{i}_norm")(x)
            maps.append(x)

        level_embed = self.param("level_embed", nn.initializers.normal(1.0),
                                 (cfg.num_feature_levels, d))
        src_flat, pos_flat = [], []
        for lvl, m in enumerate(maps):
            h, w = shapes[lvl]
            src_flat.append(m.reshape(b, h * w, d))
            pos = jnp.asarray(sine_position_2d(
                h, w, d, cfg.positional_embedding_temperature))
            pos_flat.append(pos.reshape(1, h * w, d) + level_embed[lvl])
        vision = jnp.concatenate(src_flat, 1)          # [B, S, D]
        vision_pos = jnp.broadcast_to(
            jnp.concatenate(pos_flat, 1), vision.shape)

        # ---- feature-enhancer encoder
        ref_enc = jnp.asarray(encoder_reference_points(shapes))[None]
        text_pos = get_sine_pos_embed(
            position_ids.astype(jnp.float32)[..., None]
            if position_ids is not None else
            jnp.broadcast_to(jnp.arange(text.shape[1], dtype=jnp.float32),
                             text.shape[:2])[..., None],
            num_pos_feats=d, exchange_xy=False)
        for i in range(cfg.encoder_layers):
            vision, text = EncoderLayer(cfg, name=f"encoder_layers_{i}")(
                vision, text, vision_pos, text_pos, ref_enc, shapes,
                text_self_mask, ~text_token_mask)

        # ---- language-guided query selection (two-stage)
        prop_logits, prop_valid = output_proposals(shapes)
        obj = jnp.where(jnp.asarray(prop_valid)[None, :, None], vision, 0.0)
        obj = nn.Dense(d, name="enc_output")(obj)
        obj = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                           name="enc_output_norm")(obj)
        enc_class = contrastive_logits(obj, text, text_token_mask,
                                       cfg.max_text_len)
        delta = MLPHead(d, 4, 3, name="encoder_output_bbox_embed")(obj)
        enc_coord_logits = delta + jnp.asarray(prop_logits)[None]
        topk_scores = jnp.max(enc_class, axis=-1)      # [B, S]
        _, topk_idx = jax.lax.top_k(topk_scores, cfg.num_queries)
        topk_coords = jnp.take_along_axis(
            enc_coord_logits, topk_idx[..., None], axis=1)
        reference = jax.nn.sigmoid(topk_coords)        # [B, Q, 4]

        query_embeds = self.param("query_position_embeddings",
                                  nn.initializers.normal(0.02),
                                  (cfg.num_queries, d))
        hidden = jnp.broadcast_to(query_embeds[None], (b, cfg.num_queries, d))

        # ---- decoder with iterative box refinement (shared bbox head)
        bbox_head = MLPHead(d, 4, 3, name="bbox_embed")
        ref_head = MLPHead(d, d, 2, name="reference_points_head")
        decoder_norm = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                                    name="decoder_layer_norm")
        text_cross_mask = jnp.where(
            text_token_mask[:, None, None, :], 0.0,
            jnp.finfo(jnp.float32).min)
        intermediate, intermediate_refs = [], [reference]
        for i in range(cfg.decoder_layers):
            query_pos = ref_head(
                get_sine_pos_embed(reference, num_pos_feats=d // 2))
            hidden = DecoderLayer(cfg, name=f"decoder_layers_{i}")(
                hidden, query_pos, reference, shapes, vision, text,
                text_cross_mask)
            delta = bbox_head(hidden)
            reference = jax.nn.sigmoid(delta + _logit(reference))
            intermediate.append(decoder_norm(hidden))
            intermediate_refs.append(reference)

        # ---- detection heads on the last layer (HF outputs_class[-1])
        logits = contrastive_logits(intermediate[-1], text,
                                    text_token_mask, cfg.max_text_len)
        boxes = jax.nn.sigmoid(
            bbox_head(intermediate[-1])
            + _logit(intermediate_refs[-2]))
        return logits, boxes


# -------------------------------------------------- text preprocessing


def prepare_text_inputs(input_ids: np.ndarray):
    """Token ids → (self-attention block mask [B,T,T] True=attend,
    position ids restarting per phrase) — HF
    generate_masks_with_special_tokens_and_transfer_map, host-side."""
    input_ids = np.asarray(input_ids)
    b, t = input_ids.shape
    special = np.isin(input_ids, np.asarray(SPECIAL_TOKEN_IDS))
    mask = np.broadcast_to(np.eye(t, dtype=bool), (b, t, t)).copy()
    position_ids = np.zeros((b, t), np.int64)
    for row in range(b):
        prev = 0
        for col in np.nonzero(special[row])[0]:
            if col == 0 or col == t - 1:
                mask[row, col, col] = True
                position_ids[row, col] = 0
            else:
                mask[row, prev + 1:col + 1, prev + 1:col + 1] = True
                position_ids[row, prev + 1:col + 1] = np.arange(col - prev)
            prev = col
    return mask, position_ids


# ImageNet normalization (HF GroundingDinoImageProcessor)
GDINO_PIXEL_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
GDINO_PIXEL_STD = np.array([0.229, 0.224, 0.225], np.float32)


def preprocess(image01: jnp.ndarray) -> jnp.ndarray:
    return (image01 - GDINO_PIXEL_MEAN) / GDINO_PIXEL_STD


# ------------------------------------------------------------ tokenizer


class WordPieceTokenizer:
    """Minimal BERT-uncased WordPiece tokenizer (vocab.txt) — enough to
    encode detection phrases ("a cat.") the way BertTokenizer does:
    lowercase, punctuation splitting, greedy longest-match ## pieces."""

    def __init__(self, vocab_path: str):
        self.vocab = {}
        with open(vocab_path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                self.vocab[line.rstrip("\n")] = i
        self.cls = self.vocab.get("[CLS]", 101)
        self.sep = self.vocab.get("[SEP]", 102)
        self.unk = self.vocab.get("[UNK]", 100)

    def _basic(self, text: str) -> List[str]:
        out, cur = [], []
        for ch in text.lower():
            if ch.isalnum():
                cur.append(ch)
            else:
                if cur:
                    out.append("".join(cur))
                    cur = []
                if not ch.isspace():
                    out.append(ch)
        if cur:
            out.append("".join(cur))
        return out

    def _wordpiece(self, word: str) -> List[int]:
        pieces, start = [], 0
        while start < len(word):
            end = len(word)
            piece = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    piece = self.vocab[sub]
                    break
                end -= 1
            if piece is None:
                return [self.unk]
            pieces.append(piece)
            start = end
        return pieces

    def encode(self, text: str) -> List[int]:
        ids = [self.cls]
        for tok in self._basic(text):
            ids.extend(self._wordpiece(tok))
        ids.append(self.sep)
        return ids


# ------------------------------------------------------------- backend


class GroundingDinoBackend:
    """DetectorBackend over the ported model: ``(image01, phrase) →
    Detection`` mirroring the reference's ``predict_with_classes`` usage —
    box_threshold 0.3, keep the highest-confidence box
    (``utils/detector.py:5-21``).

    Text inputs pad to ``text_pad_len`` so every phrase reuses one
    compiled program shape.
    """

    BOX_THRESHOLD = 0.3   # utils/detector.py:13
    TEXT_PAD_LEN = 16

    def __init__(self, cfg: GroundingDinoConfig, params, tokenizer,
                 text_pad_len: int | None = None):
        import jax as _jax

        self.cfg = cfg
        self.params = params
        self.tokenizer = tokenizer
        self.pad_len = text_pad_len or self.TEXT_PAD_LEN
        module = GroundingDinoForDetection(cfg)

        def fwd(p, pixels, ids, self_mask, pos_ids, token_mask):
            return module.apply({"params": p}, pixels, ids, self_mask,
                                pos_ids, text_token_mask=token_mask)

        self._fwd = _jax.jit(fwd)

    def _encode_text(self, phrase: str):
        text = phrase.strip().lower()
        if not text.endswith("."):
            text = text + "."
        ids = self.tokenizer.encode(text)[: self.pad_len]
        n = len(ids)
        padded = np.zeros((1, self.pad_len), np.int64)
        padded[0, :n] = ids
        token_mask = np.zeros((1, self.pad_len), bool)
        token_mask[0, :n] = True
        # [PAD]=0 is not a delimiter, so pads attend only to themselves —
        # identical to HF's batched-padding behavior
        self_mask, pos_ids = prepare_text_inputs(padded)
        return padded, self_mask, pos_ids, token_mask, n

    def _resize(self, image01: jnp.ndarray) -> jnp.ndarray:
        from ..ops import geometry as G

        s = self.cfg.image_size
        if image01.shape[0] == s and image01.shape[1] == s:
            return image01
        chw = jnp.transpose(image01, (2, 0, 1))
        return jnp.transpose(G.resize_bilinear(chw, s, s), (1, 2, 0))

    def __call__(self, image01: jnp.ndarray, phrase: str):
        """image01 [H, W, 3] in [0,1] → Detection (normalized xyxy box)."""
        from .detector import Detection

        pixels = preprocess(self._resize(image01))[None]
        ids, self_mask, pos_ids, token_mask, n = self._encode_text(phrase)
        logits, boxes = self._fwd(self.params, pixels, ids, self_mask,
                                  pos_ids, token_mask)
        probs = jax.nn.sigmoid(np.asarray(logits[0], np.float32))
        # score each query by its max prob over the phrase's word tokens
        scores = probs[:, 1:max(n - 1, 1)].max(axis=-1)
        best = int(np.argmax(scores))
        conf = float(scores[best])
        cx, cy, w, h = np.asarray(boxes[0, best], np.float32)
        box = jnp.asarray([cx - w / 2, cy - h / 2, cx + w / 2, cy + h / 2])
        box = jnp.clip(box, 0.0, 1.0)
        return Detection(box=box, confidence=jnp.asarray(conf),
                         ok=jnp.asarray(conf > self.BOX_THRESHOLD))

    def detect_batch(self, images01: jnp.ndarray, phrases):
        """Batched detection: ONE model forward for ``[B, H, W, 3]``
        images with one phrase each → Detection with ``[B, ...]`` leaves.
        Used by the batched character path so a wave costs one GDINO
        program + one host fetch instead of B of each (the reference
        detects characters one by one, ``utils/detector.py:5-21``)."""
        from .detector import Detection

        assert len(phrases) == images01.shape[0], (len(phrases),
                                                   images01.shape)
        pixels = preprocess(jnp.stack([self._resize(im)
                                       for im in images01]))
        enc = [self._encode_text(p) for p in phrases]
        ids = np.concatenate([e[0] for e in enc])
        self_mask = np.concatenate([e[1] for e in enc])
        pos_ids = np.concatenate([e[2] for e in enc])
        token_mask = np.concatenate([e[3] for e in enc])
        ns = np.asarray([e[4] for e in enc])
        logits, boxes = self._fwd(self.params, pixels, ids, self_mask,
                                  pos_ids, token_mask)
        # sigmoid on host: the fetched logits must not round-trip back to
        # the device for scoring (this path exists to cut round trips)
        logits = np.asarray(logits, np.float32)                 # [B,Q,T]
        probs = 1.0 / (1.0 + np.exp(-logits))
        # per-row word-token window: positions 1..n-1 (mask the rest)
        t = probs.shape[-1]
        word = ((np.arange(t)[None] >= 1)
                & (np.arange(t)[None] < np.maximum(ns - 1, 2)[:, None]))
        scores = np.where(word[:, None, :], probs, -np.inf).max(-1)  # [B,Q]
        best = scores.argmax(-1)
        conf = scores[np.arange(len(best)), best].astype(np.float32)
        cxywh = np.asarray(boxes, np.float32)[np.arange(len(best)), best]
        cx, cy, w, h = cxywh.T
        box = np.clip(np.stack([cx - w / 2, cy - h / 2,
                                cx + w / 2, cy + h / 2], -1), 0.0, 1.0)
        return Detection(box=jnp.asarray(box),
                         confidence=jnp.asarray(conf),
                         ok=jnp.asarray(conf > self.BOX_THRESHOLD))

