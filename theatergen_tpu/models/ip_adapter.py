"""IP-Adapter conditioning: image-embed projectors and the perceiver
Resampler.

Reference components (SURVEY.md §2.7):
- ``ImageProjModel`` (``ip_adapter/ip_adapter.py:30-47``): linear CLIP-image
  embed → ``num_tokens`` context tokens + LayerNorm.
- ``MLPProjModel`` (``:50-64``): GELU MLP variant (IPAdapterFull).
- ``Resampler`` (``ip_adapter/resampler.py:81-147``): learned latent queries
  attending over CLIP patch tokens, depth × (PerceiverAttention + FF) —
  used by the Plus variants.

The decoupled ``to_k_ip/to_v_ip`` attention weights live inside the UNet
parameters here (``UNetConfig.ip_num_tokens > 0``), not in swap-in processor
objects; :mod:`.weights` splits a reference ``ip-adapter_sd15.bin`` style
checkpoint into the image_proj group (these modules) and the ip_adapter
group (UNet attention leaves), mirroring ``ip_adapter/ip_adapter.py:127-140``.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from ..config import IPAdapterConfig


class ImageProjModel(nn.Module):
    """CLIP image_embeds [B, D_clip] → [B, num_tokens, cross_dim]."""

    cfg: IPAdapterConfig

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(cfg.cross_attention_dim * cfg.num_tokens, name="proj")(
            image_embeds
        )
        x = x.reshape(-1, cfg.num_tokens, cfg.cross_attention_dim)
        return nn.LayerNorm(name="norm")(x)


class MLPProjModel(nn.Module):
    """Per-token GELU MLP projector (IPAdapterFull variant,
    ``ip_adapter/ip_adapter.py:50-64``)."""

    cfg: IPAdapterConfig

    @nn.compact
    def __call__(self, image_embeds: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = nn.Dense(cfg.clip_embeddings_dim, name="proj_0")(image_embeds)
        x = nn.gelu(approximate=False, x=x)
        x = nn.Dense(cfg.cross_attention_dim, name="proj_2")(x)
        x = nn.LayerNorm(name="norm")(x)
        if x.ndim == 2:
            x = x[:, None, :]
        return x


class PerceiverAttention(nn.Module):
    """Latents query [image_feats ; latents] keys/values.

    Matches the reference's dual-sqrt scaling trick
    (``ip_adapter/resampler.py:71-73``): logits are scaled by
    ``1/sqrt(sqrt(d))`` on both q and k for fp16-safe magnitude.
    """

    heads: int
    head_dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, latents: jnp.ndarray) -> jnp.ndarray:
        b, n_lat, dim = latents.shape
        inner = self.heads * self.head_dim
        x = nn.LayerNorm(name="norm1")(x)
        latents_n = nn.LayerNorm(name="norm2")(latents)
        kv_in = jnp.concatenate([x, latents_n], axis=1)
        q = nn.Dense(inner, use_bias=False, name="to_q")(latents_n)
        kv = nn.Dense(inner * 2, use_bias=False, name="to_kv")(kv_in)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(b, -1, self.heads, self.head_dim).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        scale = 1.0 / jnp.sqrt(jnp.sqrt(jnp.float32(self.head_dim)))
        logits = jnp.einsum("bhqd,bhkd->bhqk", q * scale, k * scale)
        probs = nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n_lat, inner)
        return nn.Dense(dim, use_bias=False, name="to_out")(out)


class Resampler(nn.Module):
    """Perceiver resampler over CLIP patch tokens → fixed query tokens."""

    cfg: IPAdapterConfig
    embedding_dim: int = 1280   # CLIP ViT-H hidden size
    output_dim: int = 768

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        b = x.shape[0]
        latents = self.param(
            "latents", nn.initializers.normal(1.0),
            (cfg.resampler_queries, cfg.resampler_dim),
        )
        latents = jnp.broadcast_to(
            latents[None], (b, cfg.resampler_queries, cfg.resampler_dim)
        )
        x = nn.Dense(cfg.resampler_dim, name="proj_in")(x)
        head_dim = cfg.resampler_dim // cfg.resampler_heads
        for i in range(cfg.resampler_depth):
            attn = PerceiverAttention(
                cfg.resampler_heads, head_dim, name=f"layers_{i}_attn"
            )
            latents = latents + attn(x, latents)
            h = nn.LayerNorm(name=f"layers_{i}_ff_norm")(latents)
            h = nn.Dense(cfg.resampler_dim * 4, use_bias=False,
                         name=f"layers_{i}_ff_1")(h)
            h = nn.gelu(approximate=False, x=h)
            h = nn.Dense(cfg.resampler_dim, use_bias=False,
                         name=f"layers_{i}_ff_2")(h)
            latents = latents + h
        out = nn.Dense(self.output_dim, name="proj_out")(latents)
        return nn.LayerNorm(name="norm_out")(out)


class PositionNet(nn.Module):
    """GLIGEN grounding-token projector (the reference fork's
    ``position_net``, ``ip_adapter/unet_2d_condition.py:651,1002-1005``):
    per-object phrase embeddings + Fourier-embedded boxes → ``objs`` tokens
    consumed by the transformer blocks' gated self-attention fusers.

    Masked (padding) objects fall back to learned null features, so a
    fixed ``max_objects`` keeps the jitted shape static.
    """

    out_dim: int
    text_dim: int = 768
    fourier_freqs: int = 8

    @nn.compact
    def __call__(
        self,
        boxes: jnp.ndarray,        # [B, N, 4] normalized xyxy
        masks: jnp.ndarray,        # [B, N] 1 = real object
        phrase_embeds: jnp.ndarray,  # [B, N, text_dim]
    ) -> jnp.ndarray:              # [B, N, out_dim]
        pos_dim = self.fourier_freqs * 2 * 4
        freq = (100.0 ** (jnp.arange(self.fourier_freqs)
                          / self.fourier_freqs))
        ang = boxes[..., None] * freq          # [B, N, 4, F]
        # feature order (freq, sin|cos, coord) — matches GLIGEN's
        # get_fourier_embeds_from_boundingbox permute(0,1,3,4,2), so
        # checkpoint linears_0 rows line up 1:1
        emb = jnp.stack([jnp.sin(ang), jnp.cos(ang)], axis=-1)
        xyxy = jnp.transpose(emb, (0, 1, 3, 4, 2)).reshape(
            *boxes.shape[:2], pos_dim)

        null_pos = self.param("null_position_feature",
                              nn.initializers.zeros, (pos_dim,))
        null_txt = self.param("null_positive_feature",
                              nn.initializers.zeros, (self.text_dim,))
        m = masks[..., None]
        xyxy = xyxy * m + (1 - m) * null_pos
        txt = phrase_embeds * m + (1 - m) * null_txt

        h = jnp.concatenate([txt, xyxy], axis=-1)
        h = nn.silu(nn.Dense(512, name="linears_0")(h))
        h = nn.silu(nn.Dense(512, name="linears_2")(h))
        return nn.Dense(self.out_dim, name="linears_4")(h)
