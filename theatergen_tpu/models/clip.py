"""CLIP text and vision towers (flax).

The reference uses three CLIP models (SURVEY.md §2.12): the ViT-L/14 text
encoder inside SD1.5, the ViT-H/14 image encoder for IP-Adapter
(``generate.py:61``, ``ip_adapter/ip_adapter.py:78-80``), and ViT-B/32 for
evaluation (``CMIGBench/eval/eval.py:286``).  One parameterized
implementation serves all three via :class:`..config.CLIPTextConfig` /
:class:`..config.CLIPVisionConfig`.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CLIPTextConfig, CLIPVisionConfig
from .layers import get_dtype


class CLIPMLP(nn.Module):
    intermediate: int
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        dim = x.shape[-1]
        h = nn.Dense(self.intermediate, dtype=self.dtype, name="fc1")(x)
        if self.act == "quick_gelu":     # OpenAI CLIP (SD1.5 text encoder)
            h = h * jax.nn.sigmoid(1.702 * h)
        else:                            # OpenCLIP bigG (SDXL encoder 2)
            h = nn.gelu(approximate=False, x=h)
        return nn.Dense(dim, dtype=self.dtype, name="fc2")(h)


class CLIPAttention(nn.Module):
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        b, l, c = x.shape
        hd = c // self.num_heads
        q = nn.Dense(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(c, dtype=self.dtype, name="v_proj")(x)
        shape = (b, l, self.num_heads, hd)
        mask = None
        if causal:
            mask = jnp.tril(jnp.ones((l, l), bool))[None, None]
        out = jax.nn.dot_product_attention(
            q.reshape(shape), k.reshape(shape), v.reshape(shape), mask=mask
        ).reshape(b, l, c)
        return nn.Dense(c, dtype=self.dtype, name="out_proj")(out)


class CLIPEncoderLayer(nn.Module):
    num_heads: int
    intermediate: int
    eps: float
    act: str = "quick_gelu"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, causal: bool = False):
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm1")(x)
        x = x + CLIPAttention(self.num_heads, dtype=self.dtype,
                              name="self_attn")(h, causal=causal)
        h = nn.LayerNorm(epsilon=self.eps, dtype=self.dtype,
                         name="layer_norm2")(x)
        return x + CLIPMLP(self.intermediate, act=self.act, dtype=self.dtype,
                           name="mlp")(h)


class CLIPTextEncoder(nn.Module):
    """Returns (last_hidden_state [B,L,C], pooled [B,C]).

    Pooled output is the final-LN hidden state at each sequence's EOT token
    (highest token id), as in CLIP.
    """

    cfg: CLIPTextConfig

    @nn.compact
    def __call__(self, input_ids: jnp.ndarray,
                 return_penultimate: bool = False):
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        b, l = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=dtype,
                       name="token_embedding")(input_ids)
        pos = self.param(
            "position_embedding",
            nn.initializers.normal(0.01),
            (cfg.max_length, cfg.hidden_size),
        )
        x = tok + pos[None, :l].astype(dtype)
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x   # SDXL conditions on the pre-final layer
            x = CLIPEncoderLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.layer_norm_eps,
                act=cfg.act, dtype=dtype, name=f"layers_{i}",
            )(x, causal=True)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="final_layer_norm")(x)
        eot = jnp.argmax(input_ids, axis=-1)
        pooled = x[jnp.arange(b), eot]
        if cfg.use_text_projection or cfg.projection_dim != cfg.hidden_size:
            pooled = nn.Dense(cfg.projection_dim, use_bias=False, dtype=dtype,
                              name="text_projection")(pooled)
        if return_penultimate:
            return x, pooled, penultimate
        return x, pooled


class CLIPVisionEncoder(nn.Module):
    """Returns (image_embeds [B,proj], pooled [B,C], patch_hidden [B,N+1,C]).

    ``image_embeds`` is the projected CLS feature — what IP-Adapter feeds its
    ImageProjModel (``ip_adapter/ip_adapter.py:147-152``); ``patch_hidden``
    (penultimate-layer tokens) feeds the Resampler for the Plus variants
    (``ip_adapter/ip_adapter.py:284-299`` uses hidden_states[-2]).
    """

    cfg: CLIPVisionConfig

    @nn.compact
    def __call__(self, pixels: jnp.ndarray, return_tokens: bool = False):
        cfg = self.cfg
        dtype = get_dtype(cfg.dtype)
        b = pixels.shape[0]
        n = (cfg.image_size // cfg.patch_size) ** 2
        patches = nn.Conv(
            cfg.hidden_size, (cfg.patch_size, cfg.patch_size),
            strides=cfg.patch_size, use_bias=False, dtype=dtype,
            name="patch_embedding",
        )(pixels.astype(dtype))
        patches = patches.reshape(b, n, cfg.hidden_size)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (cfg.hidden_size,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls.astype(dtype), (b, 1, cfg.hidden_size)),
             patches], axis=1)
        pos = self.param("position_embedding", nn.initializers.normal(0.02),
                         (n + 1, cfg.hidden_size))
        x = x + pos[None].astype(dtype)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                         name="pre_layrnorm")(x)
        penultimate = None
        for i in range(cfg.num_layers):
            if i == cfg.num_layers - 1:
                penultimate = x
            x = CLIPEncoderLayer(
                cfg.num_heads, cfg.intermediate_size, cfg.layer_norm_eps,
                dtype=dtype, name=f"layers_{i}",
            )(x)
        # LayerNorm is per-token, so norming the full sequence leaves the
        # CLS pooled output identical while exposing the post-LN tokens
        # OWL-ViT's detection heads consume (HF image_embedder applies
        # post_layernorm to the whole last_hidden_state)
        normed = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dtype,
                              name="post_layernorm")(x)
        pooled = normed[:, 0]
        embeds = nn.Dense(cfg.projection_dim, use_bias=False, dtype=dtype,
                          name="visual_projection")(pooled)
        if return_tokens:
            return embeds, pooled, penultimate, normed
        return embeds, pooled, penultimate


def clip_similarity(image_embeds: jnp.ndarray, text_embeds: jnp.ndarray,
                    logit_scale: float = 100.0) -> jnp.ndarray:
    """Cosine-similarity logits, the eval metric core
    (``CMIGBench/eval/eval.py:97-228``)."""
    a = image_embeds / jnp.linalg.norm(image_embeds, axis=-1, keepdims=True)
    b = text_embeds / jnp.linalg.norm(text_embeds, axis=-1, keepdims=True)
    return logit_scale * a @ b.T
