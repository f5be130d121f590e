"""Checkpoint-faithful BERT text encoder (flax), for GroundingDINO's text
tower (the reference's external GroundingDINO checkout embeds captions with
BERT-base; HF ``BertModel`` is the porting source).

Post-LN transformer with word/position/token-type embeddings (LN eps
1e-12, exact-erf GELU).  Accepts GroundingDINO's 3D block-diagonal
self-attention mask (one block per phrase between special tokens) and
explicit position ids that restart per phrase.  Softmax in fp32.
"""

from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class BertConfig:
    """Mirrors transformers' BertConfig (encoder subset); defaults are
    bert-base-uncased."""

    vocab_size: int = 30522
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12
    pad_token_id: int = 0


def tiny_bert_config() -> BertConfig:
    # vocab must cover the BERT special-token ids (101/102/1012/1029)
    return BertConfig(vocab_size=1100, hidden_size=32, num_layers=2,
                      num_heads=2, intermediate_size=64,
                      max_position_embeddings=64)


class BertSelfAttention(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask) -> jnp.ndarray:
        cfg = self.cfg
        d = cfg.hidden_size
        hd = d // cfg.num_heads
        b, t = x.shape[:2]

        def split(y):
            return y.reshape(b, t, cfg.num_heads, hd).transpose(0, 2, 1, 3)

        q = split(nn.Dense(d, name="query")(x))
        k = split(nn.Dense(d, name="key")(x))
        v = split(nn.Dense(d, name="value")(x))
        logits = jnp.einsum("bhqc,bhkc->bhqk", q, k) / (hd ** 0.5)
        if mask is not None:
            logits = logits + mask
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
        out = jnp.einsum("bhqk,bhkc->bhqc", probs.astype(v.dtype), v)
        return out.transpose(0, 2, 1, 3).reshape(b, t, d)


class BertLayer(nn.Module):
    cfg: BertConfig

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask) -> jnp.ndarray:
        cfg = self.cfg
        h = BertSelfAttention(cfg, name="self")(x, mask)
        h = nn.Dense(cfg.hidden_size, name="attention_output")(h)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="attention_norm")(x + h)
        h = nn.Dense(cfg.intermediate_size, name="intermediate")(x)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(cfg.hidden_size, name="output")(h)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                            name="output_norm")(x + h)


class BertTextEncoder(nn.Module):
    """input_ids [B, T] (+ 3D bool self-attention mask [B, T, T], position
    ids, token-type ids) → last hidden state [B, T, D]."""

    cfg: BertConfig

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        attention_mask: jnp.ndarray | None = None,   # [B,T,T] bool or [B,T]
        token_type_ids: jnp.ndarray | None = None,
        position_ids: jnp.ndarray | None = None,
    ) -> jnp.ndarray:
        cfg = self.cfg
        b, t = input_ids.shape
        word = nn.Embed(cfg.vocab_size, cfg.hidden_size,
                        name="word_embeddings")(input_ids)
        if position_ids is None:
            position_ids = jnp.broadcast_to(jnp.arange(t)[None], (b, t))
        pos = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                       name="position_embeddings")(position_ids)
        if token_type_ids is None:
            token_type_ids = jnp.zeros((b, t), jnp.int32)
        tok = nn.Embed(cfg.type_vocab_size, cfg.hidden_size,
                       name="token_type_embeddings")(token_type_ids)
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps,
                         name="embeddings_norm")(word + pos + tok)

        mask = None
        if attention_mask is not None:
            if attention_mask.ndim == 2:
                add = attention_mask[:, None, None, :]
            else:
                add = attention_mask[:, None, :, :]
            mask = (1.0 - add.astype(jnp.float32)) * jnp.finfo(
                jnp.float32).min
        for i in range(cfg.num_layers):
            x = BertLayer(cfg, name=f"layers_{i}")(x, mask)
        return x
