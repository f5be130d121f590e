"""Attention kernels: XLA fused path, Pallas flash path, decoupled
IP-attention, and probability-capturing introspection path.

TPU-native redesign of the reference's attention layer
(``ip_adapter/attention_processor.py``):

- ``AttnProcessor`` (reference ``:282-393``) → :func:`multi_head_attention`
  with optional ``return_probs`` (only the handful of guidance ``attn_key``
  layers ever request probabilities — mirroring the reference's dual fast /
  introspection dispatch, ``models/attention_processor.py:400-405``).
- ``IPAttnProcessor`` decoupled image-prompt attention (reference
  ``:396-553``: split context at 77 tokens, separate ``to_k_ip/to_v_ip``,
  ``hidden + scale * ip_hidden``) → :func:`decoupled_attention`, computed as
  two softmax attentions sharing one set of queries.

All inputs are ``[batch, seq, heads, head_dim]`` ("BSHD").  The flash path
is a Pallas TPU kernel (:mod:`.flash_attention`); on non-TPU backends or for
tiny shapes everything routes through the XLA path, which
``jax.nn.dot_product_attention`` lowers to a fused kernel.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _on_tpu() -> bool:
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def xla_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Fused attention via XLA. q/k/v: [B, S, H, D] → [B, Sq, H, D]."""
    return jax.nn.dot_product_attention(q, k, v, mask=mask)


def attention_probs(
    q: jnp.ndarray, k: jnp.ndarray, mask: Optional[jnp.ndarray] = None
) -> jnp.ndarray:
    """Explicit softmax probabilities [B, H, Sq, Sk] (introspection path).

    Compute in float32 regardless of input dtype — the guidance energy
    differentiates through these maps (reference computes attention scores in
    the UNet dtype but the loss in fp32, ``utils/guidance.py:91-148``).
    """
    d = q.shape[-1]
    qf = q.astype(jnp.float32) * (d ** -0.5)
    logits = jnp.einsum("bqhd,bkhd->bhqk", qf, k.astype(jnp.float32))
    if mask is not None:
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    return jax.nn.softmax(logits, axis=-1)


def multi_head_attention(
    q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
    *,
    mask: Optional[jnp.ndarray] = None,
    return_probs: bool = False,
    use_flash: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """Multi-head attention over BSHD tensors.

    Returns ``(out [B, Sq, H, D], probs or None)``.  When ``return_probs``
    the explicit-softmax path is used (probs are needed exactly, reference
    ``models/attention_processor.py:440-481``); it only runs for the few
    small guidance layers so the cost is negligible.
    """
    if return_probs:
        probs = attention_probs(q, k, mask)
        out = jnp.einsum("bhqk,bkhd->bqhd", probs.astype(v.dtype), v)
        return out, probs
    if use_flash and mask is None and _on_tpu():
        # the flash kernel has no mask support — masked calls must take
        # the XLA path
        from . import flash_attention as fa

        if fa.supported(q, k):
            return fa.flash_attention(q, k, v), None
    return xla_attention(q, k, v, mask), None


def decoupled_attention(
    q: jnp.ndarray,
    k_text: jnp.ndarray, v_text: jnp.ndarray,
    k_ip: jnp.ndarray, v_ip: jnp.ndarray,
    ip_scale: jnp.ndarray,
    *,
    return_probs: bool = False,
    use_flash: bool = True,
) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
    """IP-Adapter decoupled cross-attention.

    ``out = Attn(q, k_text, v_text) + ip_scale * Attn(q, k_ip, v_ip)``
    (reference ``ip_adapter/attention_processor.py:466-516``).  ``ip_scale``
    may be a traced scalar so one compiled pipeline serves DB-hit (0.4),
    DB-miss (0.0) and final-pass (0.1) scales
    (reference ``models/pipelines.py:183-199,701``).

    The image branch attends over only ``num_tokens`` (4) keys — a tiny
    einsum the compiler fuses; only the text branch is worth a flash kernel.
    Returned probs are for the *text* branch (guidance only uses text-token
    maps, ``utils/guidance.py:110-120``).
    """
    out_text, probs = multi_head_attention(
        q, k_text, v_text, return_probs=return_probs, use_flash=use_flash
    )
    # ip branch: Sk = num_tokens (tiny) — explicit softmax, fp32 accumulate.
    d = q.shape[-1]
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", q.astype(jnp.float32) * (d ** -0.5),
        k_ip.astype(jnp.float32),
    )
    ip_probs = jax.nn.softmax(logits, axis=-1)
    out_ip = jnp.einsum("bhqk,bkhd->bqhd", ip_probs.astype(v_ip.dtype), v_ip)
    scale = jnp.asarray(ip_scale, out_text.dtype)
    return out_text + scale * out_ip, probs
