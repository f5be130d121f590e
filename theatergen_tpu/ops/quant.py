"""int8 quantized-serving primitives.

v5e's MXU doubles throughput at int8 (measured on this chip: bf16 matmul
191 TF/s → int8 347 TOP/s with data-dependent chains; XLA's int8 *convs*
lower poorly, so only matmul layers quantize — attention projections, FFN,
time-embedding; ~40% of UNet FLOPs).  Scheme: static per-output-channel
weight scales + dynamic per-tensor activation scales (the standard W8A8
recipe), with int32 accumulation via ``preferred_element_type``.

``quantize_params`` converts a float param tree in place: each targeted
``{kernel, bias}`` Dense subtree becomes ``{kernel_q (int8), scale
(fp32[out]), bias}`` consumed by :class:`QuantDense`.
"""

from __future__ import annotations

import re
from typing import Any, Dict

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

# Dense layers worth quantizing inside the UNet (matmul-shaped, large K/N).
QUANT_DENSE_PATTERNS = [
    r"(^|.*/)(to_q|to_k|to_v|to_k_ip|to_v_ip|to_out_0)$",
    r"(^|.*/)ff/net_0/proj$",
    r"(^|.*/)ff/net_2$",
    r"(^|.*/)time_emb_proj$",
    r"(^|.*/)time_embedding/linear_[12]$",
]


def is_quant_path(path: str) -> bool:
    return any(re.match(p, path) for p in QUANT_DENSE_PATTERNS)


def quantize_weight(kernel: np.ndarray):
    """fp [in, out] → (int8 [in, out], fp32 scale [out])."""
    k = np.asarray(kernel, np.float32)
    scale = np.abs(k).max(axis=0) / 127.0
    scale = np.maximum(scale, 1e-8)
    q = np.clip(np.round(k / scale[None, :]), -127, 127).astype(np.int8)
    return q, scale.astype(np.float32)


def quantize_params(params: Dict[str, Any]) -> Dict[str, Any]:
    """Float param tree → serving tree with quantized Dense subtrees."""

    def walk(tree, prefix):
        out = {}
        for key, val in tree.items():
            path = f"{prefix}/{key}" if prefix else key
            if isinstance(val, dict):
                if is_quant_path(path) and "kernel" in val:
                    q, scale = quantize_weight(np.asarray(val["kernel"]))
                    new = {"kernel_q": jnp.asarray(q),
                           "scale": jnp.asarray(scale)}
                    if "bias" in val:
                        new["bias"] = val["bias"]
                    out[key] = new
                else:
                    out[key] = walk(val, path)
            else:
                out[key] = val
        return out

    return walk(params, "")


def _use_fused_kernel() -> bool:
    """Opt-in fused Pallas W8A8 (THEATERGEN_FUSED_INT8=1).

    Measured e2e on v5e (BENCH_NOTES.md): 0.97 img/s vs the XLA W8A8
    path's 1.43 — the UNet's small-N projection matmuls are
    bandwidth-bound, so in-kernel quantization adds VPU passes instead of
    buying MXU rate.  Kept for large-K/N serving shapes where it wins."""
    import os

    flag = os.environ.get("THEATERGEN_FUSED_INT8", "0") == "1"
    try:
        # Mosaic-only kernel: TPU backends (incl. the axon tunnel), never
        # CPU/GPU
        return flag and jax.default_backend() in ("tpu", "axon")
    except Exception:
        return False


def int8_matmul(x_q: jnp.ndarray, w_q: jnp.ndarray) -> jnp.ndarray:
    """[..., K] int8 @ [K, N] int8 → int32."""
    return jax.lax.dot_general(
        x_q, w_q, (((x_q.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


class QuantDense(nn.Module):
    """W8A8 Dense: dynamic per-tensor activation quant, static per-channel
    weight scales, int32 accumulation."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_features = x.shape[-1]
        kernel_q = self.param(
            "kernel_q",
            lambda key, shape: jnp.zeros(shape, jnp.int8),
            (in_features, self.features),
        )
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        if _use_fused_kernel():
            from .quant_matmul import quant_matmul

            # fused Pallas path: in-register per-row activation quant
            # (finer than per-tensor), int8 MXU dot, dequant epilogue
            y = quant_matmul(x, kernel_q, scale, out_dtype=jnp.float32)
        else:
            xf = x.astype(jnp.float32)
            a_scale = jnp.maximum(jnp.max(jnp.abs(xf)) / 127.0, 1e-8)
            x_q = jnp.clip(jnp.round(xf / a_scale), -127,
                           127).astype(jnp.int8)
            y = int8_matmul(x_q, kernel_q).astype(jnp.float32)
            y = y * (a_scale * scale)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(self.dtype)
