"""Shared flax building blocks for the diffusion model zoo.

Everything uses NHWC layout (TPU-native; the reference's torch stack is
NCHW) and bf16-friendly compute with fp32 normalization statistics.
Parameter names deliberately mirror diffusers' module names (``to_q``,
``proj_attn``, ``time_emb_proj`` …) so :mod:`..models.weights` can port
safetensors checkpoints by path mapping.
"""

from __future__ import annotations

import math
import os
from typing import Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# split the transformer-block output from the next consumer's fused
# stats reduce (see BasicTransformerBlock) — chip A/B knob, default off
FF_BARRIER = os.environ.get("THEATERGEN_FF_BARRIER", "0") == "1"

from ..ops import attention as attn_ops
from ..ops import flash_attention as fa_ops
from ..ops import geglu_matmul as gg_ops
from ..ops import groupnorm as gn_ops
from ..ops.quant import QuantDense


def make_dense(quantized: bool, features: int, *, use_bias: bool = True,
               dtype=jnp.float32, name: str):
    """Dense or its W8A8 twin (ops/quant.py) — same param path, so the
    serving tree from ``quantize_params`` drops straight in."""
    if quantized:
        return QuantDense(features, use_bias=use_bias, dtype=dtype, name=name)
    return nn.Dense(features, use_bias=use_bias, dtype=dtype, name=name)


def get_dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32,
            "float16": jnp.float16}[name]


def timestep_embedding(t: jnp.ndarray, dim: int, max_period: int = 10000,
                       flip_sin_to_cos: bool = True,
                       downscale_freq_shift: float = 0.0) -> jnp.ndarray:
    """Sinusoidal timestep embedding, diffusers convention (SD1.5 uses
    flip_sin_to_cos=True, shift=0)."""
    half = dim // 2
    freqs = jnp.exp(
        -math.log(max_period)
        * jnp.arange(half, dtype=jnp.float32)
        / (half - downscale_freq_shift)
    )
    args = t.astype(jnp.float32)[:, None] * freqs[None, :]
    sin, cos = jnp.sin(args), jnp.cos(args)
    emb = jnp.concatenate([cos, sin] if flip_sin_to_cos else [sin, cos], axis=-1)
    if dim % 2 == 1:
        emb = jnp.pad(emb, ((0, 0), (0, 1)))
    return emb


class TimestepEmbedding(nn.Module):
    """MLP on the sinusoidal embedding (diffusers ``TimeEmbedding``)."""

    dim: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(self, emb: jnp.ndarray) -> jnp.ndarray:
        emb = make_dense(self.quantized, self.dim, dtype=self.dtype,
                         name="linear_1")(emb)
        emb = nn.silu(emb)
        return make_dense(self.quantized, self.dim, dtype=self.dtype,
                          name="linear_2")(emb)


class _NormParams(nn.Module):
    """Owns ``scale``/``bias`` under the same child path ("norm") as
    ``nn.GroupNorm`` so the fused-kernel branch is checkpoint-identical."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class GroupNorm(nn.Module):
    """GroupNorm. ``dtype=None`` computes statistics in fp32 (safe default
    for tests); passing bf16 keeps the whole norm in compute dtype — the
    reference runs its UNet normalizations in fp16
    (``generate.py:77-78`` loads everything fp16), and skipping the
    fp32 round-trip saves two full activation passes per norm.

    ``act="silu"`` folds the activation into the norm; with
    ``THEATERGEN_FUSED_GN=1`` supported shapes run the one-pass Pallas
    kernel (ops/groupnorm.py) — stats are fp32 in-register either way."""

    num_groups: int = 32
    eps: float = 1e-5
    dtype: Optional[jnp.dtype] = None
    act: Optional[str] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.act not in (None, "silu"):
            raise ValueError(
                f"unsupported act {self.act!r}; expected None or 'silu'")
        if (gn_ops.FUSED and self.dtype is not None
                and x.dtype == self.dtype and x.ndim >= 3
                and gn_ops.supported(x.shape, x.dtype, self.num_groups)):
            scale, bias = _NormParams(x.shape[-1], name="norm")()
            return gn_ops.fused_group_norm(
                x, scale, bias, num_groups=self.num_groups, eps=self.eps,
                act=self.act)
        if self.dtype is not None and x.dtype == self.dtype:
            out = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                               dtype=self.dtype, name="norm")(x)
        else:
            out = nn.GroupNorm(
                num_groups=self.num_groups, epsilon=self.eps,
                dtype=jnp.float32, name="norm",
            )(x.astype(jnp.float32)).astype(x.dtype)
        if self.act == "silu":
            out = nn.silu(out)
        return out


class ResnetBlock2D(nn.Module):
    """Diffusers ResnetBlock2D: GN → silu → conv → (+temb) → GN → silu → conv
    with 1×1 shortcut on channel change."""

    out_channels: int
    groups: int = 32
    dtype: jnp.dtype = jnp.float32
    fast_norm: bool = False
    quantized: bool = False

    @property
    def _norm_dtype(self):
        return self.dtype if self.fast_norm else None

    @nn.compact
    def __call__(self, x: jnp.ndarray, temb: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        residual = x
        h = GroupNorm(self.groups, dtype=self._norm_dtype, act="silu",
                      name="norm1")(x)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv1")(h)
        if temb is not None:
            t = make_dense(self.quantized, self.out_channels,
                           dtype=self.dtype,
                           name="time_emb_proj")(nn.silu(temb))
            h = h + t[:, None, None, :]
        h = GroupNorm(self.groups, dtype=self._norm_dtype, act="silu",
                      name="norm2")(h)
        h = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=self.dtype,
                    name="conv2")(h)
        if residual.shape[-1] != self.out_channels:
            residual = nn.Conv(self.out_channels, (1, 1), dtype=self.dtype,
                               name="conv_shortcut")(residual)
        return residual + h


class Downsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return nn.Conv(self.channels, (3, 3), strides=2,
                       padding=((1, 1), (1, 1)), dtype=self.dtype,
                       name="conv")(x)


class Upsample2D(nn.Module):
    channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        b, h, w, c = x.shape
        x = jax.image.resize(x, (b, h * 2, w * 2, c), method="nearest")
        return nn.Conv(self.channels, (3, 3), padding=1, dtype=self.dtype,
                       name="conv")(x)


class GEGLU(nn.Module):
    dim_out: int
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    # return the raw [.., 2·dim_out] projection (value‖gate) so the fused
    # GEGLU→net_2 kernel can consume it — same "proj" param path either way
    proj_only: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        h = make_dense(self.quantized, self.dim_out * 2, dtype=self.dtype,
                       name="proj")(x)
        if self.proj_only:
            return h
        h, gate = jnp.split(h, 2, axis=-1)
        return h * nn.gelu(approximate=False, x=gate)


class FeedForward(nn.Module):
    """GEGLU → down projection.  With ``THEATERGEN_FUSED_GEGLU=1`` and a
    Mosaic-tileable shape, the gelu-gate multiply and the ``net_2`` dot
    run as one Pallas kernel (ops/geglu_matmul.py) — the r4c itemization
    found XLA's version of that fusion at ~30% of either peak, the
    biggest per-op gap in both models.  Param tree identical on both
    branches (``_DenseParams`` owns net_2's kernel/bias)."""

    mult: int = 4
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    # full-FF fusion (up-proj + gate + down-proj in one kernel) — a
    # per-MODEL default (``UNetConfig.fused_ff``: SD1.5 True, SDXL
    # False; chip A/Bs r4i/r4j show the same shapes win in one
    # program and lose in the other).  THEATERGEN_FUSED_FF=1/0
    # overrides globally.
    fused_ff: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dim = x.shape[-1]
        m = math.prod(x.shape[:-1])
        if (gg_ops.FUSED_FULL and (gg_ops.FF_FORCE or self.fused_ff)
                and not self.quantized
                and x.dtype == self.dtype
                and gg_ops.ff_supported(m, dim, dim * self.mult, x.dtype)):
            k1, b1 = _GegluParams(dim, dim * self.mult * 2,
                                  name="net_0")()
            k2, b2 = _DenseParams(dim * self.mult, dim,
                                  use_bias=True, name="net_2")()
            out = gg_ops.ff_matmul(x, k1.astype(x.dtype), b1,
                                   k2.astype(x.dtype))
            return out + b2.astype(out.dtype)
        if (gg_ops.FUSED and not self.quantized
                and x.dtype == self.dtype
                and gg_ops.supported(m, dim * self.mult, dim, x.dtype)):
            hg = GEGLU(dim * self.mult, dtype=self.dtype, proj_only=True,
                       name="net_0")(x)
            kernel, bias = _DenseParams(dim * self.mult, dim,
                                        use_bias=True, name="net_2")()
            out = gg_ops.geglu_matmul(hg, kernel.astype(hg.dtype))
            return out + bias.astype(out.dtype)
        h = GEGLU(dim * self.mult, dtype=self.dtype,
                  quantized=self.quantized, name="net_0")(x)
        return make_dense(self.quantized, dim, dtype=self.dtype,
                          name="net_2")(h)


class _GegluParams(nn.Module):
    """Owns the GEGLU projection's kernel/bias under the same
    ``net_0/proj`` path as the ``GEGLU`` module, so the full-FF fused
    branch is param-tree-identical to the standard branches."""

    din: int
    dout2: int

    @nn.compact
    def __call__(self):
        return _DenseParams(self.din, self.dout2, use_bias=True,
                            name="proj")()


class _DenseParams(nn.Module):
    """Owns ``kernel``/``bias`` under the same child path as ``nn.Dense``
    (same init distributions), so the packed-projection attention branch
    is checkpoint- and param-tree-identical to the standard branch."""

    din: int
    dout: int
    use_bias: bool = False

    @nn.compact
    def __call__(self):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.din, self.dout), jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.dout,), jnp.float32)
                if self.use_bias else None)
        return kernel, bias


class CrossAttention(nn.Module):
    """Projection wrapper around the attention kernels.

    With ``ip_tokens > 0`` and a context longer than ``text_len``, the last
    ``ip_tokens`` context entries route through separate ``to_k_ip/to_v_ip``
    projections — the decoupled IP-Adapter attention of the reference
    (``ip_adapter/attention_processor.py:396-553``), here fused at the op
    level (:func:`theatergen_tpu.ops.attention.decoupled_attention`).

    Self-attention (``context is None``) at flash-kernel shapes can run the
    **packed-projection** path (``THEATERGEN_FLASH_PACKED=1``): the lane
    pad to ``Dp``, the ``1/sqrt(d)`` softmax scale, the base-2 conversion
    and the output slice-back are all folded into the projection weights,
    so the QKV/out matmuls read and write the flat ``[B, S, H*Dp]`` kernel
    layout directly — zero elementwise/layout passes around the kernel.
    Exact math (zero pad columns/rows); params identical either way.
    """

    num_heads: int
    head_dim: int
    ip_tokens: int = 0
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,                       # [B, Lq, C]
        context: Optional[jnp.ndarray] = None,  # [B, Lk, Ctx]
        *,
        ip_scale: jnp.ndarray | float = 1.0,
        return_probs: bool = False,
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray]]:
        b, lq, c = x.shape
        inner = self.num_heads * self.head_dim
        ctx = x if context is None else context
        is_ip = self.ip_tokens > 0 and context is not None

        if (fa_ops.PACKED and context is None and self.use_flash
                and not self.quantized and not return_probs
                and (fa_ops.INTERPRET or attn_ops._on_tpu())
                and fa_ops.packed_supported(
                    lq, self.num_heads, self.head_dim,
                    jnp.dtype(self.dtype).itemsize)):
            return self._packed_self_attention(x, c, inner), None

        dense = lambda feats, name: make_dense(
            self.quantized, feats, use_bias=False, dtype=self.dtype, name=name)
        q = dense(inner, "to_q")(x)
        q = q.reshape(b, lq, self.num_heads, self.head_dim)

        if is_ip:
            # context layout: [text tokens ; ip_tokens image tokens]
            # (reference splits at end_pos = L - num_tokens,
            # ip_adapter/attention_processor.py:466-471)
            text_len = ctx.shape[1] - self.ip_tokens
            text_ctx = ctx[:, :text_len]
            ip_ctx = ctx[:, text_len:]
            k = dense(inner, "to_k")(text_ctx)
            v = dense(inner, "to_v")(text_ctx)
            k_ip = dense(inner, "to_k_ip")(ip_ctx)
            v_ip = dense(inner, "to_v_ip")(ip_ctx)
            shape = (b, -1, self.num_heads, self.head_dim)
            out, probs = attn_ops.decoupled_attention(
                q, k.reshape(shape), v.reshape(shape),
                k_ip.reshape(shape), v_ip.reshape(shape), ip_scale,
                return_probs=return_probs, use_flash=self.use_flash,
            )
        else:
            k = dense(inner, "to_k")(ctx)
            v = dense(inner, "to_v")(ctx)
            shape = (b, -1, self.num_heads, self.head_dim)
            out, probs = attn_ops.multi_head_attention(
                q, k.reshape(shape), v.reshape(shape),
                return_probs=return_probs, use_flash=self.use_flash,
            )
        out = out.reshape(b, lq, inner)
        out = make_dense(self.quantized, c, dtype=self.dtype,
                         name="to_out_0")(out)
        return out, probs

    def _packed_self_attention(self, x: jnp.ndarray, c: int,
                               inner: int) -> jnp.ndarray:
        """Self-attention through packed-flat projections (see class doc)."""
        h, d = self.num_heads, self.head_dim
        dp = fa_ops._pad_head_dim(d)

        wq, _ = _DenseParams(c, inner, name="to_q")()
        wk, _ = _DenseParams(c, inner, name="to_k")()
        wv, _ = _DenseParams(c, inner, name="to_v")()
        wo, bo = _DenseParams(inner, c, use_bias=True, name="to_out_0")()

        def pack_cols(w):
            # [c, h*d] -> [c, h*Dp]: each head's d output columns land at
            # its Dp-aligned lane slice, pad columns exactly zero
            w = w.reshape(c, h, d)
            w = jnp.pad(w, ((0, 0), (0, 0), (0, dp - d)))
            return w.reshape(c, h * dp).astype(self.dtype)

        scale = d ** -0.5 * fa_ops.LOG2E   # folded into Wq (fp32)
        qf = x @ pack_cols(wq * scale)
        kf = x @ pack_cols(wk)
        vf = x @ pack_cols(wv)
        of = fa_ops.flash_attention_packed(qf, kf, vf, h, d)
        # [h*d, c] -> [h*Dp, c]: zero rows consume the kernel's zero pad
        # lanes, so no slice-back pass is needed
        wo_p = jnp.pad(wo.reshape(h, d, c),
                       ((0, 0), (0, dp - d), (0, 0))).reshape(h * dp, c)
        return of @ wo_p.astype(self.dtype) + bo.astype(self.dtype)


class GatedSelfAttention(nn.Module):
    """GLIGEN gated self-attention fuser (reference fork
    ``models/attention.py:25-53``): visual tokens self-attend jointly with
    grounding ``objs`` tokens, gated by ``tanh(alpha)`` scalars that are
    zero at init — the fuser is an exact identity until GLIGEN weights
    load."""

    num_heads: int
    head_dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, objs: jnp.ndarray) -> jnp.ndarray:
        n_visual = x.shape[1]
        objs = nn.Dense(x.shape[-1], dtype=self.dtype, name="linear")(objs)
        alpha_attn = self.param("alpha_attn", nn.initializers.zeros, ())
        alpha_dense = self.param("alpha_dense", nn.initializers.zeros, ())
        h, _ = CrossAttention(
            self.num_heads, self.head_dim, use_flash=False,
            dtype=self.dtype, name="attn",
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(
            jnp.concatenate([x, objs], axis=1)))
        x = x + jnp.tanh(alpha_attn) * h[:, :n_visual]
        h = FeedForward(dtype=self.dtype, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x))
        return x + jnp.tanh(alpha_dense) * h


class BasicTransformerBlock(nn.Module):
    """self-attn → cross-attn → FF with pre-LayerNorms (diffusers
    ``BasicTransformerBlock``; reference fork at ``models/attention.py:25-240``
    adds attn-probability capture, provided here via ``return_probs`` +
    ``nn.Module.sow``).  When ``objs`` grounding tokens are given, a GLIGEN
    fuser runs between self- and cross-attention
    (``models/attention.py:152-154,199-203``)."""

    num_heads: int
    head_dim: int
    ip_tokens: int = 0
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32
    quantized: bool = False
    fused_ff: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        *,
        ip_scale: jnp.ndarray | float = 1.0,
        capture_probs: bool = False,
        objs: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        h, _ = CrossAttention(
            self.num_heads, self.head_dim, use_flash=self.use_flash,
            dtype=self.dtype, quantized=self.quantized, name="attn1",
        )(nn.LayerNorm(dtype=self.dtype, name="norm1")(x))
        x = x + h
        if objs is not None:
            x = GatedSelfAttention(self.num_heads, self.head_dim,
                                   dtype=self.dtype, name="fuser")(x, objs)
        h, probs = CrossAttention(
            self.num_heads, self.head_dim, ip_tokens=self.ip_tokens,
            use_flash=self.use_flash, dtype=self.dtype,
            quantized=self.quantized, name="attn2",
        )(
            nn.LayerNorm(dtype=self.dtype, name="norm2")(x), context,
            ip_scale=ip_scale, return_probs=capture_probs,
        )
        if capture_probs and probs is not None:
            # collection "attn": guidance reads cross-attention maps from here
            # (the reference's save_attn_to_dict machinery,
            # models/attention_processor.py:440-481).
            self.sow("attn", "cross_attn_probs", probs,
                     init_fn=lambda: probs, reduce_fn=lambda _, p: p)
        x = x + h
        x = x + FeedForward(dtype=self.dtype, quantized=self.quantized,
                            fused_ff=self.fused_ff, name="ff")(
            nn.LayerNorm(dtype=self.dtype, name="norm3")(x)
        )
        if FF_BARRIER:
            # Keep the next norm's stats reduce OUT of the ff/net_2 dot
            # fusion: XLA's reduce-rooted multi-output fusion constrains
            # the dot's tiling (r4c itemization: those dots run at
            # ~60 TF/s, the single biggest per-op gap in both models).
            # Costs one extra HBM pass of x; A/B'd on chip via
            # THEATERGEN_FF_BARRIER.
            x = jax.lax.optimization_barrier(x)
        return x


class Transformer2D(nn.Module):
    """GN → 1×1 proj_in → transformer blocks over flattened space → proj_out.

    ``attn_key`` identifies this layer for guidance capture, mirroring the
    reference's attn-key stamping (``models/transformer_2d.py:299-304``).
    """

    num_heads: int
    head_dim: int
    depth: int = 1
    ip_tokens: int = 0
    groups: int = 32
    use_flash: bool = True
    dtype: jnp.dtype = jnp.float32
    fast_norm: bool = False
    quantized: bool = False
    fused_ff: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        context: jnp.ndarray,
        *,
        ip_scale: jnp.ndarray | float = 1.0,
        capture_layers: Tuple[int, ...] = (),
        objs: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        b, h, w, c = x.shape
        residual = x
        x = GroupNorm(self.groups,
                      dtype=self.dtype if self.fast_norm else None,
                      name="norm")(x)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_in")(x)
        x = x.reshape(b, h * w, c)
        for i in range(self.depth):
            x = BasicTransformerBlock(
                self.num_heads, self.head_dim, ip_tokens=self.ip_tokens,
                use_flash=self.use_flash, dtype=self.dtype,
                quantized=self.quantized, fused_ff=self.fused_ff,
                name=f"transformer_blocks_{i}",
            )(x, context, ip_scale=ip_scale,
              capture_probs=i in capture_layers, objs=objs)
        x = x.reshape(b, h, w, c)
        x = nn.Conv(c, (1, 1), dtype=self.dtype, name="proj_out")(x)
        return x + residual
