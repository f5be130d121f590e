"""Fused single-pass Pallas GroupNorm(+SiLU) for the UNet's norm sites.

GroupNorm is bandwidth-bound: XLA lowers it as a stats reduction pass
(one full activation read) followed by a normalize(+silu) pass (a second
read plus the write) — the per-op profile attributes ~13 ms of the 57 ms
UNet step to these ``convert_reduce``/``add_add`` elementwise fusions
(BENCH_NOTES.md).  This kernel keeps one batch item's activation in VMEM
and does stats + normalize + activation in a single pass: 1 read + 1
write, a third less HBM traffic.

Design notes (TPU/Mosaic):
- SD's 32 groups × (C/32) channels do NOT align with the 128-wide lane
  dim, so per-group reductions are done on the MXU with a ``[C, G]``
  one-hot indicator matmul (sum and sum-of-squares per group in one
  ``dot`` each), and stats are broadcast back to channels with the
  transposed indicator — no sublane/lane reshuffles.
- Stats are computed in fp32 regardless of activation dtype (the
  reference runs fp16 norms; fp32 stats in-register are free here since
  the activation never round-trips HBM in fp32).
- Grid is (B,): one batch item per step.  VMEM need is roughly
  ``2·N·C·itemsize·2 (in+out, double-buffered) + 4·N·C (fp32 temp)``;
  ``supported()`` gates shapes that exceed the scoped-VMEM budget and
  callers fall back to the XLA path.
- Backward: a ``jax.custom_vjp`` recomputes the reference jnp
  implementation's VJP (training takes the same fused forward, the
  backward trades one extra forward recompute for not hand-writing a
  GN gradient kernel).

Replaces (semantics only): torch ``nn.GroupNorm`` + ``F.silu`` pairs in
the reference's diffusers UNet blocks (see
``/root/reference/ip_adapter/unet_2d_blocks_new.py`` ResnetBlock2D usage).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# "0" off | "1" every supported shape | "auto" only shapes where the
# chip A/B showed a win (scripts/bench_groupnorm.py, BENCH_NOTES.md):
# 64²×320 1.33×, 16²×1280 1.23×, but 32²×640 LOSES 0.77× — XLA's fused
# elementwise chains beat the kernel at mid sizes, so "1" regresses
# end-to-end (1.29 vs 1.41 img/s) while gating keeps only the wins.
FUSED_MODE = os.environ.get("THEATERGEN_FUSED_GN", "0")
FUSED = FUSED_MODE in ("1", "auto")
# set True (tests) to run through the Pallas interpreter on CPU
INTERPRET = False


def profitable(shape, num_groups: int = 32) -> bool:
    """Chip-measured win predicate (auto mode): large-spatial low-channel
    (the L0 64² blocks) and small-spatial high-channel (16²/8² at 1280)
    win; the 32² mid shapes lose to XLA's fusions."""
    c = shape[-1]
    n = int(np.prod(shape[1:-1]))
    return n >= 4096 or (c >= 1280 and n <= 256)

_VMEM_LIMIT = 96 * 1024 * 1024
# leave headroom for double buffering + fp32 temporaries
_VMEM_BUDGET = 80 * 1024 * 1024


def supported(shape, dtype, num_groups: int = 32) -> bool:
    """True when (B, N, C) / (B, H, W, C) fits the one-pass kernel."""
    c = shape[-1]
    n = int(np.prod(shape[1:-1]))
    if c % num_groups:
        return False
    if n % 8:  # sublane tiling
        return False
    itemsize = jnp.dtype(dtype).itemsize
    # in + out double-buffered, plus ~2 fp32 activation-sized temporaries
    need = n * c * (4 * itemsize + 8)
    return need <= _VMEM_BUDGET


def _kernel(x_ref, ind_ref, ind_t_ref, sb_ref, o_ref, *, inv_count, eps,
            act):
    # All dots pin fp32 accumulation (preferred_element_type): the fp32
    # stats guarantee must not depend on how Mosaic lowers a bare dot.
    f32 = jnp.float32
    xf = x_ref[0].astype(f32)                              # [N, C]
    ind = ind_ref[...]                                     # [C, G]
    s1 = jnp.dot(jnp.sum(xf, axis=0, keepdims=True), ind,
                 preferred_element_type=f32)               # [1, G]
    mean = s1 * inv_count
    # broadcast group stats back to channels on the MXU (the transposed
    # indicator is a second input — in-kernel transposes are not free)
    mean_c = jnp.dot(mean, ind_t_ref[...],
                     preferred_element_type=f32)           # [1, C]
    # centered variance E[(x-mean)^2] — the E[x^2]-mean^2 form cancels
    # catastrophically when |mean| >> std; the activation is already in
    # VMEM so the second elementwise pass is register-rate, not HBM
    xc = xf - mean_c
    s2 = jnp.dot(jnp.sum(xc * xc, axis=0, keepdims=True), ind,
                 preferred_element_type=f32)               # [1, G]
    inv = jax.lax.rsqrt(s2 * inv_count + eps)
    inv_c = jnp.dot(inv, ind_t_ref[...], preferred_element_type=f32)
    scale = sb_ref[0:1]                                    # [1, C]
    bias = sb_ref[1:2]
    out = xc * (inv_c * scale) + bias
    if act == "silu":
        out = out * jax.nn.sigmoid(out)
    o_ref[0] = out.astype(o_ref.dtype)


def _reference(x, scale, bias, num_groups, eps, act):
    """Plain-jnp GroupNorm(+SiLU), used for the VJP and as fallback."""
    b = x.shape[0]
    c = x.shape[-1]
    xf = x.astype(jnp.float32).reshape(b, -1, num_groups, c // num_groups)
    mean = jnp.mean(xf, axis=(1, 3), keepdims=True)
    var = jnp.var(xf, axis=(1, 3), keepdims=True)
    out = (xf - mean) * jax.lax.rsqrt(var + eps)
    out = out.reshape(x.shape) * scale.astype(jnp.float32) + bias.astype(
        jnp.float32)
    if act == "silu":
        out = jax.nn.silu(out)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _gn_fused(x, scale, bias, num_groups, eps, act):
    b = x.shape[0]
    c = x.shape[-1]
    n = int(np.prod(x.shape[1:-1]))
    x3 = x.reshape(b, n, c)
    g = num_groups
    ind_np = np.eye(g, dtype=np.float32).repeat(c // g, axis=0)   # [C, G]
    ind = jnp.asarray(ind_np)
    ind_t = jnp.asarray(ind_np.T)                                 # [G, C]
    sb = jnp.stack([scale.astype(jnp.float32),
                    bias.astype(jnp.float32)])                    # [2, C]
    out = pl.pallas_call(
        functools.partial(_kernel, inv_count=1.0 / (n * (c // g)),
                          eps=eps, act=act),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((c, g), lambda i: (0, 0)),
            pl.BlockSpec((g, c), lambda i: (0, 0)),
            pl.BlockSpec((2, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, n, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, n, c), x.dtype),
        compiler_params=None if INTERPRET else pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT,
        ),
        interpret=INTERPRET,
    )(x3, ind, ind_t, sb)
    return out.reshape(x.shape)


def _gn_fwd(x, scale, bias, num_groups, eps, act):
    return _gn_fused(x, scale, bias, num_groups, eps, act), (x, scale, bias)


def _gn_bwd(num_groups, eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x, s, b: _reference(x, s, b, num_groups, eps, act),
        x, scale, bias)
    return vjp(g)


_gn_fused.defvjp(_gn_fwd, _gn_bwd)


def fused_group_norm(x, scale, bias, *, num_groups: int = 32,
                     eps: float = 1e-5, act: str | None = None):
    """GroupNorm (optionally + SiLU) over the channel-last axis.

    One Pallas pass when ``supported()`` (TPU, or the interpreter in
    tests); otherwise the jnp reference (which XLA lowers to the usual
    two-pass form).
    """
    from .attention import _on_tpu

    if act not in (None, "silu"):
        raise ValueError(f"unsupported act {act!r}; expected None or 'silu'")

    if ((INTERPRET or _on_tpu()) and x.ndim >= 3
            and supported(x.shape, x.dtype, num_groups)
            and (FUSED_MODE != "auto" or profitable(x.shape, num_groups))):
        return _gn_fused(x, scale, bias, num_groups, eps, act)
    return _reference(x, scale, bias, num_groups, eps, act)
