"""Cross-framework golden tests: torch implementations of the diffusers
block math (written here from the documented conventions), weights ported
through models/weights.py's mapping, outputs compared numerically.

This validates both the architecture math (GroupNorm/silu/attention
conventions, skip ordering) and the checkpoint name/layout mapping — the
closest available substitute for real-checkpoint validation in this
weightless environment (SURVEY §4b).
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn as tnn

from theatergen_tpu.config import tiny_config
from theatergen_tpu.models import weights as W
from theatergen_tpu.models.layers import (
    CrossAttention, FeedForward, ResnetBlock2D, timestep_embedding,
)

torch.manual_seed(0)
CFG = tiny_config()


def t2n(t):
    return t.detach().numpy()


# ------------------------------------------------------------- torch refs

class TorchResnetBlock(tnn.Module):
    """Diffusers ResnetBlock2D math: GN→silu→conv→(+temb)→GN→silu→conv."""

    def __init__(self, in_ch, out_ch, temb_ch, groups):
        super().__init__()
        self.norm1 = tnn.GroupNorm(groups, in_ch)
        self.conv1 = tnn.Conv2d(in_ch, out_ch, 3, padding=1)
        self.time_emb_proj = tnn.Linear(temb_ch, out_ch)
        self.norm2 = tnn.GroupNorm(groups, out_ch)
        self.conv2 = tnn.Conv2d(out_ch, out_ch, 3, padding=1)
        self.conv_shortcut = (tnn.Conv2d(in_ch, out_ch, 1)
                              if in_ch != out_ch else None)

    def forward(self, x, temb):
        h = torch.nn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = h + self.time_emb_proj(
            torch.nn.functional.silu(temb))[:, :, None, None]
        h = torch.nn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return res + h


def test_resnet_block_parity():
    in_ch, out_ch, temb_ch, groups = 8, 16, 12, 4
    tb = TorchResnetBlock(in_ch, out_ch, temb_ch, groups).eval()
    sd = {f"{k}": v.numpy() for k, v in tb.state_dict().items()}
    # port through the resnet mapping
    params = {}
    for name, w in sd.items():
        r = W._map_resnet(name)
        assert r is not None, name
        W.set_path(params, r[0], W._convert_leaf(name, w, r[1]))

    fb = ResnetBlock2D(out_ch, groups=groups, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(2, 6, 6, in_ch).astype(np.float32)
    temb = np.random.RandomState(1).randn(2, temb_ch).astype(np.float32)
    out_f = fb.apply({"params": params}, jnp.asarray(x), jnp.asarray(temb))
    with torch.no_grad():
        out_t = tb(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(temb))
    np.testing.assert_allclose(
        np.asarray(out_f), t2n(out_t.permute(0, 2, 3, 1)), atol=2e-5,
        err_msg="ResnetBlock2D math/mapping mismatch")


class TorchCrossAttention(tnn.Module):
    """Diffusers Attention: no-bias qkv, bias out, scale 1/sqrt(d)."""

    def __init__(self, dim, ctx_dim, heads, head_dim):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.to_q = tnn.Linear(dim, inner, bias=False)
        self.to_k = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_v = tnn.Linear(ctx_dim, inner, bias=False)
        self.to_out = tnn.Linear(inner, dim)

    def forward(self, x, ctx):
        b, l, _ = x.shape
        q = self.to_q(x).view(b, l, self.heads, self.head_dim)
        k = self.to_k(ctx).view(b, -1, self.heads, self.head_dim)
        v = self.to_v(ctx).view(b, -1, self.heads, self.head_dim)
        attn = torch.einsum("blhd,bkhd->bhlk", q, k) / math.sqrt(self.head_dim)
        attn = attn.softmax(-1)
        out = torch.einsum("bhlk,bkhd->blhd", attn, v).reshape(b, l, -1)
        return self.to_out(out)


def test_cross_attention_parity():
    dim, ctx_dim, heads, head_dim = 16, 12, 2, 8
    ta = TorchCrossAttention(dim, ctx_dim, heads, head_dim).eval()
    params = {
        "to_q": {"kernel": W.dense_kernel(t2n(ta.to_q.weight))},
        "to_k": {"kernel": W.dense_kernel(t2n(ta.to_k.weight))},
        "to_v": {"kernel": W.dense_kernel(t2n(ta.to_v.weight))},
        "to_out_0": {"kernel": W.dense_kernel(t2n(ta.to_out.weight)),
                     "bias": t2n(ta.to_out.bias)},
    }
    fa = CrossAttention(heads, head_dim, use_flash=False, dtype=jnp.float32)
    x = np.random.RandomState(0).randn(2, 5, dim).astype(np.float32)
    ctx = np.random.RandomState(1).randn(2, 7, ctx_dim).astype(np.float32)
    out_f, _ = fa.apply({"params": params}, jnp.asarray(x), jnp.asarray(ctx))
    with torch.no_grad():
        out_t = ta(torch.tensor(x), torch.tensor(ctx))
    np.testing.assert_allclose(np.asarray(out_f), t2n(out_t), atol=2e-5,
                               err_msg="CrossAttention math mismatch")


class TorchFeedForward(tnn.Module):
    """Diffusers FeedForward with GEGLU: proj → chunk → x*gelu(gate) → out."""

    def __init__(self, dim, mult=4):
        super().__init__()
        self.proj = tnn.Linear(dim, dim * mult * 2)
        self.out = tnn.Linear(dim * mult, dim)

    def forward(self, x):
        h, gate = self.proj(x).chunk(2, dim=-1)
        return self.out(h * torch.nn.functional.gelu(gate))


def test_feedforward_geglu_parity():
    dim = 12
    tf = TorchFeedForward(dim).eval()
    params = {
        "net_0": {"proj": {"kernel": W.dense_kernel(t2n(tf.proj.weight)),
                           "bias": t2n(tf.proj.bias)}},
        "net_2": {"kernel": W.dense_kernel(t2n(tf.out.weight)),
                  "bias": t2n(tf.out.bias)},
    }
    ff = FeedForward(dtype=jnp.float32)
    x = np.random.RandomState(0).randn(2, 5, dim).astype(np.float32)
    out_f = ff.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tf(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(out_f), t2n(out_t), atol=2e-5,
                               err_msg="GEGLU FF mismatch")


def test_timestep_embedding_parity():
    """Against diffusers' Timesteps math (flip_sin_to_cos=True, shift=0)."""

    def torch_timesteps(t, dim):
        half = dim // 2
        exponent = -math.log(10000) * torch.arange(half, dtype=torch.float32)
        exponent = exponent / half
        emb = t[:, None].float() * exponent.exp()[None]
        return torch.cat([emb.cos(), emb.sin()], dim=-1)

    t = torch.tensor([0, 1, 500, 999])
    ours = timestep_embedding(jnp.asarray(t.numpy()), 32)
    ref = torch_timesteps(t, 32)
    np.testing.assert_allclose(np.asarray(ours), t2n(ref), atol=1e-5)


def test_group_norm_convention():
    """Flax GroupNorm groups channels the same way torch does (contiguous
    channel groups) — a silent-permutation hazard for ported weights."""
    groups, ch = 4, 16
    x = np.random.RandomState(0).randn(2, 6, 6, ch).astype(np.float32)
    gamma = np.random.RandomState(1).rand(ch).astype(np.float32) + 0.5
    beta = np.random.RandomState(2).randn(ch).astype(np.float32)

    import flax.linen as nn

    f = nn.GroupNorm(num_groups=groups)
    out_f = f.apply(
        {"params": {"scale": jnp.asarray(gamma), "bias": jnp.asarray(beta)}},
        jnp.asarray(x))

    tg = tnn.GroupNorm(groups, ch)
    with torch.no_grad():
        tg.weight.copy_(torch.tensor(gamma))
        tg.bias.copy_(torch.tensor(beta))
        out_t = tg(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out_f), t2n(out_t.permute(0, 2, 3, 1)), atol=2e-5)


def test_conv_port_layout():
    """Torch Conv2d ported through conv_kernel must equal flax Conv."""
    import flax.linen as nn

    tc = tnn.Conv2d(6, 8, 3, padding=1).eval()
    x = np.random.RandomState(0).randn(1, 5, 5, 6).astype(np.float32)
    params = {"kernel": W.conv_kernel(t2n(tc.weight)), "bias": t2n(tc.bias)}
    fc = nn.Conv(8, (3, 3), padding=1)
    out_f = fc.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tc(torch.tensor(x).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out_f), t2n(out_t.permute(0, 2, 3, 1)), atol=2e-5)
