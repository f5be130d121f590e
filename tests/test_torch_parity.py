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


class TorchTransformer2D(tnn.Module):
    def __init__(self, ch, heads, ctx_dim, groups):
        super().__init__()
        head_dim = ch // heads
        self.norm = tnn.GroupNorm(groups, ch)
        self.proj_in = tnn.Conv2d(ch, ch, 1)
        self.proj_out = tnn.Conv2d(ch, ch, 1)
        blk = tnn.Module()
        blk.norm1 = tnn.LayerNorm(ch)
        blk.attn1 = TorchCrossAttention(ch, ch, heads, head_dim)
        blk.norm2 = tnn.LayerNorm(ch)
        blk.attn2 = TorchCrossAttention(ch, ctx_dim, heads, head_dim)
        blk.norm3 = tnn.LayerNorm(ch)
        blk.ff = TorchFeedForward(ch)
        self.transformer_blocks = tnn.ModuleList([blk])

    def forward(self, x, ctx):
        b, c, h, w = x.shape
        res = x
        y = self.proj_in(self.norm(x))
        y = y.permute(0, 2, 3, 1).reshape(b, h * w, c)
        blk = self.transformer_blocks[0]
        y = y + blk.attn1(blk.norm1(y), blk.norm1(y))
        y = y + blk.attn2(blk.norm2(y), ctx)
        y = y + blk.ff(blk.norm3(y))
        y = y.reshape(b, h, w, c).permute(0, 3, 1, 2)
        return self.proj_out(y) + res


class TorchMiniUNet(tnn.Module):
    """Mirror of the tiny-config UNet with diffusers naming/math."""

    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        groups = cfg.norm_num_groups
        heads = cfg.num_attention_heads
        ctx = cfg.cross_attention_dim
        tdim = chans[0] * cfg.time_embed_mult
        self.cfg = cfg
        self.conv_in = tnn.Conv2d(cfg.in_channels, chans[0], 3, padding=1)
        te = tnn.Module()
        te.linear_1 = tnn.Linear(chans[0], tdim)
        te.linear_2 = tnn.Linear(tdim, tdim)
        self.time_embedding = te
        self.down_blocks = tnn.ModuleList()
        in_ch = chans[0]
        for i, ch in enumerate(chans):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TorchResnetBlock(in_ch if j == 0 else ch, ch, tdim, groups)
                 for j in range(cfg.layers_per_block)])
            if cfg.attention_levels[i]:
                blk.attentions = tnn.ModuleList(
                    [TorchTransformer2D(ch, heads, ctx, groups)
                     for _ in range(cfg.layers_per_block)])
            if i < len(chans) - 1:
                ds = tnn.Module()
                ds.conv = tnn.Conv2d(ch, ch, 3, stride=2, padding=1)
                blk.downsamplers = tnn.ModuleList([ds])
            self.down_blocks.append(blk)
            in_ch = ch
        mid = tnn.Module()
        mid.resnets = tnn.ModuleList(
            [TorchResnetBlock(chans[-1], chans[-1], tdim, groups)
             for _ in range(2)])
        mid.attentions = tnn.ModuleList(
            [TorchTransformer2D(chans[-1], heads, ctx, groups)])
        self.mid_block = mid
        # up blocks: skip channels mirror the down stack
        skip_chs = [chans[0]]
        for i, ch in enumerate(chans):
            skip_chs += [ch] * cfg.layers_per_block
            if i < len(chans) - 1:
                skip_chs.append(ch)
        self.up_blocks = tnn.ModuleList()
        h_ch = chans[-1]
        for idx in range(len(chans)):
            i = len(chans) - 1 - idx
            ch = chans[i]
            blk = tnn.Module()
            resnets = []
            for j in range(cfg.layers_per_block + 1):
                skip = skip_chs.pop()
                resnets.append(
                    TorchResnetBlock(h_ch + skip, ch, tdim, groups))
                h_ch = ch
            blk.resnets = tnn.ModuleList(resnets)
            if cfg.attention_levels[i]:
                blk.attentions = tnn.ModuleList(
                    [TorchTransformer2D(ch, heads, ctx, groups)
                     for _ in range(cfg.layers_per_block + 1)])
            if idx < len(chans) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            self.up_blocks.append(blk)
        self.conv_norm_out = tnn.GroupNorm(groups, chans[0])
        self.conv_out = tnn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, x, t, ctx):
        half = self.cfg.block_out_channels[0] // 2
        freqs = torch.exp(-math.log(10000) *
                          torch.arange(half, dtype=torch.float32) / half)
        args = t.float()[:, None] * freqs[None]
        temb = torch.cat([args.cos(), args.sin()], dim=-1)
        temb = self.time_embedding.linear_2(
            torch.nn.functional.silu(self.time_embedding.linear_1(temb)))

        h = self.conv_in(x)
        skips = [h]
        for i, blk in enumerate(self.down_blocks):
            for j, res in enumerate(blk.resnets):
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
                skips.append(h)
            if hasattr(blk, "downsamplers"):
                h = blk.downsamplers[0].conv(h)
                skips.append(h)
        h = self.mid_block.resnets[0](h, temb)
        h = self.mid_block.attentions[0](h, ctx)
        h = self.mid_block.resnets[1](h, temb)
        for idx, blk in enumerate(self.up_blocks):
            for j, res in enumerate(blk.resnets):
                h = torch.cat([h, skips.pop()], dim=1)
                h = res(h, temb)
                if hasattr(blk, "attentions"):
                    h = blk.attentions[j](h, ctx)
            if hasattr(blk, "upsamplers"):
                h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                    mode="nearest")
                h = blk.upsamplers[0].conv(h)
        h = torch.nn.functional.silu(self.conv_norm_out(h))
        return self.conv_out(h)


def test_full_unet_parity_vs_torch():
    """End-to-end: torch mini-UNet state dict → port_unet → flax UNet
    produces the same epsilon. Validates skip ordering, time embedding,
    up/downsampling, attention plumbing, and the whole name mapping."""
    from theatergen_tpu.models.unet import UNet2DCondition

    ucfg = CFG.unet
    tu = TorchMiniUNet(ucfg).eval()
    sd = {}
    for k, v in tu.state_dict().items():
        k = k.replace("to_out.weight", "to_out.0.weight")
        k = k.replace("to_out.bias", "to_out.0.bias")
        k = k.replace("ff.proj.", "ff.net.0.proj.")
        k = k.replace("ff.out.", "ff.net.2.")
        sd[k] = v.numpy()
    params = W.port_unet(sd)

    unet = UNet2DCondition(ucfg)
    rng = np.random.RandomState(0)
    x = rng.randn(2, 8, 8, 4).astype(np.float32)
    t = np.array([7, 615], np.int64)
    ctx = rng.randn(2, CFG.text.max_length,
                    ucfg.cross_attention_dim).astype(np.float32)
    out_f = unet.apply({"params": params}, jnp.asarray(x),
                       jnp.asarray(t.astype(np.int32)), jnp.asarray(ctx))
    with torch.no_grad():
        out_t = tu(torch.tensor(x).permute(0, 3, 1, 2), torch.tensor(t),
                   torch.tensor(ctx))
    np.testing.assert_allclose(
        np.asarray(out_f), t2n(out_t.permute(0, 2, 3, 1)), atol=5e-5,
        err_msg="full UNet forward diverges from the torch reference")


class TorchCLIPLayer(tnn.Module):
    def __init__(self, dim, heads, inter):
        super().__init__()
        self.layer_norm1 = tnn.LayerNorm(dim)
        self.layer_norm2 = tnn.LayerNorm(dim)
        sa = tnn.Module()
        sa.q_proj = tnn.Linear(dim, dim)
        sa.k_proj = tnn.Linear(dim, dim)
        sa.v_proj = tnn.Linear(dim, dim)
        sa.out_proj = tnn.Linear(dim, dim)
        self.self_attn = sa
        mlp = tnn.Module()
        mlp.fc1 = tnn.Linear(dim, inter)
        mlp.fc2 = tnn.Linear(inter, dim)
        self.mlp = mlp
        self.heads = heads

    def forward(self, x, causal=True):
        b, l, c = x.shape
        hd = c // self.heads
        h = self.layer_norm1(x)
        q = self.self_attn.q_proj(h).view(b, l, self.heads, hd)
        k = self.self_attn.k_proj(h).view(b, l, self.heads, hd)
        v = self.self_attn.v_proj(h).view(b, l, self.heads, hd)
        logits = torch.einsum("bqhd,bkhd->bhqk", q, k) / math.sqrt(hd)
        if causal:
            mask = torch.tril(torch.ones(l, l, dtype=torch.bool))
            logits = logits.masked_fill(~mask, float("-inf"))
        attn = logits.softmax(-1)
        out = torch.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, l, c)
        x = x + self.self_attn.out_proj(out)
        h = self.layer_norm2(x)
        h = self.mlp.fc1(h)
        h = h * torch.sigmoid(1.702 * h)          # quick_gelu
        return x + self.mlp.fc2(h)


class TorchCLIPText(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        emb = tnn.Module()
        emb.token_embedding = tnn.Embedding(cfg.vocab_size, cfg.hidden_size)
        emb.position_embedding = tnn.Embedding(cfg.max_length, cfg.hidden_size)
        self.embeddings = emb
        enc = tnn.Module()
        enc.layers = tnn.ModuleList(
            [TorchCLIPLayer(cfg.hidden_size, cfg.num_heads,
                            cfg.intermediate_size)
             for _ in range(cfg.num_layers)])
        self.encoder = enc
        self.final_layer_norm = tnn.LayerNorm(cfg.hidden_size)

    def forward(self, ids):
        x = (self.embeddings.token_embedding(ids)
             + self.embeddings.position_embedding.weight[None, : ids.shape[1]])
        for layer in self.encoder.layers:
            x = layer(x)
        x = self.final_layer_norm(x)
        pooled = x[torch.arange(x.shape[0]), ids.argmax(-1)]
        return x, pooled


def test_clip_text_parity():
    """HF-convention CLIP text tower → port_clip_text → our encoder."""
    from theatergen_tpu.models.clip import CLIPTextEncoder

    tcfg = CFG.text
    tt = TorchCLIPText(tcfg).eval()
    sd = {}
    for k, v in tt.state_dict().items():
        sd["text_model." + k] = v.numpy()
    params = W.port_clip_text(sd)
    enc = CLIPTextEncoder(tcfg)
    ids = np.array([[1000, 5, 9, 2, 800, 1023, 0, 0,
                     0, 0, 0, 0, 0, 0, 0, 0]], np.int64) % tcfg.vocab_size
    h_f, p_f = enc.apply({"params": params}, jnp.asarray(ids, jnp.int32))
    with torch.no_grad():
        h_t, p_t = tt(torch.tensor(ids))
    np.testing.assert_allclose(np.asarray(h_f), t2n(h_t), atol=3e-5,
                               err_msg="CLIP text hidden mismatch")
    np.testing.assert_allclose(np.asarray(p_f), t2n(p_t), atol=3e-5,
                               err_msg="CLIP text pooled mismatch")


class TorchVAEAttn(tnn.Module):
    def __init__(self, ch, groups):
        super().__init__()
        self.group_norm = tnn.GroupNorm(groups, ch)
        self.to_q = tnn.Linear(ch, ch)
        self.to_k = tnn.Linear(ch, ch)
        self.to_v = tnn.Linear(ch, ch)
        self.to_out = tnn.Linear(ch, ch)

    def forward(self, x):
        b, c, h, w = x.shape
        y = self.group_norm(x).permute(0, 2, 3, 1).reshape(b, h * w, c)
        q, k, v = self.to_q(y), self.to_k(y), self.to_v(y)
        attn = (q @ k.transpose(1, 2)) / math.sqrt(c)
        y = attn.softmax(-1) @ v
        y = self.to_out(y).reshape(b, h, w, c).permute(0, 3, 1, 2)
        return x + y


class TorchVAEDecoder(tnn.Module):
    def __init__(self, cfg):
        super().__init__()
        chans = cfg.block_out_channels
        g = cfg.norm_num_groups
        self.post_quant_conv = tnn.Conv2d(cfg.latent_channels,
                                          cfg.latent_channels, 1)
        self.conv_in = tnn.Conv2d(cfg.latent_channels, chans[-1], 3,
                                  padding=1)
        mid = tnn.Module()
        mid.resnets = tnn.ModuleList(
            [TorchResnetBlockNoTemb(chans[-1], chans[-1], g)
             for _ in range(2)])
        mid.attentions = tnn.ModuleList([TorchVAEAttn(chans[-1], g)])
        self.mid_block = mid
        self.up_blocks = tnn.ModuleList()
        in_ch = chans[-1]
        for idx, ch in enumerate(reversed(chans)):
            blk = tnn.Module()
            blk.resnets = tnn.ModuleList(
                [TorchResnetBlockNoTemb(in_ch if j == 0 else ch, ch, g)
                 for j in range(cfg.layers_per_block + 1)])
            if idx < len(chans) - 1:
                us = tnn.Module()
                us.conv = tnn.Conv2d(ch, ch, 3, padding=1)
                blk.upsamplers = tnn.ModuleList([us])
            self.up_blocks.append(blk)
            in_ch = ch
        self.conv_norm_out = tnn.GroupNorm(g, chans[0])
        self.conv_out = tnn.Conv2d(chans[0], cfg.out_channels, 3, padding=1)

    def forward(self, z):
        h = self.conv_in(self.post_quant_conv(z))
        h = self.mid_block.resnets[0](h, None)
        h = self.mid_block.attentions[0](h)
        h = self.mid_block.resnets[1](h, None)
        for blk in self.up_blocks:
            for res in blk.resnets:
                h = res(h, None)
            if hasattr(blk, "upsamplers"):
                h = torch.nn.functional.interpolate(h, scale_factor=2,
                                                    mode="nearest")
                h = blk.upsamplers[0].conv(h)
        return self.conv_out(
            torch.nn.functional.silu(self.conv_norm_out(h)))


class TorchResnetBlockNoTemb(TorchResnetBlock):
    def __init__(self, in_ch, out_ch, groups):
        super().__init__(in_ch, out_ch, 4, groups)
        del self.time_emb_proj

    def forward(self, x, temb):
        h = torch.nn.functional.silu(self.norm1(x))
        h = self.conv1(h)
        h = torch.nn.functional.silu(self.norm2(h))
        h = self.conv2(h)
        res = x if self.conv_shortcut is None else self.conv_shortcut(x)
        return res + h


def test_vae_decoder_parity():
    from theatergen_tpu.models.vae import AutoencoderKL

    vcfg = CFG.vae
    td = TorchVAEDecoder(vcfg).eval()
    sd = {}
    for k, v in td.state_dict().items():
        k = "decoder." + k if not k.startswith("post_quant_conv") else k
        k = k.replace("to_out.weight", "to_out.0.weight")
        k = k.replace("to_out.bias", "to_out.0.bias")
        sd[k] = v.numpy()
    params = W.port_vae(sd)["decoder"]
    vae = AutoencoderKL(__import__("dataclasses").replace(
        vcfg, dtype="float32"))
    z = np.random.RandomState(0).randn(1, 8, 8,
                                       vcfg.latent_channels).astype(np.float32)
    out_f = vae.apply({"params": {"decoder": params,
                                  "encoder": {}}},
                      jnp.asarray(z), method="decode")
    with torch.no_grad():
        out_t = td(torch.tensor(z).permute(0, 3, 1, 2))
    np.testing.assert_allclose(
        np.asarray(out_f), t2n(out_t.permute(0, 2, 3, 1)), atol=5e-5,
        err_msg="VAE decoder diverges from the torch reference")


class TorchPerceiverResampler(tnn.Module):
    """IP-Adapter-Plus Resampler, written from the published architecture
    (open_flamingo-derived; dual-sqrt logit scaling, kv over [x ; latents],
    bias-free attention/FF linears, pre-LN FF, final proj+LN).  State-dict
    keys match the h94 ``image_proj`` group so port_resampler maps it."""

    def __init__(self, dim, depth, heads, head_dim, queries, emb, out):
        super().__init__()
        inner = heads * head_dim
        self.heads, self.head_dim = heads, head_dim
        self.latents = tnn.Parameter(torch.randn(1, queries, dim))
        self.proj_in = tnn.Linear(emb, dim)
        self.proj_out = tnn.Linear(dim, out)
        self.norm_out = tnn.LayerNorm(out)
        self.layers = tnn.ModuleList()
        for _ in range(depth):
            attn = tnn.Module()
            attn.norm1 = tnn.LayerNorm(dim)
            attn.norm2 = tnn.LayerNorm(dim)
            attn.to_q = tnn.Linear(dim, inner, bias=False)
            attn.to_kv = tnn.Linear(dim, inner * 2, bias=False)
            attn.to_out = tnn.Linear(inner, dim, bias=False)
            ff = tnn.Sequential(
                tnn.LayerNorm(dim),
                tnn.Linear(dim, dim * 4, bias=False),
                tnn.GELU(),
                tnn.Linear(dim * 4, dim, bias=False),
            )
            self.layers.append(tnn.ModuleList([attn, ff]))

    def forward(self, x):
        b = x.shape[0]
        lat = self.latents.expand(b, -1, -1)
        x = self.proj_in(x)
        for attn, ff in self.layers:
            xn, ln = attn.norm1(x), attn.norm2(lat)
            q = attn.to_q(ln)
            kv = attn.to_kv(torch.cat([xn, ln], dim=1))
            k, v = kv.chunk(2, dim=-1)

            def split(t):
                return t.view(b, -1, self.heads,
                              self.head_dim).transpose(1, 2)

            q, k, v = split(q), split(k), split(v)
            scale = 1 / math.sqrt(math.sqrt(self.head_dim))
            w = (q * scale) @ (k * scale).transpose(-2, -1)
            w = torch.softmax(w.float(), dim=-1).to(v.dtype)
            o = (w @ v).transpose(1, 2).reshape(b, lat.shape[1], -1)
            lat = lat + attn.to_out(o)
            lat = lat + ff(lat)
        return self.norm_out(self.proj_out(lat))


def test_resampler_parity():
    from theatergen_tpu.config import IPAdapterConfig
    from theatergen_tpu.models.ip_adapter import Resampler

    cfg = IPAdapterConfig(cross_attention_dim=48, resampler_depth=2,
                          resampler_dim=64, resampler_heads=4,
                          resampler_queries=8)
    tr = TorchPerceiverResampler(dim=64, depth=2, heads=4, head_dim=16,
                                 queries=8, emb=96, out=48).eval()
    sd = {f"image_proj.{k}": v.numpy() for k, v in tr.state_dict().items()}
    params = W.port_resampler(sd)
    res = Resampler(cfg, embedding_dim=96, output_dim=48)
    x = np.random.RandomState(1).randn(2, 11, 96).astype(np.float32)
    out_f = res.apply({"params": params}, jnp.asarray(x))
    with torch.no_grad():
        out_t = tr(torch.tensor(x))
    np.testing.assert_allclose(np.asarray(out_f), t2n(out_t), atol=1e-4,
                               err_msg="Resampler diverges from torch ref")
