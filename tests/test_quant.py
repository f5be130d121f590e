"""int8 W8A8 serving path: layer equivalence + whole-UNet conversion."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from theatergen_tpu.config import tiny_config
from theatergen_tpu.models.unet import UNet2DCondition
from theatergen_tpu.ops import quant as Q


CFG = tiny_config()


def test_quantize_weight_roundtrip():
    rng = np.random.RandomState(0)
    w = rng.randn(64, 32).astype(np.float32)
    q, scale = Q.quantize_weight(w)
    assert q.dtype == np.int8 and scale.shape == (32,)
    deq = q.astype(np.float32) * scale[None]
    # per-channel max error bounded by scale/2
    assert np.abs(deq - w).max() <= scale.max() * 0.51


def test_quant_dense_matches_dense():
    from flax import linen as nn

    rng = np.random.RandomState(1)
    w = rng.randn(48, 24).astype(np.float32) * 0.3
    b = rng.randn(24).astype(np.float32) * 0.1
    x = jnp.asarray(rng.randn(4, 48).astype(np.float32))
    ref = x @ w + b
    q, scale = Q.quantize_weight(w)
    qd = Q.QuantDense(24, dtype=jnp.float32)
    out = qd.apply({"params": {"kernel_q": jnp.asarray(q),
                               "scale": jnp.asarray(scale),
                               "bias": jnp.asarray(b)}}, x)
    err = np.abs(np.asarray(out) - np.asarray(ref))
    rel = err.max() / (np.abs(np.asarray(ref)).max() + 1e-6)
    assert rel < 0.05, rel  # W8A8 error budget


def test_is_quant_path():
    assert Q.is_quant_path("encoder/down_blocks_0_attentions_0/"
                           "transformer_blocks_0/attn1/to_q")
    assert Q.is_quant_path("a/transformer_blocks_0/ff/net_0/proj")
    assert Q.is_quant_path("up_blocks_1_resnets_0/time_emb_proj")
    assert Q.is_quant_path("time_embedding/linear_1")
    assert not Q.is_quant_path("encoder/conv_in")
    assert not Q.is_quant_path("x/norm1/norm")


def test_quantized_unet_close_to_fp():
    """Converted params through the quantized UNet ≈ fp UNet output."""
    unet_fp = UNet2DCondition(CFG.unet)
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4)) * 0.5
    t = jnp.array([500], jnp.int32)
    ctx = jax.random.normal(
        jax.random.key(2), (1, CFG.text.max_length, 32)) * 0.5
    params = unet_fp.init(jax.random.key(0), x, t, ctx)["params"]
    ref = unet_fp.apply({"params": params}, x, t, ctx)

    qcfg = dataclasses.replace(CFG.unet, quantized=True)
    unet_q = UNet2DCondition(qcfg)
    qparams = Q.quantize_params(params)
    out = unet_q.apply({"params": qparams}, x, t, ctx)
    assert out.shape == ref.shape
    # int8 matmuls perturb but must stay strongly correlated
    a = np.asarray(ref).ravel()
    b = np.asarray(out).ravel()
    corr = np.corrcoef(a, b)[0, 1]
    assert corr > 0.99, corr


def test_quantized_param_structure_matches_init():
    """quantize_params output must load into the quantized module's
    expected structure (same paths as its own init)."""
    qcfg = dataclasses.replace(CFG.unet, quantized=True)
    unet_q = UNet2DCondition(qcfg)
    x = jnp.zeros((1, 8, 8, 4))
    t = jnp.zeros((1,), jnp.int32)
    ctx = jnp.zeros((1, CFG.text.max_length, 32))
    q_init = unet_q.init(jax.random.key(0), x, t, ctx)["params"]

    unet_fp = UNet2DCondition(CFG.unet)
    fp = unet_fp.init(jax.random.key(0), x, t, ctx)["params"]
    converted = Q.quantize_params(fp)

    flat_a = {"/".join(str(getattr(k, "key", k)) for k in p)
              for p, _ in jax.tree_util.tree_leaves_with_path(q_init)}
    flat_b = {"/".join(str(getattr(k, "key", k)) for k in p)
              for p, _ in jax.tree_util.tree_leaves_with_path(converted)}
    assert flat_a == flat_b, (sorted(flat_a - flat_b)[:5],
                              sorted(flat_b - flat_a)[:5])
