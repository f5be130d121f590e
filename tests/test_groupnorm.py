"""Fused GroupNorm kernel correctness via the Pallas interpreter (CPU)."""

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.ops import groupnorm as gn


@pytest.fixture(autouse=True)
def interpret_mode():
    gn.INTERPRET = True
    yield
    gn.INTERPRET = False


def _flax_ref(x, scale, bias, groups, act):
    mod = nn.GroupNorm(num_groups=groups, epsilon=1e-5, dtype=jnp.float32)
    out = mod.apply({"params": {"scale": scale, "bias": bias}},
                    x.astype(jnp.float32))
    if act == "silu":
        out = nn.silu(out)
    return out.astype(x.dtype)


@pytest.mark.parametrize("shape,groups", [
    ((2, 8, 8, 320), 32),    # SD1.5 L0 channel count
    ((1, 4, 4, 1280), 32),
    ((2, 16, 256), 32),      # pre-flattened [B, N, C]
])
@pytest.mark.parametrize("act", [None, "silu"])
def test_fused_matches_flax(shape, groups, act):
    c = shape[-1]
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    scale = jax.random.normal(jax.random.key(1), (c,)) * 0.2 + 1.0
    bias = jax.random.normal(jax.random.key(2), (c,)) * 0.1
    assert gn.supported(shape, x.dtype, groups)
    out = gn.fused_group_norm(x, scale, bias, num_groups=groups, act=act)
    ref = _flax_ref(x, scale, bias, groups, act)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_fused_bf16_fp32_stats():
    """bf16 activations still get fp32 statistics (tight tolerance vs the
    fp32-upcast reference, loose enough only for the bf16 output cast)."""
    shape = (2, 8, 8, 320)
    x = jax.random.normal(jax.random.key(0), shape, jnp.bfloat16)
    scale = jnp.ones((320,))
    bias = jnp.zeros((320,))
    out = gn.fused_group_norm(x, scale, bias, num_groups=32, act="silu")
    ref = _flax_ref(x, scale, bias, 32, "silu")
    assert out.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=2e-2)


def test_unsupported_falls_back():
    # spatial size not divisible by the 8-sublane tile -> reference path,
    # still correct (supported() checked for the SAME groups we call with)
    shape = (1, 3, 3, 64)
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    scale, bias = jnp.ones((64,)), jnp.zeros((64,))
    assert not gn.supported(shape, x.dtype, 32)
    out = gn.fused_group_norm(x, scale, bias, num_groups=32)
    ref = _flax_ref(x, scale, bias, 32, None)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_large_offset_numerics():
    """Variance must be computed centered: with |mean| >> std the
    E[x^2]-mean^2 form loses most float32 bits to cancellation.

    The trustworthy oracle is a float64 numpy groupnorm — flax's own
    nn.GroupNorm uses the uncentered form and itself diverges at this
    mean/std ratio, so it cannot be the reference here."""
    shape = (1, 8, 8, 64)
    groups = 32
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 0.01
    x = x + 300.0   # mean/std ratio 3e4: squares cancel to ~1e-4 relative
    scale, bias = jnp.ones((64,)), jnp.zeros((64,))
    out = gn.fused_group_norm(x, scale, bias, num_groups=groups, act="silu")

    x64 = np.asarray(x, np.float64).reshape(1, -1, groups, 64 // groups)
    mean = x64.mean(axis=(1, 3), keepdims=True)
    var = x64.var(axis=(1, 3), keepdims=True)
    ref = ((x64 - mean) / np.sqrt(var + 1e-5)).reshape(shape)
    ref = ref / (1.0 + np.exp(-ref))
    # residual ~3e-3 is fp32 summation of 300-magnitude values (the jnp
    # centered reference shows the same); the uncentered form erred by ~8
    np.testing.assert_allclose(np.asarray(out), ref, atol=5e-3, rtol=5e-3)


def test_bad_act_raises():
    x = jnp.ones((1, 8, 8, 64), jnp.float32)
    ones = jnp.ones((64,))
    with pytest.raises(ValueError, match="swish"):
        gn.fused_group_norm(x, ones, ones, num_groups=32, act="swish")
    from theatergen_tpu.models import layers
    with pytest.raises(ValueError, match="swish"):
        layers.GroupNorm(32, act="swish").init(jax.random.key(0), x)


def test_fused_gradient_matches_reference():
    shape = (1, 8, 8, 64)
    x = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    scale = jnp.ones((64,)) * 1.1
    bias = jnp.zeros((64,)) + 0.05

    def loss_fused(x, s, b):
        return jnp.sum(gn.fused_group_norm(x, s, b, num_groups=32,
                                           act="silu") ** 2)

    def loss_ref(x, s, b):
        return jnp.sum(_flax_ref(x, s, b, 32, "silu") ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2))(x, scale, bias)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   atol=1e-4, rtol=1e-4)


def test_module_param_path_stable(monkeypatch):
    """Flipping the fused flag must not change the param tree (checkpoint
    compatibility for ported weights)."""
    from theatergen_tpu.models import layers

    x = jnp.ones((1, 8, 8, 320), jnp.bfloat16)
    mod = layers.GroupNorm(32, dtype=jnp.bfloat16, act="silu")
    monkeypatch.setattr(gn, "FUSED", False)
    p_off = jax.tree_util.tree_map(
        lambda a: a.shape, mod.init(jax.random.key(0), x))
    monkeypatch.setattr(gn, "FUSED", True)
    p_on = jax.tree_util.tree_map(
        lambda a: a.shape, mod.init(jax.random.key(0), x))
    assert p_off == p_on

    params = mod.init(jax.random.key(0), x)
    monkeypatch.setattr(gn, "FUSED", False)
    ref = mod.apply(params, x)
    monkeypatch.setattr(gn, "FUSED", True)
    out = mod.apply(params, x)
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref, np.float32), atol=2e-2)
