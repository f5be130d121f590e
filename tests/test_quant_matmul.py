"""Fused W8A8 Pallas matmul: interpret-mode correctness vs the XLA
reference with identical per-row quantization numerics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.ops import quant_matmul as QM
from theatergen_tpu.ops.quant import quantize_weight


@pytest.fixture(autouse=True)
def _interpret():
    QM.INTERPRET = True
    yield
    QM.INTERPRET = False


@pytest.mark.parametrize("m,k,n", [
    (64, 320, 256),       # attention-projection-ish
    (40, 128, 384),       # m not a block multiple (pad path)
    (128, 256, 130),      # n not a lane multiple (pad path)
])
def test_matches_reference(m, k, n):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(m, k).astype(np.float32) * 0.5, jnp.bfloat16)
    w = rng.randn(k, n).astype(np.float32) * 0.05
    wq, ws = quantize_weight(w)
    wq, ws = jnp.asarray(wq), jnp.asarray(ws)

    got = QM.quant_matmul(x, wq, ws, m_block=32, n_block=128)
    ref = QM.reference_quant_matmul(x, wq, ws)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        atol=1e-2, rtol=1e-2)


def test_close_to_float_matmul():
    """W8A8 with per-row activation scales stays within ~1% of the float
    product at UNet-like magnitudes."""
    rng = np.random.RandomState(1)
    x = rng.randn(64, 320).astype(np.float32)
    w = rng.randn(320, 256).astype(np.float32) * 0.05
    wq, ws = quantize_weight(w)
    got = np.asarray(QM.quant_matmul(
        jnp.asarray(x), jnp.asarray(wq), jnp.asarray(ws),
        m_block=32, n_block=128, out_dtype=jnp.float32))
    exact = x @ w
    denom = np.abs(exact).mean()
    assert np.abs(got - exact).mean() / denom < 0.02


def test_batched_leading_dims():
    rng = np.random.RandomState(2)
    x = jnp.asarray(rng.randn(2, 8, 128).astype(np.float32), jnp.bfloat16)
    w = rng.randn(128, 256).astype(np.float32) * 0.1
    wq, ws = quantize_weight(w)
    out = QM.quant_matmul(x, jnp.asarray(wq), jnp.asarray(ws),
                          m_block=16, n_block=128)
    assert out.shape == (2, 8, 256)
