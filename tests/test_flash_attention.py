"""Flash-attention kernel correctness via the Pallas interpreter (CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.ops import flash_attention as fa


@pytest.fixture(autouse=True)
def interpret_mode():
    fa.INTERPRET = True
    yield
    fa.INTERPRET = False


def _ref(q, k, v):
    return jax.nn.dot_product_attention(q, k, v)


@pytest.mark.parametrize("shape", [
    (1, 1024, 2, 40),     # SD1.5 level-0 head dim
    (2, 1024, 2, 64),
    (1, 2048, 1, 80),
])
def test_flash_matches_reference(shape):
    b, s, h, d = shape
    q = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    assert fa.supported(q, k)
    out = fa.flash_attention(q, k, v, q_block=256, k_block=512)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-3
    )


def test_flash_online_softmax_multiblock_k(monkeypatch):
    """k_block < Sk exercises the cross-block correction path (FLAT off:
    the flat kernel would swallow this shape and skip the online code)."""
    monkeypatch.setattr(fa, "FLAT", False)
    shape = (1, 1024, 1, 64)
    q = jax.random.normal(jax.random.key(0), shape) * 3  # larger logits
    k = jax.random.normal(jax.random.key(1), shape) * 3
    v = jax.random.normal(jax.random.key(2), shape)
    single = fa.flash_attention(q, k, v, q_block=256, k_block=1024)
    multi = fa.flash_attention(q, k, v, q_block=256, k_block=256)
    np.testing.assert_allclose(np.asarray(single), np.asarray(multi),
                               atol=2e-3)
    np.testing.assert_allclose(np.asarray(multi),
                               np.asarray(_ref(q, k, v)), atol=2e-3)


@pytest.mark.parametrize("shape", [
    (1, 1024, 2, 40),
    (2, 1024, 2, 64),
    (1, 2048, 1, 80),
])
def test_flash_flat_matches_online_and_reference(shape, monkeypatch):
    """The flat [B,S,H*Dp] kernel (the production route for self-attn
    shapes) must equal the copy-based online kernel and the XLA
    reference."""
    b, s, h, d = shape
    q = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    assert fa.flat_supported(q, k)
    flat = fa._flash_attention_flat(q, k, v)
    monkeypatch.setattr(fa, "FLAT", False)
    online = fa._flash_attention_impl(q, k, v, 256, 512)
    np.testing.assert_allclose(
        np.asarray(flat), np.asarray(_ref(q, k, v)), atol=2e-3)
    np.testing.assert_allclose(
        np.asarray(flat), np.asarray(online), atol=2e-3)


def test_flash_flat_gate():
    """Flat only where the whole K fits in VMEM with the output layout."""
    z = lambda s, h, d: jnp.zeros((1, s, h, d))
    assert fa.flat_supported(z(4096, 8, 40), z(4096, 8, 40))
    assert fa.flat_supported(z(1024, 8, 80), z(1024, 8, 80))
    # cross-shaped (sq != sk) stays on the online kernel
    assert not fa.flat_supported(z(256, 1, 64), z(1536, 1, 64))
    # 16k SDXL tokens exceed the whole-K budget
    assert not fa.flat_supported(z(16384, 10, 64), z(16384, 10, 64))


def test_flash_q_padding():
    """Sq not a multiple of the q block still yields exact rows."""
    q = jax.random.normal(jax.random.key(0), (1, 1000, 1, 64))
    kv_shape = (1, 1024, 1, 64)
    k = jax.random.normal(jax.random.key(1), kv_shape)
    v = jax.random.normal(jax.random.key(2), kv_shape)
    out = fa.flash_attention(q, k, v, q_block=256, k_block=512)
    assert out.shape == q.shape
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)),
                               atol=2e-3)


def test_supported_gate():
    q = jnp.zeros((1, 64, 2, 40))
    assert not fa.supported(q, jnp.zeros((1, 77, 2, 40)))   # short kv
    assert not fa.supported(q, jnp.zeros((1, 1100, 2, 40)))  # not /512...
    assert fa.supported(jnp.zeros((1, 4096, 8, 40)),
                        jnp.zeros((1, 4096, 8, 40)))


def test_flash_non_multiple_k_block():
    """Sk that is a 512-multiple but not a k_block multiple must still
    attend over ALL keys (code-review regression: trailing-KV drop)."""
    shape_q = (1, 256, 1, 64)
    kv = (1, 1536, 1, 64)   # 1536 % 512 == 0, 1536 % 1024 != 0
    q = jax.random.normal(jax.random.key(0), shape_q)
    k = jax.random.normal(jax.random.key(1), kv)
    v = jax.random.normal(jax.random.key(2), kv)
    assert fa.supported(q, k)
    out = fa.flash_attention(q, k, v, q_block=256, k_block=1024)
    np.testing.assert_allclose(np.asarray(out), np.asarray(_ref(q, k, v)),
                               atol=2e-3)


def test_flash_attention_grad_matches_xla():
    """custom_vjp backward (XLA recompute) ≈ grads of reference attention."""
    shape = (1, 1024, 1, 64)
    q = jax.random.normal(jax.random.key(0), shape)
    k = jax.random.normal(jax.random.key(1), shape)
    v = jax.random.normal(jax.random.key(2), shape)

    def loss_flash(q, k, v):
        return jnp.sum(fa.flash_attention(q, k, v, 256, 512) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-2,
                                   rtol=1e-2)


def test_flash_block_validation():
    q = jax.random.normal(jax.random.key(0), (1, 1024, 1, 64))
    with pytest.raises(ValueError):
        fa.flash_attention(q, q, q, q_block=100)
    with pytest.raises(ValueError):
        fa.flash_attention(q, q, q, k_block=100)


@pytest.mark.parametrize("shape", [
    (1, 1024, 2, 40),     # SD1.5 level-0: unaligned d stays native
    (2, 1024, 2, 64),
    (1, 2048, 1, 80),
])
def test_flash_bshd_native_matches_reference(shape):
    """The BSHD-native path (no transpose/pad copies, 4-D BlockSpecs)
    must match the copy-based path and the XLA reference."""
    b, s, h, d = shape
    q = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    out = fa._flash_attention_bshd(q, k, v, 256, 512)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-3)
    base = fa._flash_attention_impl(q, k, v, 256, 512)
    np.testing.assert_allclose(np.asarray(out), np.asarray(base), atol=2e-3)


def test_flash_bshd_multiblock_k_online_softmax():
    b, s, h, d = 1, 2048, 2, 40
    q = jax.random.normal(jax.random.key(5), (b, 512, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(6), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(7), (b, s, h, d), jnp.float32)
    out = fa._flash_attention_bshd(q, k, v, 256, 512)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(_ref(q, k, v)), atol=2e-3)


def _pack_bshd(x, dp):
    b, s, h, d = x.shape
    return jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, dp - d))).reshape(
        b, s, h * dp)


@pytest.mark.parametrize("shape", [
    (1, 1024, 2, 40),
    (2, 1024, 2, 64),
])
def test_packed_kernel_matches_reference(shape):
    """flash_attention_packed over pre-scaled packed tensors == reference
    attention over the unpacked BSHD tensors; pad lanes exactly zero."""
    b, s, h, d = shape
    dp = fa._pad_head_dim(d)
    q = jax.random.normal(jax.random.key(0), shape, jnp.float32)
    k = jax.random.normal(jax.random.key(1), shape, jnp.float32)
    v = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    assert fa.packed_supported(s, h, d, 4)
    qf = _pack_bshd(q * (d ** -0.5 * fa.LOG2E), dp)
    out = fa.flash_attention_packed(qf, _pack_bshd(k, dp), _pack_bshd(v, dp),
                                    h, d)
    out = np.asarray(out).reshape(b, s, h, dp)
    np.testing.assert_allclose(out[..., :d], np.asarray(_ref(q, k, v)),
                               atol=2e-3)
    assert np.all(out[..., d:] == 0.0)


def test_packed_grad_matches_reference():
    """custom_vjp backward through the packed kernel == grad of the plain
    XLA reference on the unpacked tensors."""
    b, s, h, d = 1, 1024, 2, 40
    dp = fa._pad_head_dim(d)
    q = jax.random.normal(jax.random.key(0), (b, s, h, d), jnp.float32)
    k = jax.random.normal(jax.random.key(1), (b, s, h, d), jnp.float32)
    v = jax.random.normal(jax.random.key(2), (b, s, h, d), jnp.float32)

    def loss_packed(q, k, v):
        qf = _pack_bshd(q * (d ** -0.5 * fa.LOG2E), dp)
        out = fa.flash_attention_packed(
            qf, _pack_bshd(k, dp), _pack_bshd(v, dp), h, d)
        return jnp.sum(out ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_ref(q, k, v) ** 2)

    gp = jax.grad(loss_packed, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=5e-3)


@pytest.mark.parametrize("shape,bq,bk", [
    ((1, 1024, 2, 40), 256, 512),    # 2 K blocks: exercises corrections
    ((2, 1024, 1, 64), 256, 256),    # 4 K blocks
])
def test_flash_flat_online_matches_reference(shape, bq, bk):
    """The online flat kernel (the Sk>4096 / SDXL-16k route) must equal
    the reference and the whole-K flat kernel when forced onto multiple
    K blocks at interpreter-sized shapes."""
    b, s, h, d = shape
    dp = fa._pad_head_dim(d)
    q = jax.random.normal(jax.random.key(0), shape, jnp.float32) * 3
    k = jax.random.normal(jax.random.key(1), shape, jnp.float32) * 3
    v = jax.random.normal(jax.random.key(2), shape, jnp.float32)
    qf = _pack_bshd(q * (d ** -0.5 * fa.LOG2E), dp)
    out = fa._flat_online_call(qf, _pack_bshd(k, dp), _pack_bshd(v, dp),
                               h, dp, bq=bq, bk=bk)
    out = np.asarray(out).reshape(b, s, h, dp)
    np.testing.assert_allclose(out[..., :d], np.asarray(_ref(q, k, v)),
                               atol=2e-3)
    assert np.all(out[..., d:] == 0.0)
    whole = fa._flash_attention_flat(q, k, v)
    np.testing.assert_allclose(out[..., :d], np.asarray(whole), atol=2e-3)


def test_flash_flat_online_gate():
    """Online flat applies exactly where whole-K flat gives up: self-attn
    with 4096 < Sk ≤ MAX_KV_SEQ inside the blocked VMEM budget."""
    z = lambda s, h, d: jnp.zeros((1, s, h, d), jnp.bfloat16)
    # the SDXL 16k shape: rejected by flat, accepted by flat-online
    assert not fa.flat_supported(z(16384, 10, 64), z(16384, 10, 64))
    assert fa.flat_online_supported(z(16384, 10, 64), z(16384, 10, 64))
    # ≤4096 belongs to the whole-K kernel
    assert not fa.flat_online_supported(z(4096, 8, 40), z(4096, 8, 40))
    # cross-shaped stays on the copy-based online kernel
    assert not fa.flat_online_supported(z(8192, 1, 64), z(16384, 1, 64))
    # beyond MAX_KV_SEQ is out
    assert not fa.flat_online_supported(z(65536, 1, 64), z(65536, 1, 64))
    bq, bk = fa._flat_online_blocks(16384, 16384, 10, 64)
    assert bq > 0 and bk > 0 and 16384 % bq == 0 and 16384 % bk == 0


def test_packed_crossattention_matches_standard(monkeypatch):
    """CrossAttention with the packed-projection branch == the standard
    branch on the SAME params; the param tree is identical either way."""
    from theatergen_tpu.models.layers import CrossAttention

    b, s, heads, d = 1, 1024, 2, 40
    c = heads * d
    x = jax.random.normal(jax.random.key(0), (b, s, c), jnp.float32)
    mod = CrossAttention(heads, d, use_flash=True, dtype=jnp.float32)

    monkeypatch.setattr(fa, "PACKED", False)
    params_std = mod.init(jax.random.key(1), x)
    out_std, _ = mod.apply(params_std, x)

    monkeypatch.setattr(fa, "PACKED", True)
    params_packed = mod.init(jax.random.key(1), x)
    assert jax.tree_util.tree_structure(params_std) == \
        jax.tree_util.tree_structure(params_packed)
    for a, b_ in zip(jax.tree_util.tree_leaves(params_std),
                     jax.tree_util.tree_leaves(params_packed)):
        assert a.shape == b_.shape and a.dtype == b_.dtype
    out_packed, _ = mod.apply(params_std, x)
    np.testing.assert_allclose(np.asarray(out_packed), np.asarray(out_std),
                               atol=2e-3)
