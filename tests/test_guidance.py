"""Guidance energies: topk-mean, box loss directionality, transfer loss."""

import jax
import jax.numpy as jnp
import numpy as np

from theatergen_tpu.ops import guidance as GD


def test_topk_mean_matches_numpy():
    x = jnp.asarray(np.random.RandomState(0).randn(3, 16).astype(np.float32))
    out = np.asarray(GD.topk_mean(x, jnp.int32(4)))
    expect = np.sort(np.asarray(x), axis=-1)[:, ::-1][:, :4].mean(-1)
    np.testing.assert_allclose(out, expect, rtol=1e-5)


def test_topk_mean_traced_k():
    f = jax.jit(GD.topk_mean)
    x = jnp.arange(8.0)[None]
    np.testing.assert_allclose(np.asarray(f(x, jnp.int32(2))), 6.5)
    np.testing.assert_allclose(np.asarray(f(x, jnp.int32(100))), 3.5)  # clipped


def _attn_with_peak(h=8, w=8, heads=2, T=5, peak_yx=(2, 2), tok=3):
    """Attention concentrated at one pixel for one token."""
    a = np.full((heads, h * w, T), 1e-4, np.float32)
    a[:, peak_yx[0] * w + peak_yx[1], tok] = 1.0
    return jnp.asarray(a)


def test_box_loss_lower_when_attention_in_box():
    boxes_in = jnp.array([[0.0, 0.0, 0.5, 0.5]])     # contains peak (2,2)
    boxes_out = jnp.array([[0.5, 0.5, 1.0, 1.0]])    # doesn't
    attn = _attn_with_peak()
    pos = jnp.array([[3]])
    pv = jnp.array([[True]])
    ov = jnp.array([True])
    loss_in = float(GD.box_ca_loss_single_key(attn, boxes_in, pos, pv, ov))
    loss_out = float(GD.box_ca_loss_single_key(attn, boxes_out, pos, pv, ov))
    assert loss_in < loss_out


def test_box_loss_padded_objects_ignored():
    attn = _attn_with_peak()
    boxes = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.3, 0.3, 0.9, 0.9]])
    pos = jnp.array([[3], [1]])
    pv = jnp.array([[True], [True]])
    loss_two = float(GD.box_ca_loss_single_key(
        attn, boxes, pos, pv, jnp.array([True, True])))
    loss_one = float(GD.box_ca_loss_single_key(
        attn, boxes, pos, pv, jnp.array([True, False])))
    assert loss_two > loss_one  # second object contributes only when valid


def test_ref_transfer_loss_zero_for_identical_maps():
    attn = _attn_with_peak()
    ref = attn[None, :, :, 3]   # [K=1, heads, HW] same map
    boxes = jnp.array([[0.0, 0.0, 1.0, 1.0]])
    loss = float(GD.ref_ca_transfer_loss_single_key(
        attn, ref, boxes, jnp.array([3]), jnp.array([True])))
    assert loss < 1e-5
    # different reference → positive loss
    ref2 = jnp.asarray(np.roll(np.asarray(ref), 5, axis=-1))
    loss2 = float(GD.ref_ca_transfer_loss_single_key(
        attn, ref2, boxes, jnp.array([3]), jnp.array([True])))
    assert loss2 > 0.1


def test_compute_ca_loss_combined_and_differentiable():
    attn = _attn_with_peak()
    boxes = jnp.array([[0.0, 0.0, 0.5, 0.5]])
    pos, pv, ov = jnp.array([[3]]), jnp.array([[True]]), jnp.array([True])

    def loss_fn(a):
        return GD.compute_ca_loss(
            [a], boxes, pos, pv, ov,
            ref_attn_maps=[a[:, :, 3][None]], word_token=jnp.array([3]),
            ref_ca_loss_weight=2.0,
        )

    val, grad = jax.value_and_grad(loss_fn)(attn)
    assert np.isfinite(float(val))
    assert np.isfinite(np.asarray(grad)).all()
    assert np.abs(np.asarray(grad)).max() > 0


def test_attn_collection_to_maps():
    probs = jnp.ones((2, 4, 64, 81)) / 81   # [B(cfg), heads, HW, Lk]
    state = {"mid": {"mid_block_attentions_0": {
        "transformer_blocks_0": {"cross_attn_probs": (probs,)}}}}
    maps = GD.attn_collection_to_maps(
        state, [("mid", 0, 0, 0)], text_len=77
    )
    assert len(maps) == 1
    assert maps[0].shape == (4, 64, 77)
