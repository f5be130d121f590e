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


def test_guidance_update_per_step_ref_slicing():
    """4-D [S, K, heads, HW] ref maps are sliced at step_index and give the
    same update as passing that step's 3-D map directly — reference
    timestep-matched attention transfer (utils/guidance.py:220-233)."""
    import dataclasses as dc

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.ops import scheduler as sched_ops
    from theatergen_tpu.pipelines.guidance import (
        GuidanceInputs, guidance_update,
    )

    cfg = tiny_config()
    sched = sched_ops.make_schedule(cfg.scheduler, 4)
    gcfg = cfg.guidance
    S, K, heads, HW = 4, 1, 2, 16

    def energy(lat, t, ctx, gin):
        # depends on the selected ref map — a wrong slice changes the grad
        return jnp.sum(gin.ref_attn_maps[0]) * jnp.sum(lat ** 2) * 1e-3

    refs = (jnp.arange(S * K * heads * HW, dtype=jnp.float32)
            .reshape(S, K, heads, HW)) / (S * K * heads * HW)
    base = GuidanceInputs(
        boxes=jnp.zeros((K, 4)), token_pos=jnp.zeros((K, 2), jnp.int32),
        token_valid=jnp.ones((K, 2), bool), obj_valid=jnp.ones((K,), bool),
        word_token=jnp.zeros((K,), jnp.int32))
    lat = jax.random.normal(jax.random.key(0), (1, 4, 4, 4))
    ctx = jnp.zeros((1, 8, 16))
    for step in (0, 2, 3):
        per_step = dc.replace(base, ref_attn_maps=(refs,))
        sliced = dc.replace(base, ref_attn_maps=(refs[step],))
        out_a, _ = guidance_update(energy, sched, gcfg, lat,
                                   jnp.int32(step), ctx, per_step)
        out_b, _ = guidance_update(energy, sched, gcfg, lat,
                                   jnp.int32(step), ctx, sliced)
        np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b),
                                   rtol=1e-6)
        other = dc.replace(base, ref_attn_maps=(refs[(step + 1) % S],))
        out_c, _ = guidance_update(energy, sched, gcfg, lat,
                                   jnp.int32(step), ctx, other)
        assert np.abs(np.asarray(out_a - out_c)).max() > 0
