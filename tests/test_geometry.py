"""Geometry ops vs hand-computed values and reference semantics."""

import jax
import jax.numpy as jnp
import numpy as np

from theatergen_tpu.ops import geometry as G


def test_centered_box_horizontal():
    box = jnp.array([0.1, 0.2, 0.5, 0.8])
    out = np.asarray(G.centered_box(box))
    np.testing.assert_allclose(out, [0.3, 0.2, 0.7, 0.8], atol=1e-6)


def test_centered_box_full():
    box = jnp.array([0.0, 0.0, 0.4, 0.2])
    out = np.asarray(G.centered_box(box, horizontal_only=False))
    np.testing.assert_allclose(out, [0.3, 0.4, 0.7, 0.6], atol=1e-6)


def test_scale_box_shift_invariant_size():
    # reference scale_proportion rounds w/h separately (utils/utils.py:60-63)
    h = w = 64
    b1 = np.asarray(G.scale_box(jnp.array([0.1, 0.1, 0.3, 0.3]), h, w))
    b2 = np.asarray(G.scale_box(jnp.array([0.35, 0.35, 0.55, 0.55]), h, w))
    assert (b1[2] - b1[0]) == (b2[2] - b2[0])
    assert (b1[3] - b1[1]) == (b2[3] - b2[1])


def test_box_mask_matches_slicing():
    m = np.asarray(G.box_mask(jnp.array([0.25, 0.5, 0.75, 1.0]), 8, 8))
    expect = np.zeros((8, 8))
    expect[4:8, 2:6] = 1
    np.testing.assert_array_equal(m, expect)


def test_box_mask_traceable():
    f = jax.jit(lambda b: G.box_mask(b, 16, 16))
    m = np.asarray(f(jnp.array([0.0, 0.0, 0.5, 0.5])))
    assert m.sum() == 64


def test_mask_to_box_and_empty_fallback():
    m = np.zeros((16, 16), np.float32)
    m[3:7, 5:9] = 1
    box = np.asarray(G.mask_to_box(jnp.asarray(m), enlarge_by_one=False))
    np.testing.assert_array_equal(box, [5, 3, 8, 6])
    box_e = np.asarray(G.mask_to_box(jnp.asarray(m)))
    np.testing.assert_array_equal(box_e, [4, 2, 9, 7])
    empty = np.asarray(G.mask_to_box(jnp.zeros((16, 16))))
    np.testing.assert_array_equal(empty, [0, 0, 16, 16])


def test_mask_center():
    m = np.zeros((10, 10), np.float32)
    m[2, 4] = 1
    x, y = G.mask_center(jnp.asarray(m))
    assert float(x) == 4 and float(y) == 2
    x, y = G.mask_center(jnp.asarray(m), normalize=True)
    np.testing.assert_allclose([float(x), float(y)], [0.4, 0.2])


def test_iou():
    a = np.zeros((4, 4)); a[:2] = 1
    bs = np.stack([a, 1 - a, np.ones((4, 4))])
    out = np.asarray(G.iou(jnp.asarray(a), jnp.asarray(bs)))
    np.testing.assert_allclose(out, [1.0, 0.0, 0.5], atol=1e-5)


def test_box_iou():
    a = jnp.array([0.0, 0.0, 0.5, 0.5])
    b = jnp.array([0.25, 0.25, 0.75, 0.75])
    np.testing.assert_allclose(float(G.box_iou(a, b)), 0.0625 / 0.4375, rtol=1e-5)


def test_shift2d_matches_reference_semantics():
    """shift2d must equal the reference slice-assignment shifter
    (utils/utils.py:143-178) for positive and negative offsets."""
    rng = np.random.RandomState(0)
    x = rng.randn(2, 5, 7).astype(np.float32)

    def ref_shift(t, x_off, y_off):
        out = np.zeros_like(t)
        th, tw = t.shape[-2:]
        ow, oh = tw - abs(x_off), th - abs(y_off)
        ys, yd = (0, y_off) if y_off >= 0 else (-y_off, 0)
        xs, xd = (0, x_off) if x_off >= 0 else (-x_off, 0)
        out[..., yd:yd + oh, xd:xd + ow] = t[..., ys:ys + oh, xs:xs + ow]
        return out

    for dy, dx in [(0, 0), (2, 3), (-1, 2), (3, -4), (-2, -2), (10, 0)]:
        got = np.asarray(G.shift2d(jnp.asarray(x), jnp.int32(dy), jnp.int32(dx)))
        np.testing.assert_array_equal(got, ref_shift(x, dx, dy))


def test_shift2d_jit_traced_offsets():
    f = jax.jit(G.shift2d)
    x = jnp.arange(16.0).reshape(4, 4)
    out = np.asarray(f(x, jnp.int32(1), jnp.int32(-1)))
    assert out[0].sum() == 0 and out[:, -1].sum() == 0


def test_downsample_max_and_upsample():
    m = np.zeros((8, 8), np.float32)
    m[0, 0] = 1
    d = np.asarray(G.downsample_max(jnp.asarray(m), 4, 4))
    assert d[0, 0] == 1 and d.sum() == 1
    u = np.asarray(G.upsample_nearest(jnp.asarray(d), 8, 8))
    assert u[:2, :2].sum() == 4


def test_paste_region():
    canvas = jnp.zeros((3, 8, 8))
    patch = jnp.ones((3, 2, 2)) * 5
    mask = jnp.ones((2, 2))
    out = np.asarray(G.paste_region(canvas, patch, jnp.int32(3), jnp.int32(4), mask))
    assert out[:, 3:5, 4:6].sum() == 3 * 4 * 5
    assert out.sum() == 3 * 4 * 5
