"""Latent composition / alignment / collage ops."""

import jax
import jax.numpy as jnp
import numpy as np

from theatergen_tpu.ops import latents as L


def test_blend_latents_variance_preserving():
    rng = np.random.RandomState(0)
    bg = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    fg = jnp.asarray(rng.randn(1, 8, 8, 4), jnp.float32)
    mask = jnp.ones((8, 8))
    out = L.blend_latents(bg, fg, mask, fg_blending_ratio=0.1)
    expect = bg * np.sqrt(0.9) + fg * np.sqrt(0.1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect), rtol=1e-5)
    # outside mask: untouched
    half = jnp.zeros((8, 8)).at[:4].set(1.0)
    out2 = L.blend_latents(bg, fg, half)
    np.testing.assert_array_equal(np.asarray(out2[:, 4:]), np.asarray(bg[:, 4:]))


def test_input_latents_for_boxes():
    boxes = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.5, 0.5, 1.0, 1.0]])
    per_obj, bg = L.input_latents_for_boxes(
        jax.random.key(0), jax.random.key(1), boxes, 8, 8
    )
    assert per_obj.shape == (2, 1, 8, 8, 4)
    assert bg.shape == (1, 8, 8, 4)
    # outside each box the per-object latents equal bg
    np.testing.assert_allclose(
        np.asarray(per_obj[0][:, 4:, :, :]), np.asarray(bg[:, 4:, :, :]),
        rtol=1e-5,
    )
    # inside the box they differ from bg
    assert np.abs(np.asarray(per_obj[0][:, :4, :4] - bg[:, :4, :4])).max() > 1e-3


def test_compose_trajectories_masks_and_order():
    s, b, h, w, c = 3, 1, 8, 8, 2
    big = np.zeros((h, w), np.float32); big[0:6, 0:6] = 1     # large mask
    small = np.zeros((h, w), np.float32); small[2:4, 2:4] = 1  # inside big
    traj = np.zeros((2, s + 1, b, h, w, c), np.float32)
    traj[0] += 1.0   # big object latents = 1
    traj[1] += 2.0   # small object latents = 2
    bg = np.full((b, h, w, c), -1.0, np.float32)
    composed, fgi = L.compose_trajectories(
        jnp.asarray(traj), jnp.asarray(np.stack([big, small])), jnp.asarray(bg),
        compose_box_to_bg=False,
    )
    composed, fgi = np.asarray(composed), np.asarray(fgi)
    # small (later, smaller) wins inside its mask at steps >= 1
    assert composed[1, 0, 3, 3, 0] == 2.0
    assert composed[1, 0, 5, 5, 0] == 1.0
    assert composed[1, 0, 7, 7, 0] == 0.0      # outside any mask: zeros
    # t=0: bg where unmasked
    assert composed[0, 0, 7, 7, 0] == -1.0
    # foreground index labels: 1-based object ids, smaller on top
    assert fgi[3, 3] == 2 and fgi[5, 5] == 1 and fgi[7, 7] == 0


def test_compose_trajectories_padded_slot_noop():
    h = w = 8
    m = np.zeros((h, w), np.float32); m[0:2, 0:2] = 1
    traj = np.random.RandomState(0).randn(2, 3, 1, h, w, 2).astype(np.float32)
    masks = np.stack([m, np.zeros((h, w), np.float32)])  # slot 1 padded
    bg = np.zeros((1, h, w, 2), np.float32)
    composed, fgi = L.compose_trajectories(
        jnp.asarray(traj), jnp.asarray(masks), jnp.asarray(bg),
        compose_box_to_bg=False,
    )
    assert np.asarray(fgi).max() == 1  # padded slot never labels


def test_align_with_boxes_shifts_mass_center():
    h = w = 16
    mask = np.zeros((h, w), np.float32)
    mask[0:4, 0:4] = 1  # center ~ (1.5, 1.5) px → (0.094, 0.094) norm
    traj = np.broadcast_to(mask, (1, 2, 1, h, w)).astype(np.float32)
    traj = traj[..., None] * np.ones((1, 1, 1, 1, 1, 3), np.float32)
    boxes = jnp.array([[0.5, 0.5, 1.0, 1.0]])  # center (0.75, 0.75)
    new_traj, new_masks, offsets = L.align_with_boxes(
        jnp.asarray(traj), jnp.asarray(mask[None]), boxes, base=8
    )
    cx, cy = np.asarray(offsets[0])
    assert 0.5 < cx < 0.8 and 0.5 < cy < 0.8
    nm = np.asarray(new_masks[0])
    ys, xs = np.where(nm > 0)
    assert ys.mean() > h / 2 and xs.mean() > w / 2  # moved to bottom-right


def test_collage_images_paste():
    k, H, W = 2, 32, 32
    imgs = np.zeros((k, H, W, 3), np.float32)
    masks = np.zeros((k, H, W), np.float32)
    imgs[0, 8:24, 8:24] = 1.0          # white square character
    masks[0, 8:24, 8:24] = 1.0
    boxes = jnp.array([[0.0, 0.0, 0.5, 0.5], [0.0, 0.0, 0.0, 0.0]])
    valid = jnp.array([True, False])
    collage, union = L.collage_images(
        jnp.asarray(imgs), jnp.asarray(masks), boxes, valid
    )
    collage, union = np.asarray(collage), np.asarray(union)
    # character lands inside top-left quadrant
    assert union[:16, :16].sum() > 50
    assert union[20:, 20:].sum() == 0
    assert collage[union > 0.5].mean() > 0.5
    # invalid slot contributed nothing
    assert np.isfinite(collage).all()
