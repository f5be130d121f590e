"""Model architecture tests on the tiny config (random weights)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.models.clip import CLIPTextEncoder, CLIPVisionEncoder
from theatergen_tpu.models.unet import UNet2DCondition
from theatergen_tpu.models.vae import AutoencoderKL


CFG = tiny_config()


@pytest.fixture(scope="module")
def unet_and_params():
    unet = UNet2DCondition(CFG.unet)
    params = unet.init(
        jax.random.key(0),
        jnp.zeros((1, 8, 8, 4)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, CFG.text.max_length, CFG.unet.cross_attention_dim)),
    )["params"]
    return unet, params


def test_unet_output_shape_and_determinism(unet_and_params):
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    t = jnp.array([10, 500], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (2, CFG.text.max_length, 32))
    out1 = unet.apply({"params": params}, x, t, ctx)
    out2 = unet.apply({"params": params}, x, t, ctx)
    assert out1.shape == (2, 8, 8, 4)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.isfinite(np.asarray(out1)).all()


def test_unet_timestep_sensitivity(unet_and_params):
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, CFG.text.max_length, 32))
    o1 = unet.apply({"params": params}, x, jnp.array([10]), ctx)
    o2 = unet.apply({"params": params}, x, jnp.array([900]), ctx)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6


def test_unet_context_sensitivity(unet_and_params):
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    c1 = jax.random.normal(jax.random.key(2), (1, CFG.text.max_length, 32))
    c2 = jax.random.normal(jax.random.key(3), (1, CFG.text.max_length, 32))
    o1 = unet.apply({"params": params}, x, jnp.array([10]), c1)
    o2 = unet.apply({"params": params}, x, jnp.array([10]), c2)
    assert np.abs(np.asarray(o1 - o2)).max() > 1e-6


def test_unet_attention_capture(unet_and_params):
    """capture_keys → sown cross-attention maps in the 'attn' collection,
    keyed by module path (the reference's save_attn_to_dict machinery,
    models/attention_processor.py:440-481)."""
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, CFG.text.max_length, 32))
    keys = (("mid", 0, 0, 0), ("up", 1, 0, 0))
    out, state = unet.apply(
        {"params": params}, x, jnp.array([10]), ctx,
        capture_keys=keys, mutable=["attn"],
    )
    flat = jax.tree_util.tree_leaves_with_path(state["attn"])
    paths = ["/".join(str(p) for p in path) for path, _ in flat]
    assert any("mid_block_attentions_0" in p for p in paths)
    assert any("up_blocks_1_attentions_0" in p for p in paths)
    for _, probs in flat:
        assert probs.ndim == 4  # [B, heads, Lq, Lk]
        assert probs.shape[-1] == CFG.text.max_length
        np.testing.assert_allclose(
            np.asarray(probs.sum(-1)), 1.0, atol=1e-4
        )


def test_unet_controlnet_residual_inputs(unet_and_params):
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    ctx = jax.random.normal(jax.random.key(2), (1, CFG.text.max_length, 32))
    base = unet.apply({"params": params}, x, jnp.array([10]), ctx)
    # skip structure: conv_in + per-level (resnets + downsample)
    n_levels = len(CFG.unet.block_out_channels)
    chans, sizes = [], []
    h = 8
    chans.append((CFG.unet.block_out_channels[0], h))
    for i, ch in enumerate(CFG.unet.block_out_channels):
        for _ in range(CFG.unet.layers_per_block):
            chans.append((ch, h))
        if i < n_levels - 1:
            h //= 2
            chans.append((ch, h))
    down_res = tuple(
        jnp.ones((1, s, s, c)) * 0.1 for c, s in chans
    )
    mid_res = jnp.ones((1, h, h, CFG.unet.block_out_channels[-1])) * 0.1
    out = unet.apply(
        {"params": params}, x, jnp.array([10]), ctx,
        down_residuals=down_res, mid_residual=mid_res,
    )
    assert out.shape == base.shape
    assert np.abs(np.asarray(out - base)).max() > 1e-6


def test_unet_deepcache_shallow_exactness(unet_and_params):
    """Shallow forward with a same-input cache is EXACTLY the full forward
    (DeepCache, arXiv 2312.00858); a perturbed input must change the
    shallow output (proving the shallow blocks actually recompute)."""
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (2, 8, 8, 4))
    t = jnp.array([10, 10], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (2, CFG.text.max_length, 32))
    full = unet.apply({"params": params}, x, t, ctx)
    full2, cache = unet.apply({"params": params}, x, t, ctx,
                              return_deep_cache=True)
    np.testing.assert_array_equal(np.asarray(full), np.asarray(full2))
    # cache = feature entering the shallowest up block: full latent res,
    # channels of level 1 (after the preceding Upsample2D)
    assert cache.shape == (2, 8, 8, CFG.unet.block_out_channels[1])
    shallow = unet.apply({"params": params}, x, t, ctx, deep_cache=cache)
    np.testing.assert_array_equal(np.asarray(shallow), np.asarray(full))
    sh2 = unet.apply({"params": params}, x + 0.1, t, ctx, deep_cache=cache)
    assert np.abs(np.asarray(sh2 - shallow)).max() > 1e-6


def test_unet_deepcache_with_controlnet_residuals(unet_and_params):
    """Shallow-path skip/residual alignment: with ControlNet residuals the
    shallow forward must still exactly match the full forward (the shallow
    skips are a prefix of the full stack; zip must line up)."""
    unet, params = unet_and_params
    x = jax.random.normal(jax.random.key(1), (1, 8, 8, 4))
    t = jnp.array([10], jnp.int32)
    ctx = jax.random.normal(jax.random.key(2), (1, CFG.text.max_length, 32))
    n_levels = len(CFG.unet.block_out_channels)
    chans, h = [(CFG.unet.block_out_channels[0], 8)], 8
    for i, ch in enumerate(CFG.unet.block_out_channels):
        for _ in range(CFG.unet.layers_per_block):
            chans.append((ch, h))
        if i < n_levels - 1:
            h //= 2
            chans.append((ch, h))
    down_res = tuple(
        jax.random.normal(jax.random.key(10 + k), (1, s, s, c)) * 0.1
        for k, (c, s) in enumerate(chans))
    mid_res = jnp.ones((1, h, h, CFG.unet.block_out_channels[-1])) * 0.1
    full, cache = unet.apply(
        {"params": params}, x, t, ctx, down_residuals=down_res,
        mid_residual=mid_res, return_deep_cache=True)
    shallow = unet.apply(
        {"params": params}, x, t, ctx, down_residuals=down_res,
        deep_cache=cache)
    np.testing.assert_array_equal(np.asarray(shallow), np.asarray(full))
    # and the shallow residuals must matter on the shallow path
    zeroed = tuple(jnp.zeros_like(r) for r in down_res)
    sh0 = unet.apply({"params": params}, x, t, ctx,
                     down_residuals=zeroed, deep_cache=cache)
    assert np.abs(np.asarray(sh0 - shallow)).max() > 1e-6


def test_vae_roundtrip():
    vae = AutoencoderKL(CFG.vae)
    img = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3)) * 2 - 1
    params = vae.init(jax.random.key(1), img)["params"]
    mean, logvar = vae.apply({"params": params}, img, method="encode")
    assert mean.shape == (1, 16, 16, 4)  # one downsample in tiny cfg
    assert logvar.shape == mean.shape
    rec = vae.apply({"params": params}, mean, method="decode")
    assert rec.shape == img.shape
    assert np.isfinite(np.asarray(rec)).all()


def test_clip_text_encoder():
    enc = CLIPTextEncoder(CFG.text)
    ids = jnp.array([[49406 % CFG.text.vocab_size, 5, 9, 2, 0, 0, 0, 0,
                      0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
    params = enc.init(jax.random.key(0), ids)["params"]
    hidden, pooled = enc.apply({"params": params}, ids)
    assert hidden.shape == (1, 16, CFG.text.hidden_size)
    assert pooled.shape == (1, CFG.text.hidden_size)


def test_clip_text_causality():
    """Changing a later token must not affect earlier hidden states."""
    enc = CLIPTextEncoder(CFG.text)
    ids1 = jnp.zeros((1, 16), jnp.int32).at[0, 10].set(7)
    ids2 = ids1.at[0, 12].set(9)
    params = enc.init(jax.random.key(0), ids1)["params"]
    h1, _ = enc.apply({"params": params}, ids1)
    h2, _ = enc.apply({"params": params}, ids2)
    np.testing.assert_allclose(
        np.asarray(h1[:, :12]), np.asarray(h2[:, :12]), atol=1e-5
    )
    assert np.abs(np.asarray(h1[:, 12:] - h2[:, 12:])).max() > 1e-6


def test_clip_vision_encoder():
    enc = CLIPVisionEncoder(CFG.vision)
    img = jax.random.uniform(jax.random.key(0), (2, 32, 32, 3))
    params = enc.init(jax.random.key(1), img)["params"]
    embeds, pooled, tokens = enc.apply({"params": params}, img)
    assert embeds.shape == (2, CFG.vision.projection_dim)
    assert pooled.shape == (2, CFG.vision.hidden_size)
    assert tokens.shape == (2, (32 // 16) ** 2 + 1, CFG.vision.hidden_size)


def test_gligen_fuser_identity_at_init():
    """GLIGEN gated self-attention is an exact identity at init (alpha
    gates are zero), so a GLIGEN-initialized UNet matches the plain
    forward until grounding weights load (reference fork
    models/attention.py:25-53)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.config import tiny_config
    from theatergen_tpu.models.unet import UNet2DCondition

    cfg = tiny_config().unet
    unet = UNet2DCondition(cfg)
    x = jax.random.normal(jax.random.key(0), (1, 8, 8, 4))
    t = jnp.array([3], jnp.int32)
    ctx = jax.random.normal(jax.random.key(1), (1, 16, cfg.cross_attention_dim))
    objs = jax.random.normal(jax.random.key(2), (1, 3, cfg.cross_attention_dim))
    params = unet.init(jax.random.key(3), x, t, ctx, objs=objs)["params"]
    with_objs = unet.apply({"params": params}, x, t, ctx, objs=objs)
    without = unet.apply({"params": params}, x, t, ctx)
    np.testing.assert_allclose(np.asarray(with_objs), np.asarray(without),
                               atol=1e-6)
    # fuser params exist on every attention level
    flat = jax.tree_util.tree_leaves_with_path(params)
    assert any("fuser" in "/".join(str(k) for k in path)
               for path, _ in flat)


def test_position_net_null_padding():
    """Masked objects map to the learned null features — padding objects
    to max_objects changes nothing for real ones."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from theatergen_tpu.models.ip_adapter import PositionNet

    net = PositionNet(out_dim=32, text_dim=16)
    boxes = jnp.asarray([[[0.1, 0.1, 0.5, 0.6], [0.2, 0.3, 0.9, 0.8]]])
    masks = jnp.asarray([[1.0, 0.0]])
    phr = jax.random.normal(jax.random.key(0), (1, 2, 16))
    params = net.init(jax.random.key(1), boxes, masks, phr)["params"]
    out = net.apply({"params": params}, boxes, masks, phr)
    assert out.shape == (1, 2, 32)
    # the masked slot must not depend on its (junk) box/phrase values
    boxes2 = boxes.at[0, 1].set(jnp.asarray([0.0, 0.0, 1.0, 1.0]))
    phr2 = phr.at[0, 1].set(0.0)
    out2 = net.apply({"params": params}, boxes2, masks, phr2)
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(out2[0, 1]),
                               atol=1e-6)
    assert not np.allclose(np.asarray(out[0, 0]), np.asarray(out[0, 1]))
