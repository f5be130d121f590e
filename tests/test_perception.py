"""Perception: SAMLite, mask selection, lineart."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from theatergen_tpu.config import tiny_config
from theatergen_tpu.ops import lineart as LA
from theatergen_tpu.perception import detector as D
from theatergen_tpu.perception import sam as SM


CFG = tiny_config()


@pytest.fixture(scope="module")
def sam_and_params():
    sam = SM.SAMLite(CFG.sam)
    img = jnp.zeros((1, CFG.sam.image_size, CFG.sam.image_size, 3))
    boxes = jnp.zeros((1, 1, 4))
    params = sam.init(jax.random.key(0), img, boxes)["params"]
    return sam, params


def test_samlite_shapes(sam_and_params):
    sam, params = sam_and_params
    s = CFG.sam.image_size
    n = s // CFG.sam.patch_size
    img = jax.random.uniform(jax.random.key(1), (1, s, s, 3))
    boxes = jnp.array([[[0.2, 0.2, 0.8, 0.8], [0.0, 0.0, 0.5, 0.5]]])
    masks, iou = sam.apply({"params": params}, img, boxes)
    assert masks.shape == (1, 2, CFG.sam.num_mask_outputs, 4 * n, 4 * n)
    assert iou.shape == (1, 2, CFG.sam.num_mask_outputs)
    # different boxes → different masks
    assert np.abs(np.asarray(masks[0, 0] - masks[0, 1])).max() > 1e-6


def test_select_mask_rules():
    h = w = 8
    big = jnp.ones((h, w))
    mid = jnp.zeros((h, w)).at[:4].set(1.0)
    small = jnp.zeros((h, w)).at[:2, :2].set(1.0)
    masks = jnp.stack([small, mid, big])
    # all confident → largest wins
    assert int(SM.select_mask(masks, jnp.array([0.9, 0.9, 0.9]))) == 2
    # largest below confidence → next largest
    assert int(SM.select_mask(masks, jnp.array([0.9, 0.9, 0.1]))) == 1
    # coarse-iou penalty: coarse mask matches `mid` only
    idx = SM.select_mask(masks, jnp.array([0.9, 0.9, 0.9]), coarse_mask=mid,
                         min_coarse_iou=0.6)
    assert int(idx) == 1


def test_refine_mask_removes_specks():
    m = np.zeros((16, 16), np.float32)
    m[4:12, 4:12] = 1.0
    m[0, 0] = 1.0  # single-pixel speck
    out = np.asarray(SM.refine_mask(jnp.asarray(m)))
    assert out[0, 0] == 0.0          # speck eroded away
    assert out[6:10, 6:10].min() == 1.0   # body survives


def test_segment_with_box(sam_and_params):
    sam, params = sam_and_params
    s = CFG.sam.image_size
    img = jax.random.uniform(jax.random.key(1), (s, s, 3))
    (m64, m512), conf = SM.segment_with_box(
        sam, params, img, jnp.array([0.2, 0.2, 0.8, 0.8]),
        out_sizes=(8, 64),
    )
    assert m64.shape == (8, 8) and m512.shape == (64, 64)
    assert set(np.unique(np.asarray(m64))) <= {0.0, 1.0}


def test_attention_detect_localizes():
    heads, side, T = 2, 8, 5
    attn = np.full((heads, side * side, T), 1e-5, np.float32)
    # concentrate token-3 attention bottom-right
    for y in range(5, 8):
        for x in range(5, 8):
            attn[:, y * side + x, 3] = 1.0
    det = D.attention_detect([jnp.asarray(attn)], jnp.int32(3))
    assert bool(det.ok)
    box = np.asarray(det.box)
    assert box[0] > 0.4 and box[1] > 0.4  # bottom-right quadrant


def test_attention_detect_rejects_diffuse():
    heads, side, T = 2, 8, 5
    attn = np.random.RandomState(0).uniform(
        0.4, 0.6, (heads, side * side, T)).astype(np.float32)
    det = D.attention_detect([jnp.asarray(attn)], jnp.int32(3))
    # diffuse attention → large box, low inside-mass concentration is not
    # required, but the box should cover most of the canvas
    box = np.asarray(det.box)
    assert (box[2] - box[0]) > 0.8


def test_dog_lineart_edges():
    img = np.zeros((32, 32, 3), np.float32)
    img[:, 16:] = 1.0  # vertical edge
    lines = np.asarray(LA.dog_lineart(jnp.asarray(img)))
    assert lines.shape == (32, 32, 3)
    edge_col = lines[:, 14:18, 0].mean()
    flat_col = lines[:, 2:6, 0].mean()
    assert edge_col > flat_col + 0.1  # bright lines at the edge


def test_lineart_net_shapes():
    net = LA.LineartNet(base=8, n_res=1)
    img = jax.random.uniform(jax.random.key(0), (1, 32, 32, 3))
    params = net.init(jax.random.key(1), img)["params"]
    out = net.apply({"params": params}, img)
    assert out.shape == (1, 32, 32, 3)
    assert 0.0 <= float(out.min()) and float(out.max()) <= 1.0


def test_lineart_generator_torch_parity():
    """Golden test: LineartGenerator reproduces the controlnet_aux lineart
    Generator (informative-drawings: reflect-pad convs, parameter-free
    InstanceNorm, stride-2 ConvTranspose ups) through port_lineart."""
    import torch
    import torch.nn as tnn

    from theatergen_tpu.models.weights import port_lineart

    norm = tnn.InstanceNorm2d

    class TorchResidualBlock(tnn.Module):
        def __init__(self, ch):
            super().__init__()
            self.conv_block = tnn.Sequential(
                tnn.ReflectionPad2d(1), tnn.Conv2d(ch, ch, 3), norm(ch),
                tnn.ReLU(inplace=True),
                tnn.ReflectionPad2d(1), tnn.Conv2d(ch, ch, 3), norm(ch))

        def forward(self, x):
            return x + self.conv_block(x)

    class TorchGenerator(tnn.Module):
        def __init__(self, base=8, n_res=2):
            super().__init__()
            self.model0 = tnn.Sequential(
                tnn.ReflectionPad2d(3), tnn.Conv2d(3, base, 7), norm(base),
                tnn.ReLU(inplace=True))
            self.model1 = tnn.Sequential(
                tnn.Conv2d(base, base * 2, 3, stride=2, padding=1),
                norm(base * 2), tnn.ReLU(inplace=True),
                tnn.Conv2d(base * 2, base * 4, 3, stride=2, padding=1),
                norm(base * 4), tnn.ReLU(inplace=True))
            self.model2 = tnn.Sequential(
                *[TorchResidualBlock(base * 4) for _ in range(n_res)])
            self.model3 = tnn.Sequential(
                tnn.ConvTranspose2d(base * 4, base * 2, 3, stride=2,
                                    padding=1, output_padding=1),
                norm(base * 2), tnn.ReLU(inplace=True),
                tnn.ConvTranspose2d(base * 2, base, 3, stride=2,
                                    padding=1, output_padding=1),
                norm(base), tnn.ReLU(inplace=True))
            self.model4 = tnn.Sequential(
                tnn.ReflectionPad2d(3), tnn.Conv2d(base, 1, 7),
                tnn.Sigmoid())

        def forward(self, x):
            h = self.model0(x)
            h = self.model1(h)
            h = self.model2(h)
            h = self.model3(h)
            return self.model4(h)

    torch.manual_seed(0)
    tm = TorchGenerator().eval()
    with torch.no_grad():
        for p in tm.parameters():
            p.uniform_(-0.2, 0.2)
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    params = port_lineart(sd)

    rng = np.random.RandomState(0)
    img = rng.rand(1, 32, 32, 3).astype(np.float32)
    with torch.no_grad():
        t_out = tm(torch.from_numpy(img.transpose(0, 3, 1, 2))).numpy()

    jm = LA.LineartGenerator(base=8, n_res=2)
    j_out = np.asarray(jm.apply({"params": params}, jnp.asarray(img)))
    # module output is inverted (white lines on black)
    np.testing.assert_allclose(1.0 - j_out[0, :, :, 0], t_out[0, 0],
                               atol=3e-5, rtol=1e-4)


def test_attention_detect_gaussian_smoothing():
    heads, side, T = 2, 8, 5
    attn = np.full((heads, side * side, T), 1e-5, np.float32)
    attn[:, 5 * side + 5, 3] = 1.0   # single-pixel peak
    det_raw = D.attention_detect([jnp.asarray(attn)], jnp.int32(3))
    det_smooth = D.attention_detect([jnp.asarray(attn)], jnp.int32(3),
                                    gaussian_sigma=1.5)
    raw_box = np.asarray(det_raw.box)
    smooth_box = np.asarray(det_smooth.box)
    # smoothing spreads the peak → strictly larger detected box
    area = lambda b: (b[2] - b[0]) * (b[3] - b[1])
    assert area(smooth_box) > area(raw_box)


def test_owl_detector_shapes_and_backend():
    from theatergen_tpu.perception.owl import OwlBackend, OwlDetector
    from theatergen_tpu.utils.tokenizer import load_tokenizer

    vcfg = CFG.vision
    tcfg = CFG.text
    det = OwlDetector(vcfg, tcfg)
    img = jax.random.uniform(jax.random.key(0),
                             (1, vcfg.image_size, vcfg.image_size, 3))
    ids = jnp.zeros((2, tcfg.max_length), jnp.int32)
    params = det.init(jax.random.key(1), img, ids)["params"]
    boxes, logits = det.apply({"params": params}, img, ids)
    n = (vcfg.image_size // vcfg.patch_size) ** 2
    assert boxes.shape == (1, n, 4)
    assert logits.shape == (1, n, 2)
    b = np.asarray(boxes)
    assert (b[..., 2] >= b[..., 0]).all() and (b[..., 3] >= b[..., 1]).all()
    assert b.min() >= 0 and b.max() <= 1

    backend = OwlBackend(det, params, load_tokenizer(None, tcfg.vocab_size),
                         max_length=tcfg.max_length)
    box, conf, ok = backend(np.zeros((64, 64, 3), np.float32), "a cat")
    assert box.shape == (4,) and isinstance(conf, float)
    count = backend.count_instances(np.zeros((64, 64, 3), np.float32), "a cat")
    assert count >= 0


def test_segment_with_box_legacy_single_wrapper():
    """sam_refine_box parity surface (ref models/sam.py:176-182): one
    image + one box -> (mask, conf), via the batched legacy variant."""
    from theatergen_tpu.config import tiny_config

    scfg = tiny_config().sam
    sam = SM.SAMLite(scfg)
    s = scfg.image_size
    img = jax.random.uniform(jax.random.key(0), (s, s, 3))
    box = jnp.array([0.2, 0.2, 0.7, 0.7])
    params = sam.init(jax.random.key(1), img[None], box[None, None])["params"]
    mask, conf = SM.segment_with_box_legacy(sam, params, img, box,
                                            out_size=16)
    assert mask.shape == (16, 16)
    assert conf.shape == ()
    assert np.isfinite(np.asarray(mask)).all()


def test_legacy_selection_uses_box_as_coarse_mask():
    """The legacy rule is largest_over_conf gated by IoU against the
    RASTERIZED INPUT BOX (ref models/sam.py:184-209): a huge candidate
    that covers the box but sprawls far outside it must lose to a
    candidate matching the box."""
    from theatergen_tpu.ops import geometry as G

    h = w = 16
    box = jnp.array([0.25, 0.25, 0.75, 0.75])
    cm = G.box_mask(box, h, w)
    sprawl = jnp.ones((h, w))                  # IoU with box mask = 0.25
    snug = cm                                   # IoU = 1.0
    masks = jnp.stack([sprawl, snug])
    idx = SM.select_mask(masks, jnp.array([0.9, 0.9]), cm,
                         min_coarse_iou=0.5)
    assert int(idx) == 1
