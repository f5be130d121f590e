"""Golden test: flax InceptionV3 pool3 features vs an independent torch
functional implementation of pytorch_fid's patched inception graph
(the reference's AFID feature extractor, CMIGBench/eval/eval.py:66-94).

torchvision isn't in this image, so the torch side is written here
directly from the pytorch_fid/torchvision definition (BasicConv2d =
conv+BN(eps 1e-3)+relu; FIDInceptionA/C/E_1 avg-pool with
count_include_pad=False; FIDInceptionE_2 max-pool branch pool)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from theatergen_tpu.eval.inception import (
    InceptionEmbedder, InceptionV3Features, port_inception,
)


def _flax_to_torch_sd(params):
    """Invert port_inception: flax tree → pytorch_fid-style state dict."""
    sd = {}

    def walk(prefix, tree):
        if "conv" in tree and "kernel" in tree.get("conv", {}):
            k = np.asarray(tree["conv"]["kernel"])
            sd[f"{prefix}.conv.weight"] = torch.tensor(
                k.transpose(3, 2, 0, 1))
            sd[f"{prefix}.bn.weight"] = torch.tensor(
                np.asarray(tree["bn_scale"]))
            sd[f"{prefix}.bn.bias"] = torch.tensor(
                np.asarray(tree["bn_bias"]))
            sd[f"{prefix}.bn.running_mean"] = torch.tensor(
                np.asarray(tree["bn_mean"]))
            sd[f"{prefix}.bn.running_var"] = torch.tensor(
                np.asarray(tree["bn_var"]))
            return
        for name, sub in tree.items():
            walk(f"{prefix}.{name}" if prefix else name, sub)

    walk("", params)
    return sd


def _bconv(sd, p, x, stride=1, padding=0):
    x = F.conv2d(x, sd[f"{p}.conv.weight"], stride=stride, padding=padding)
    x = F.batch_norm(x, sd[f"{p}.bn.running_mean"], sd[f"{p}.bn.running_var"],
                     sd[f"{p}.bn.weight"], sd[f"{p}.bn.bias"],
                     training=False, eps=1e-3)
    return F.relu(x)


def _avg3(x):
    return F.avg_pool2d(x, 3, 1, 1, count_include_pad=False)


def _inc_a(sd, p, x):
    b1 = _bconv(sd, f"{p}.branch1x1", x)
    b5 = _bconv(sd, f"{p}.branch5x5_1", x)
    b5 = _bconv(sd, f"{p}.branch5x5_2", b5, padding=2)
    b3 = _bconv(sd, f"{p}.branch3x3dbl_1", x)
    b3 = _bconv(sd, f"{p}.branch3x3dbl_2", b3, padding=1)
    b3 = _bconv(sd, f"{p}.branch3x3dbl_3", b3, padding=1)
    bp = _bconv(sd, f"{p}.branch_pool", _avg3(x))
    return torch.cat([b1, b5, b3, bp], 1)


def _inc_b(sd, p, x):
    b3 = _bconv(sd, f"{p}.branch3x3", x, stride=2)
    bd = _bconv(sd, f"{p}.branch3x3dbl_1", x)
    bd = _bconv(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
    bd = _bconv(sd, f"{p}.branch3x3dbl_3", bd, stride=2)
    return torch.cat([b3, bd, F.max_pool2d(x, 3, 2)], 1)


def _inc_c(sd, p, x):
    b1 = _bconv(sd, f"{p}.branch1x1", x)
    b7 = _bconv(sd, f"{p}.branch7x7_1", x)
    b7 = _bconv(sd, f"{p}.branch7x7_2", b7, padding=(0, 3))
    b7 = _bconv(sd, f"{p}.branch7x7_3", b7, padding=(3, 0))
    bd = _bconv(sd, f"{p}.branch7x7dbl_1", x)
    bd = _bconv(sd, f"{p}.branch7x7dbl_2", bd, padding=(3, 0))
    bd = _bconv(sd, f"{p}.branch7x7dbl_3", bd, padding=(0, 3))
    bd = _bconv(sd, f"{p}.branch7x7dbl_4", bd, padding=(3, 0))
    bd = _bconv(sd, f"{p}.branch7x7dbl_5", bd, padding=(0, 3))
    bp = _bconv(sd, f"{p}.branch_pool", _avg3(x))
    return torch.cat([b1, b7, bd, bp], 1)


def _inc_d(sd, p, x):
    b3 = _bconv(sd, f"{p}.branch3x3_1", x)
    b3 = _bconv(sd, f"{p}.branch3x3_2", b3, stride=2)
    b7 = _bconv(sd, f"{p}.branch7x7x3_1", x)
    b7 = _bconv(sd, f"{p}.branch7x7x3_2", b7, padding=(0, 3))
    b7 = _bconv(sd, f"{p}.branch7x7x3_3", b7, padding=(3, 0))
    b7 = _bconv(sd, f"{p}.branch7x7x3_4", b7, stride=2)
    return torch.cat([b3, b7, F.max_pool2d(x, 3, 2)], 1)


def _inc_e(sd, p, x, pool):
    b1 = _bconv(sd, f"{p}.branch1x1", x)
    b3 = _bconv(sd, f"{p}.branch3x3_1", x)
    b3 = torch.cat([
        _bconv(sd, f"{p}.branch3x3_2a", b3, padding=(0, 1)),
        _bconv(sd, f"{p}.branch3x3_2b", b3, padding=(1, 0)),
    ], 1)
    bd = _bconv(sd, f"{p}.branch3x3dbl_1", x)
    bd = _bconv(sd, f"{p}.branch3x3dbl_2", bd, padding=1)
    bd = torch.cat([
        _bconv(sd, f"{p}.branch3x3dbl_3a", bd, padding=(0, 1)),
        _bconv(sd, f"{p}.branch3x3dbl_3b", bd, padding=(1, 0)),
    ], 1)
    bp = _avg3(x) if pool == "avg" else F.max_pool2d(x, 3, 1, 1)
    bp = _bconv(sd, f"{p}.branch_pool", bp)
    return torch.cat([b1, b3, bd, bp], 1)


def _torch_inception(sd, x):
    x = _bconv(sd, "Conv2d_1a_3x3", x, stride=2)
    x = _bconv(sd, "Conv2d_2a_3x3", x)
    x = _bconv(sd, "Conv2d_2b_3x3", x, padding=1)
    x = F.max_pool2d(x, 3, 2)
    x = _bconv(sd, "Conv2d_3b_1x1", x)
    x = _bconv(sd, "Conv2d_4a_3x3", x)
    x = F.max_pool2d(x, 3, 2)
    x = _inc_a(sd, "Mixed_5b", x)
    x = _inc_a(sd, "Mixed_5c", x)
    x = _inc_a(sd, "Mixed_5d", x)
    x = _inc_b(sd, "Mixed_6a", x)
    x = _inc_c(sd, "Mixed_6b", x)
    x = _inc_c(sd, "Mixed_6c", x)
    x = _inc_c(sd, "Mixed_6d", x)
    x = _inc_c(sd, "Mixed_6e", x)
    x = _inc_d(sd, "Mixed_7a", x)
    x = _inc_e(sd, "Mixed_7b", x, "avg")
    x = _inc_e(sd, "Mixed_7c", x, "max")
    return x.mean(dim=(2, 3))


@pytest.fixture(scope="module")
def inception_setup():
    model = InceptionV3Features()
    # small spatial size keeps the CPU test fast; channels stay full-width
    rng = jax.random.key(0)
    params = model.init(rng, jnp.zeros((1, 96, 96, 3)))["params"]
    # make BN stats non-trivial so the normalization actually tests
    params = jax.tree.map(
        lambda x: x + 0.05 * jax.random.normal(
            jax.random.fold_in(rng, x.size), x.shape), params)
    return model, params


def test_inception_matches_torch_golden(inception_setup):
    model, params = inception_setup
    sd = _flax_to_torch_sd(params)
    x = np.random.RandomState(0).rand(2, 96, 96, 3).astype(np.float32)
    x = x * 2 - 1
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x)))
    theirs = _torch_inception(
        sd, torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    assert ours.shape == (2, 2048)
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)


def test_port_inception_roundtrip(inception_setup):
    """port_inception(state_dict) reproduces the original param tree —
    and ignores fc/AuxLogits like pytorch_fid's feature path."""
    model, params = inception_setup
    sd = _flax_to_torch_sd(params)
    sd["fc.weight"] = torch.zeros(1008, 2048)
    sd["fc.bias"] = torch.zeros(1008)
    sd["AuxLogits.conv0.conv.weight"] = torch.zeros(128, 768, 1, 1)
    sd["Conv2d_1a_3x3.bn.num_batches_tracked"] = torch.tensor(0)
    ported = port_inception(sd)
    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = jax.tree_util.tree_leaves_with_path(ported)
    assert len(flat_a) == len(flat_b)
    for (pa, a), (pb, b) in zip(sorted(flat_a, key=lambda t: str(t[0])),
                                sorted(flat_b, key=lambda t: str(t[0]))):
        assert str(pa) == str(pb)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_inception_embedder_preprocessing(inception_setup):
    """Embedder resizes [0,1] images to the model size and scales to
    [-1,1] (pytorch_fid resize_input/normalize_input defaults)."""
    _, params = inception_setup
    emb = InceptionEmbedder(params, size=96)
    imgs = [np.random.RandomState(i).rand(40, 56, 3).astype(np.float32)
            for i in range(2)]
    feats = emb.embed_images(imgs)
    assert feats.shape == (2, 2048)
    assert np.isfinite(feats).all()


def test_inception_embedder_chunked_matches_one_shot(inception_setup):
    """Chunked embedding (pytorch_fid batches of 50; ours is needed to
    avoid OOM on full-benchmark crop sets) equals the one-shot result,
    including the padded final partial chunk."""
    _, params = inception_setup
    emb = InceptionEmbedder(params, size=96)
    imgs = [np.random.RandomState(i).rand(40, 56, 3).astype(np.float32)
            for i in range(7)]
    one = emb.embed_images(imgs, batch_size=50)
    chunked = emb.embed_images(imgs, batch_size=3)   # 3 + 3 + 1(padded)
    assert one.shape == chunked.shape == (7, 2048)
    # different batch shapes compile different XLA programs; with the
    # fixture's perturbed BN stats the f32 drift reaches ~3e-5 on
    # features of scale ~28 (measured) — same tolerance as the golden test
    np.testing.assert_allclose(chunked, one, atol=2e-4)
