"""InceptionV3 pool3 features for FID — the reference's AFID feature space.

The reference computes crop-set FID with ``pytorch_fid``
(``CMIGBench/eval/eval.py:66-94``), whose InceptionV3 is torchvision's
inception_v3 with three FID-specific patches (pytorch_fid
``inception.py``):

- InceptionA/C and Mixed_7b's branch-pool use ``avg_pool2d(...,
  count_include_pad=False)``;
- Mixed_7c's branch pool is a **max** pool;
- features are the 2048-d global-average "pool3" activations.

This is a faithful NHWC flax re-derivation of that graph (weights ported
from the ``pt_inception-2015-12-05`` checkpoint via
:func:`port_inception` / ``scripts/export_weights.py``).  BatchNorm is
inference-only (running stats are plain parameters), eps 1e-3 as in
torchvision's ``BasicConv2d``.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

FID_WEIGHTS_URL = ("https://github.com/mseitzer/pytorch-fid/releases/"
                   "download/fid_weights/pt_inception-2015-12-05-6726825d.pth")


class BasicConv2d(nn.Module):
    """conv(no bias) + frozen BN(eps=1e-3) + relu (torchvision
    ``BasicConv2d``)."""

    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[Tuple[int, int], Tuple[int, int]] = ((0, 0), (0, 0))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=self.padding, use_bias=False, name="conv")(x)
        c = self.features
        scale = self.param("bn_scale", nn.initializers.ones, (c,))
        bias = self.param("bn_bias", nn.initializers.zeros, (c,))
        mean = self.param("bn_mean", nn.initializers.zeros, (c,))
        var = self.param("bn_var", nn.initializers.ones, (c,))
        x = (x - mean) * jax.lax.rsqrt(var + 1e-3) * scale + bias
        return nn.relu(x)


def _avg_pool3(x):
    """3×3 stride-1 avg pool, count_include_pad=False — the pytorch_fid
    patch over torchvision's default."""
    return nn.avg_pool(x, (3, 3), strides=(1, 1),
                       padding=((1, 1), (1, 1)), count_include_pad=False)


def _max_pool3s2(x):
    return nn.max_pool(x, (3, 3), strides=(2, 2))


class InceptionA(nn.Module):
    pool_features: int

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(64, (1, 1), name="branch1x1")(x)
        b5 = BasicConv2d(48, (1, 1), name="branch5x5_1")(x)
        b5 = BasicConv2d(64, (5, 5), padding=((2, 2), (2, 2)),
                         name="branch5x5_2")(b5)
        b3 = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(b3)
        b3 = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_3")(b3)
        bp = _avg_pool3(x)
        bp = BasicConv2d(self.pool_features, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b5, b3, bp], axis=-1)


class InceptionB(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(384, (3, 3), strides=(2, 2), name="branch3x3")(x)
        bd = BasicConv2d(64, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(96, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = BasicConv2d(96, (3, 3), strides=(2, 2), name="branch3x3dbl_3")(bd)
        return jnp.concatenate([b3, bd, _max_pool3s2(x)], axis=-1)


class InceptionC(nn.Module):
    channels_7x7: int

    @nn.compact
    def __call__(self, x):
        c7 = self.channels_7x7
        b1 = BasicConv2d(192, (1, 1), name="branch1x1")(x)
        b7 = BasicConv2d(c7, (1, 1), name="branch7x7_1")(x)
        b7 = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7_3")(b7)
        bd = BasicConv2d(c7, (1, 1), name="branch7x7dbl_1")(x)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_2")(bd)
        bd = BasicConv2d(c7, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_3")(bd)
        bd = BasicConv2d(c7, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7dbl_4")(bd)
        bd = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7dbl_5")(bd)
        bp = _avg_pool3(x)
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b7, bd, bp], axis=-1)


class InceptionD(nn.Module):
    @nn.compact
    def __call__(self, x):
        b3 = BasicConv2d(192, (1, 1), name="branch3x3_1")(x)
        b3 = BasicConv2d(320, (3, 3), strides=(2, 2), name="branch3x3_2")(b3)
        b7 = BasicConv2d(192, (1, 1), name="branch7x7x3_1")(x)
        b7 = BasicConv2d(192, (1, 7), padding=((0, 0), (3, 3)),
                         name="branch7x7x3_2")(b7)
        b7 = BasicConv2d(192, (7, 1), padding=((3, 3), (0, 0)),
                         name="branch7x7x3_3")(b7)
        b7 = BasicConv2d(192, (3, 3), strides=(2, 2), name="branch7x7x3_4")(b7)
        return jnp.concatenate([b3, b7, _max_pool3s2(x)], axis=-1)


class InceptionE(nn.Module):
    # Mixed_7b pools with the patched avg pool, Mixed_7c with a MAX pool
    # (pytorch_fid FIDInceptionE_1 vs FIDInceptionE_2)
    pool: str = "avg"

    @nn.compact
    def __call__(self, x):
        b1 = BasicConv2d(320, (1, 1), name="branch1x1")(x)
        b3 = BasicConv2d(384, (1, 1), name="branch3x3_1")(x)
        b3 = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3_2a")(b3),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3_2b")(b3),
        ], axis=-1)
        bd = BasicConv2d(448, (1, 1), name="branch3x3dbl_1")(x)
        bd = BasicConv2d(384, (3, 3), padding=((1, 1), (1, 1)),
                         name="branch3x3dbl_2")(bd)
        bd = jnp.concatenate([
            BasicConv2d(384, (1, 3), padding=((0, 0), (1, 1)),
                        name="branch3x3dbl_3a")(bd),
            BasicConv2d(384, (3, 1), padding=((1, 1), (0, 0)),
                        name="branch3x3dbl_3b")(bd),
        ], axis=-1)
        if self.pool == "avg":
            bp = _avg_pool3(x)
        else:
            bp = nn.max_pool(x, (3, 3), strides=(1, 1),
                             padding=((1, 1), (1, 1)))
        bp = BasicConv2d(192, (1, 1), name="branch_pool")(bp)
        return jnp.concatenate([b1, b3, bd, bp], axis=-1)


class InceptionV3Features(nn.Module):
    """NHWC [B, H, W, 3] in **[-1, 1]** → 2048-d pool3 features.

    Callers resize to 299×299 bilinear and scale ``2x - 1`` first
    (pytorch_fid's ``resize_input``/``normalize_input`` defaults, which
    the reference uses)."""

    @nn.compact
    def __call__(self, x):
        x = BasicConv2d(32, (3, 3), strides=(2, 2), name="Conv2d_1a_3x3")(x)
        x = BasicConv2d(32, (3, 3), name="Conv2d_2a_3x3")(x)
        x = BasicConv2d(64, (3, 3), padding=((1, 1), (1, 1)),
                        name="Conv2d_2b_3x3")(x)
        x = _max_pool3s2(x)
        x = BasicConv2d(80, (1, 1), name="Conv2d_3b_1x1")(x)
        x = BasicConv2d(192, (3, 3), name="Conv2d_4a_3x3")(x)
        x = _max_pool3s2(x)
        x = InceptionA(32, name="Mixed_5b")(x)
        x = InceptionA(64, name="Mixed_5c")(x)
        x = InceptionA(64, name="Mixed_5d")(x)
        x = InceptionB(name="Mixed_6a")(x)
        x = InceptionC(128, name="Mixed_6b")(x)
        x = InceptionC(160, name="Mixed_6c")(x)
        x = InceptionC(160, name="Mixed_6d")(x)
        x = InceptionC(192, name="Mixed_6e")(x)
        x = InceptionD(name="Mixed_7a")(x)
        x = InceptionE("avg", name="Mixed_7b")(x)
        x = InceptionE("max", name="Mixed_7c")(x)
        return jnp.mean(x, axis=(1, 2))     # adaptive avg pool → [B, 2048]


def port_inception(state_dict) -> dict:
    """pytorch_fid / torchvision ``inception_v3`` state dict → flax params.

    Keys look like ``Mixed_5b.branch1x1.conv.weight`` /
    ``...bn.{weight,bias,running_mean,running_var}``; torch conv
    [out, in, kh, kw] → flax [kh, kw, in, out].  The unused ``fc`` /
    ``AuxLogits`` tensors are ignored."""
    import numpy as np

    out: dict = {}

    def put(path: Sequence[str], value):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = jnp.asarray(value)

    for key, val in state_dict.items():
        parts = key.split(".")
        if parts[0] in ("fc", "AuxLogits"):
            continue
        v = np.asarray(val)
        *module_path, leaf_mod, leaf = parts
        if leaf_mod == "conv" and leaf == "weight":
            put(module_path + ["conv", "kernel"], v.transpose(2, 3, 1, 0))
        elif leaf_mod == "bn":
            name = {"weight": "bn_scale", "bias": "bn_bias",
                    "running_mean": "bn_mean",
                    "running_var": "bn_var"}.get(leaf)
            if name is None:        # num_batches_tracked
                continue
            put(module_path + [name], v)
        else:
            raise ValueError(f"unrecognized inception key: {key}")
    return out


class InceptionEmbedder:
    """FID feature extractor with the reference's preprocessing: resize to
    299 bilinear on [0,1] images, scale to [-1,1], pool3 features
    (``pytorch_fid`` defaults used by ``eval.py:66-94``)."""

    def __init__(self, params, size: int = 299):
        self.model = InceptionV3Features()
        self.params = params
        self.size = size
        self._jit = jax.jit(
            lambda p, x: self.model.apply({"params": p}, x))

    @classmethod
    def from_weights_dir(cls, weights_dir: str):
        import os

        from ..models.weights import load_state_dict

        return cls(port_inception(load_state_dict(
            os.path.join(weights_dir, "fid_inception.safetensors"))))

    @classmethod
    def random_init(cls, rng, size: int = 299):
        m = InceptionV3Features()
        p = m.init(rng, jnp.zeros((1, size, size, 3)))["params"]
        return cls(p, size)

    def embed_images(self, images, batch_size: int = 50) -> "np.ndarray":  # noqa: F821
        """Chunked like ``pytorch_fid`` (batch 50): a full benchmark run
        yields thousands of crops, and one unchunked program would OOM on
        the 299² activations.  The last chunk is padded to a full batch so
        every call reuses one compiled shape."""
        import numpy as np

        outs = []
        for i in range(0, len(images), batch_size):
            chunk = [
                jax.image.resize(jnp.asarray(im, jnp.float32),
                                 (self.size, self.size, 3), "bilinear")
                for im in images[i:i + batch_size]
            ]
            n = len(chunk)
            if n < batch_size and len(images) > batch_size:
                chunk = chunk + [chunk[-1]] * (batch_size - n)
            batch = jnp.stack(chunk)
            outs.append(np.asarray(
                self._jit(self.params, batch * 2.0 - 1.0))[:n])
        return np.concatenate(outs, axis=0)
