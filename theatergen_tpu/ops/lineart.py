"""Lineart extraction for ControlNet conditioning.

The reference preprocesses the character collage with ``LineartDetector``
(a small CNN from lllyasviel/Annotators — ``generate.py:96``,
``models/pipelines.py:710-722``) before feeding ControlNet-lineart.

Two backends:
- :class:`LineartNet` — the informative-drawings-style residual generator
  the pretrained checkpoint fits, for checkpoint porting;
- :func:`dog_lineart` — a weightless extended-difference-of-Gaussians edge
  sketch in pure jnp, used when no checkpoint is available.  Both produce
  the white-lines-on-black convention ControlNet-lineart expects
  (the reference inverts the detector output).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def gaussian_kernel1d(sigma: float, radius: int) -> jnp.ndarray:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(img: jnp.ndarray, sigma: float) -> jnp.ndarray:
    """Separable Gaussian blur over the trailing-2 spatial dims of HW or
    HWC images."""
    radius = max(1, int(3 * sigma))
    k = gaussian_kernel1d(sigma, radius)
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    x = img.astype(jnp.float32)[None]          # [1, H, W, C]
    c = x.shape[-1]
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 1, c),
                                        ("NHWC", "HWIO", "NHWC"))

    def depthwise(data, kh, kw, pad):
        kern = jnp.broadcast_to(
            (kh[:, None] * kw[None, :])[:, :, None, None],
            (kh.shape[0], kw.shape[0], 1, c),
        )
        return jax.lax.conv_general_dilated(
            data, kern, (1, 1), pad, dimension_numbers=dn,
            feature_group_count=c,
        )

    one = jnp.ones((1,), jnp.float32)
    x = jnp.pad(x, [(0, 0), (radius, radius), (0, 0), (0, 0)], mode="edge")
    x = depthwise(x, k, one, [(0, 0), (0, 0)])
    x = jnp.pad(x, [(0, 0), (0, 0), (radius, radius), (0, 0)], mode="edge")
    x = depthwise(x, one, k, [(0, 0), (0, 0)])
    x = x[0]
    return x[..., 0] if squeeze else x


def dog_lineart(image: jnp.ndarray, sigma: float = 1.0, k: float = 1.6,
                tau: float = 0.98, phi: float = 200.0) -> jnp.ndarray:
    """Extended difference-of-Gaussians sketch: image [H, W, 3] in [0,1] →
    lineart [H, W, 3] in [0,1], white lines on black."""
    gray = jnp.mean(image.astype(jnp.float32), axis=-1)
    g1 = gaussian_blur(gray, sigma)
    g2 = gaussian_blur(gray, sigma * k)
    d = g1 - tau * g2
    edges = 1.0 - jnp.tanh(jnp.maximum(-d, 0.0) * phi)
    lines = 1.0 - edges  # white lines on black
    lines = jnp.clip(lines * 2.5, 0.0, 1.0)
    return jnp.repeat(lines[..., None], 3, axis=-1)


def instance_norm(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    """torch InstanceNorm2d (affine=False): per-sample per-channel
    normalization over the spatial axes (NHWC)."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + eps)


def _reflect_pad(x: jnp.ndarray, p: int) -> jnp.ndarray:
    return jnp.pad(x, ((0, 0), (p, p), (p, p), (0, 0)), mode="reflect")


def _conv_transpose_s2(x: jnp.ndarray, kernel: jnp.ndarray,
                       bias: jnp.ndarray) -> jnp.ndarray:
    """torch ConvTranspose2d(k=3, stride=2, padding=1, output_padding=1):
    dilate the input by 2 and cross-correlate with the (pre-flipped,
    ``weights.convt_kernel``) kernel under (1, 2) padding — output 2×."""
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1, 1), padding=((1, 2), (1, 2)),
        lhs_dilation=(2, 2), dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return y + bias


class LineartResidualBlock(nn.Module):
    """controlnet_aux lineart ResidualBlock: reflect-pad conv → IN → relu
    → reflect-pad conv → IN, residual."""

    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding="VALID",
                    name="conv1")(_reflect_pad(x, 1))
        h = nn.relu(instance_norm(h))
        h = nn.Conv(self.ch, (3, 3), padding="VALID",
                    name="conv2")(_reflect_pad(h, 1))
        return x + instance_norm(h)


class LineartGenerator(nn.Module):
    """Checkpoint-faithful lineart annotator (the ``sk_model.pth`` /
    ``sk_model2.pth`` Generator from lllyasviel/Annotators, used by the
    reference's ``LineartDetector`` preprocessor, ``generate.py:96``,
    ``models/pipelines.py:710-722``): reflect-pad 7×7 stem → two stride-2
    downs → residual blocks → two ConvTranspose ups → 7×7 head, sigmoid.
    InstanceNorm is parameter-free.  Ports via
    ``models/weights.py::port_lineart``; golden test in
    tests/test_perception.py.

    Input [B, H, W, 3] in [0, 1]; output [B, H, W, 3] white-lines-on-black
    (the annotator emits dark-lines probability; inverted here to the
    ControlNet-lineart convention, matching the reference's ``255 - map``).
    """

    base: int = 64
    n_res: int = 3

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        x = image.astype(jnp.float32)
        h = nn.Conv(self.base, (7, 7), padding="VALID",
                    name="stem")(_reflect_pad(x, 3))
        h = nn.relu(instance_norm(h))
        h = nn.Conv(self.base * 2, (3, 3), strides=2, padding=1,
                    name="down1")(h)
        h = nn.relu(instance_norm(h))
        h = nn.Conv(self.base * 4, (3, 3), strides=2, padding=1,
                    name="down2")(h)
        h = nn.relu(instance_norm(h))
        for i in range(self.n_res):
            h = LineartResidualBlock(self.base * 4, name=f"res_{i}")(h)
        up1_k = self.param("up1_kernel", nn.initializers.normal(0.02),
                           (3, 3, self.base * 4, self.base * 2))
        up1_b = self.param("up1_bias", nn.initializers.zeros,
                           (self.base * 2,))
        h = nn.relu(instance_norm(_conv_transpose_s2(h, up1_k, up1_b)))
        up2_k = self.param("up2_kernel", nn.initializers.normal(0.02),
                           (3, 3, self.base * 2, self.base))
        up2_b = self.param("up2_bias", nn.initializers.zeros, (self.base,))
        h = nn.relu(instance_norm(_conv_transpose_s2(h, up2_k, up2_b)))
        out = nn.Conv(1, (7, 7), padding="VALID",
                      name="head")(_reflect_pad(h, 3))
        # the annotator draws dark lines on white; invert to ControlNet's
        # white-on-black convention (the reference's ``255 - map`` step)
        lines = 1.0 - jax.nn.sigmoid(out)
        return jnp.repeat(lines, 3, axis=-1)


class ResBlock(nn.Module):
    ch: int

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv1")(x)
        h = nn.relu(nn.GroupNorm(num_groups=1, name="norm1")(h))
        h = nn.Conv(self.ch, (3, 3), padding=1, name="conv2")(h)
        return x + nn.GroupNorm(num_groups=1, name="norm2")(h)


class LineartNet(nn.Module):
    """Residual generator: 3 → 64 → down×2 → 3 res blocks → up×2 → 1."""

    base: int = 64
    n_res: int = 3

    @nn.compact
    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        x = image.astype(jnp.float32)
        h = nn.relu(nn.Conv(self.base, (7, 7), padding=3, name="conv_in")(x))
        h = nn.relu(nn.Conv(self.base * 2, (3, 3), strides=2, padding=1,
                            name="down1")(h))
        h = nn.relu(nn.Conv(self.base * 4, (3, 3), strides=2, padding=1,
                            name="down2")(h))
        for i in range(self.n_res):
            h = ResBlock(self.base * 4, name=f"res_{i}")(h)
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        h = nn.relu(nn.Conv(self.base * 2, (3, 3), padding=1, name="up1")(h))
        b, hh, ww, c = h.shape
        h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
        h = nn.relu(nn.Conv(self.base, (3, 3), padding=1, name="up2")(h))
        out = nn.Conv(1, (7, 7), padding=3, name="conv_out")(h)
        lines = 1.0 - jax.nn.sigmoid(out)  # detector gives dark lines; invert
        return jnp.repeat(lines, 3, axis=-1)
