"""Torch-semantics NN primitives on NHWC layouts.

The reference relies on specific PyTorch operator conventions (ConvTranspose2d
geometry, Upsample align_corners variants, bicubic with A=-0.75, BatchNorm
affine=False). These helpers reproduce those exactly so released checkpoints
convert losslessly, while keeping NHWC layouts that XLA:TPU prefers.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def Conv(features: int, kernel: int = 3, stride: int = 1, padding: int = 0,
         use_bias: bool = True, name: Optional[str] = None) -> nn.Conv:
    """2D conv factory, NHWC, torch-style symmetric integer padding."""
    return nn.Conv(features, (kernel, kernel), strides=(stride, stride),
                   padding=((padding, padding), (padding, padding)),
                   use_bias=use_bias, name=name)


class ConvTranspose(nn.Module):
    """Transposed 2D conv matching torch.nn.ConvTranspose2d(k, s, p).

    Implemented as an input-dilated convolution with a spatially flipped
    kernel and padding (k - 1 - p) — the exact adjoint geometry torch uses.
    Kernel param layout: (kh, kw, in, out); converters map the torch weight
    (in, out, kh, kw) by pure transpose (the flip happens at apply time).
    """

    features: int
    kernel: int = 4
    stride: int = 2
    padding: int = 1
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = self.kernel
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, in_ch, self.features))
        pad = k - 1 - self.padding
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(w, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(self.stride, self.stride),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


def BatchNorm(affine: bool = True, name: Optional[str] = None) -> nn.BatchNorm:
    """BatchNorm factory with torch defaults (eps 1e-5, torch momentum 0.1
    == flax momentum 0.9). Call as ``BatchNorm(...)(x, use_running_average=
    not train)``.

    affine=False (use_scale/use_bias False) matches the reference U-Nets
    (reference network/unets.py:17,46); affine=True matches OffsetDecoder's
    BatchNorm1d (reference network/mlp.py:90-97). Running stats live in the
    'batch_stats' collection.
    """
    return nn.BatchNorm(momentum=0.9, epsilon=1e-5,
                        use_bias=affine, use_scale=affine, name=name)


def leaky_relu(x, negative_slope: float):
    return jnp.where(x >= 0, x, negative_slope * x)


def upsample_bilinear_x2(x: jnp.ndarray) -> jnp.ndarray:
    """2x bilinear upsample, align_corners=False (torch nn.Upsample default
    used by the 'upsample' up_mode, reference network/unets.py:42).

    jax.image.resize uses half-pixel centers == torch align_corners=False.
    x: (N, H, W, C).
    """
    N, H, W, C = x.shape
    return jax.image.resize(x, (N, 2 * H, 2 * W, C), method="bilinear")


def _cubic_weights_align_corners(in_size: int, out_size: int, dtype):
    """Per-output 4-tap cubic (A=-0.75) weights + indices, align_corners=True
    with index clamping — torch F.interpolate(mode='bicubic',
    align_corners=True) semantics (reference network/HGFilters.py:115)."""
    import numpy as np
    if out_size == 1 or in_size == 1:
        scale = 0.0
    else:
        scale = (in_size - 1) / (out_size - 1)
    xs = np.arange(out_size) * scale
    x0 = np.floor(xs).astype(np.int64)
    t = xs - x0
    A = -0.75

    def k1(tt):  # |x| <= 1
        return ((A + 2) * tt - (A + 3)) * tt * tt + 1

    def k2(tt):  # 1 < |x| < 2
        return ((A * tt - 5 * A) * tt + 8 * A) * tt - 4 * A

    w = np.stack([k2(t + 1), k1(t), k1(1 - t), k2(2 - t)], axis=-1)
    idx = np.stack([x0 - 1, x0, x0 + 1, x0 + 2], axis=-1)
    idx = np.clip(idx, 0, in_size - 1)
    return jnp.asarray(w, dtype), jnp.asarray(idx)


def upsample_bicubic_x2_align_corners(x: jnp.ndarray) -> jnp.ndarray:
    """2x bicubic upsample, align_corners=True, A=-0.75 (torch parity).

    Separable: rows then cols, each a 4-tap gather+weight. x: (N, H, W, C).
    """
    N, H, W, C = x.shape
    wh, ih = _cubic_weights_align_corners(H, 2 * H, x.dtype)
    ww, iw = _cubic_weights_align_corners(W, 2 * W, x.dtype)
    # rows: (N, H, W, C) -> (N, 2H, W, C)
    xr = x[:, ih, :, :]                       # (N, 2H, 4, W, C)
    xr = jnp.einsum("nhkwc,hk->nhwc", xr, wh)
    # cols: (N, 2H, W, C) -> (N, 2H, 2W, C)
    xc = xr[:, :, iw, :]                      # (N, 2H, 2W, 4, C)
    return jnp.einsum("nhwkc,wk->nhwc", xc, ww)


def avg_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    """F.avg_pool2d(x, 2, stride=2) on NHWC."""
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def reflection_pad_2d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """nn.ReflectionPad2d on NHWC."""
    return jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)),
                   mode="reflect")


def GroupNormTorch(num_groups: int = 32,
                   name: Optional[str] = None) -> nn.GroupNorm:
    """GroupNorm(32, C) factory with torch defaults (affine, eps 1e-5)."""
    return nn.GroupNorm(num_groups=num_groups, epsilon=1e-5, name=name)


class InstanceNorm(nn.Module):
    """InstanceNorm2d(affine=False) == per-sample, per-channel spatial norm."""

    @nn.compact
    def __call__(self, x):
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        var = jnp.var(x, axis=(1, 2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + 1e-5)


class Dense(nn.Module):
    """Pointwise linear over the last axis (== Conv1d kernel-size 1 in the
    reference, network/mlp.py:31), with optional torch-style weight_norm
    (per-output-channel norm, dim=0)."""

    features: int
    use_weight_norm: bool = False

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        if self.use_weight_norm:
            v = self.param("v", nn.initializers.lecun_normal(),
                           (in_ch, self.features))
            g = self.param("g", nn.initializers.ones, (self.features,))
            norm = jnp.sqrt(jnp.sum(v * v, axis=0, keepdims=True))
            kernel = v * (g[None, :] / jnp.maximum(norm, 1e-12))
        else:
            kernel = self.param("kernel", nn.initializers.lecun_normal(),
                                (in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return jnp.matmul(x, kernel) + b
