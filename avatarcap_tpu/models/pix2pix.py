"""pix2pixHD-style generators for normal-map inference.

Parity with the reference generator family (reference network/networks.py:
48-242). Only the GlobalGenerator is used by the pipeline (normal estimation
in real-data preprocessing, reference gen_data/preprocess_real_data.py:53
with define_G(3,3,64,'global',4,9,...,'instance')); the LocalEnhancer and
Encoder variants exist in the reference but are unused, so we ship the used
one and keep the factory extensible.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from avatarcap_tpu.models.layers import (
    Conv, InstanceNorm, reflection_pad_2d)


class ResnetBlock(nn.Module):
    """Reflect-padded residual block (reference network/networks.py:166-205)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        h = reflection_pad_2d(x, 1)
        h = Conv(self.dim, kernel=3, stride=1, padding=0, name="conv1")(h)
        h = InstanceNorm()(h)
        h = jax.nn.relu(h)
        h = reflection_pad_2d(h, 1)
        h = Conv(self.dim, kernel=3, stride=1, padding=0, name="conv2")(h)
        h = InstanceNorm()(h)
        return x + h


class GlobalGenerator(nn.Module):
    """ReflectionPad 7x7 -> n down -> n_blocks resnet -> n up -> 7x7 [tanh]
    (reference network/networks.py:133-163)."""

    output_nc: int = 3
    ngf: int = 64
    n_downsampling: int = 4
    n_blocks: int = 9
    last_op: str = "tanh"

    @nn.compact
    def __call__(self, x):
        h = reflection_pad_2d(x, 3)
        h = Conv(self.ngf, kernel=7, stride=1, padding=0, name="conv_in")(h)
        h = InstanceNorm()(h)
        h = jax.nn.relu(h)
        for i in range(self.n_downsampling):
            mult = 2 ** i
            h = Conv(self.ngf * mult * 2, kernel=3, stride=2, padding=1,
                     name=f"down{i}")(h)
            h = InstanceNorm()(h)
            h = jax.nn.relu(h)
        mult = 2 ** self.n_downsampling
        for i in range(self.n_blocks):
            h = ResnetBlock(self.ngf * mult, name=f"res{i}")(h)
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            # torch ConvTranspose2d(k3, s2, p1, output_padding=1): adjoint
            # geometry with asymmetric padding (k-1-p, k-1-p+out_pad).
            h = ConvTransposeOutPad1(self.ngf * mult // 2, name=f"up{i}")(h)
            h = InstanceNorm()(h)
            h = jax.nn.relu(h)
        h = reflection_pad_2d(h, 3)
        h = Conv(self.output_nc, kernel=7, stride=1, padding=0,
                 name="conv_out")(h)
        if self.last_op == "tanh":
            h = jnp.tanh(h)
        return h


class ConvTransposeOutPad1(nn.Module):
    """ConvTranspose2d(k=3, s=2, p=1, output_padding=1) torch parity:
    out = 2*in. Input-dilated conv with pad (k-1-p, k-1-p+1)."""

    features: int

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        k = 3
        w = self.param("kernel", nn.initializers.lecun_normal(),
                       (k, k, in_ch, self.features))
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        pad_lo = k - 1 - 1
        pad_hi = k - 1 - 1 + 1
        y = jax.lax.conv_general_dilated(
            x, jnp.flip(w, axis=(0, 1)),
            window_strides=(1, 1),
            padding=((pad_lo, pad_hi), (pad_lo, pad_hi)),
            lhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b
