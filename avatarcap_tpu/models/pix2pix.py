"""pix2pixHD-style generators for normal-map inference.

Parity with the reference generator family (reference network/networks.py:
48-242): GlobalGenerator (the one the pipeline uses — normal estimation in
real-data preprocessing, reference gen_data/preprocess_real_data.py:53 with
define_G(3,3,64,'global',4,9,...,'instance')), plus the LocalEnhancer
(networks.py:79-131) and Encoder (networks.py:207-242) variants the
reference ships but never calls — converted and parity-tested so the full
define_G surface is available.
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
    include_out: bool = True  # False = trunk only (LocalEnhancer drops the
    # final pad/conv/tanh, reference networks.py:86-88)

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
        if not self.include_out:
            return h
        h = reflection_pad_2d(h, 3)
        h = Conv(self.output_nc, kernel=7, stride=1, padding=0,
                 name="conv_out")(h)
        if self.last_op == "tanh":
            h = jnp.tanh(h)
        return h


def _avg_pool_3s2_nopad_count(x: jnp.ndarray) -> jnp.ndarray:
    """AvgPool2d(3, stride=2, padding=1, count_include_pad=False) parity
    (reference networks.py:113)."""
    s = jax.lax.reduce_window(x, 0.0, jax.lax.add, (1, 3, 3, 1),
                              (1, 2, 2, 1), ((0, 0), (1, 1), (1, 1), (0, 0)))
    ones = jnp.ones(x.shape[:3] + (1,), x.dtype)
    cnt = jax.lax.reduce_window(ones, 0.0, jax.lax.add, (1, 3, 3, 1),
                                (1, 2, 2, 1),
                                ((0, 0), (1, 1), (1, 1), (0, 0)))
    return s / cnt


class LocalEnhancer(nn.Module):
    """Coarse GlobalGenerator trunk + local enhancer branches
    (reference network/networks.py:79-131). define_G('local') defaults:
    ngf=32, 3 global downsamples, 9 global blocks, 1 enhancer, 3 local
    blocks, instance norm."""

    output_nc: int = 3
    ngf: int = 32
    n_downsample_global: int = 3
    n_blocks_global: int = 9
    n_local_enhancers: int = 1
    n_blocks_local: int = 3

    @nn.compact
    def __call__(self, x):
        NL = self.n_local_enhancers
        pyramid = [x]
        for _ in range(NL):
            pyramid.append(_avg_pool_3s2_nopad_count(pyramid[-1]))

        h = GlobalGenerator(output_nc=self.output_nc,
                            ngf=self.ngf * (2 ** NL),
                            n_downsampling=self.n_downsample_global,
                            n_blocks=self.n_blocks_global,
                            include_out=False, name="global")(pyramid[-1])

        for n in range(1, NL + 1):
            ngf_g = self.ngf * (2 ** (NL - n))
            xin = pyramid[NL - n]
            d = reflection_pad_2d(xin, 3)
            d = Conv(ngf_g, kernel=7, stride=1, padding=0,
                     name=f"enh{n}_conv_in")(d)
            d = InstanceNorm()(d)
            d = jax.nn.relu(d)
            d = Conv(ngf_g * 2, kernel=3, stride=2, padding=1,
                     name=f"enh{n}_down")(d)
            d = InstanceNorm()(d)
            d = jax.nn.relu(d)
            h = d + h
            for i in range(self.n_blocks_local):
                h = ResnetBlock(ngf_g * 2, name=f"enh{n}_res{i}")(h)
            h = ConvTransposeOutPad1(ngf_g, name=f"enh{n}_up")(h)
            h = InstanceNorm()(h)
            h = jax.nn.relu(h)
            if n == NL:
                h = reflection_pad_2d(h, 3)
                h = Conv(self.output_nc, kernel=7, stride=1, padding=0,
                         name=f"enh{n}_conv_out")(h)
                h = jnp.tanh(h)
        return h


class Encoder(nn.Module):
    """Feature encoder with instance-wise average pooling
    (reference network/networks.py:207-242). `inst` carries integer
    instance ids; every pixel's output is replaced by the mean feature of
    its instance region (per batch item, per channel)."""

    output_nc: int = 3
    ngf: int = 32
    n_downsampling: int = 4
    max_instances: int = 64  # static segment capacity for jit

    @nn.compact
    def __call__(self, x, inst):
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
        for i in range(self.n_downsampling):
            mult = 2 ** (self.n_downsampling - i)
            h = ConvTransposeOutPad1(self.ngf * mult // 2,
                                     name=f"up{i}")(h)
            h = InstanceNorm()(h)
            h = jax.nn.relu(h)
        h = reflection_pad_2d(h, 3)
        h = Conv(self.output_nc, kernel=7, stride=1, padding=0,
                 name="conv_out")(h)
        h = jnp.tanh(h)

        # instance-wise average pooling (reference :233-242), as segment
        # means instead of the reference's python loop over unique ids
        B, H, W, C = h.shape
        ids = inst.reshape(B, H * W).astype(jnp.int32)
        ids = jnp.clip(ids, 0, self.max_instances - 1)
        flat = h.reshape(B, H * W, C)

        def per_item(f, i):
            ssum = jax.ops.segment_sum(f, i,
                                       num_segments=self.max_instances)
            cnt = jax.ops.segment_sum(jnp.ones((f.shape[0], 1), f.dtype), i,
                                      num_segments=self.max_instances)
            mean = ssum / jnp.maximum(cnt, 1.0)
            return mean[i]

        return jax.vmap(per_item)(flat, ids).reshape(B, H, W, C)


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
