"""POP-style U-Nets for pose feature maps.

Architecture parity with the reference (network/unets.py), including its
known quirk: UnetNoCond7DS applies ``upconv3`` twice and never ``upconv4``
(reference network/unets.py:214) — the released checkpoints were trained
with that wiring and the channel plan depends on it (upconvC5 expects
4*nf*3 = 256+128 inputs), so we replicate it and simply never create the
dead ``upconv4`` parameters.

All convs are NHWC. BatchNorm is non-affine (reference network/unets.py:17).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from avatarcap_tpu.models.layers import (
    Conv, ConvTranspose, BatchNorm, leaky_relu, upsample_bilinear_x2)


class Conv2DBlock(nn.Module):
    """[LeakyReLU(0.2)] -> Conv(k4 s2 p1, no bias) -> [BN(non-affine)]
    (reference network/unets.py:10-26)."""

    features: int
    use_bn: bool = True
    use_relu: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.use_relu:
            x = leaky_relu(x, 0.2)
        x = Conv(self.features, kernel=4, stride=2, padding=1,
                 use_bias=False, name="conv")(x)
        if self.use_bn:
            x = BatchNorm(affine=False, name="bn")(x, use_running_average=not train)
        return x


class UpConv2DBlock(nn.Module):
    """ReLU -> up (convT k4 s2 p1 | bilinear x2 + conv3x3) -> [BN] -> cat skip
    (reference network/unets.py:29-59)."""

    features: int
    use_bn: bool = True
    use_bias: bool = False
    up_mode: str = "upconv"

    @nn.compact
    def __call__(self, x, skip=None, train: bool = False):
        x = jax.nn.relu(x)
        if self.up_mode == "upconv":
            x = ConvTranspose(self.features, kernel=4, stride=2, padding=1,
                              use_bias=self.use_bias, name="up")(x)
        else:
            x = upsample_bilinear_x2(x)
            x = Conv(self.features, kernel=3, stride=1, padding=1,
                     use_bias=True, name="up_conv")(x)
        if self.use_bn:
            x = BatchNorm(affine=False, name="bn")(x, use_running_average=not train)
        if skip is not None:
            x = jnp.concatenate([x, skip], axis=-1)
        return x


class UnetNoCond5DS(nn.Module):
    """5-downsample variant (reference network/unets.py:62-109)."""

    output_nc: int = 3
    nf: int = 64
    up_mode: str = "upconv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        d1 = Conv2DBlock(nf, use_bn=False, use_relu=False, name="conv1")(x, train)
        d2 = Conv2DBlock(2 * nf, name="conv2")(d1, train)
        d3 = Conv2DBlock(4 * nf, name="conv3")(d2, train)
        d4 = Conv2DBlock(8 * nf, name="conv4")(d3, train)
        d5 = Conv2DBlock(8 * nf, use_bn=False, name="conv5")(d4, train)

        u1 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv1")(d5, d4, train)
        u2 = UpConv2DBlock(4 * nf, up_mode=self.up_mode, name="upconv2")(u1, d3, train)
        u3 = UpConv2DBlock(2 * nf, up_mode=self.up_mode, name="upconv3")(u2, d2, train)
        u4 = UpConv2DBlock(1 * nf, up_mode=self.up_mode, name="upconv4")(u3, d1, train)
        u5 = UpConv2DBlock(self.output_nc, use_bn=False, use_bias=True,
                           up_mode=self.up_mode, name="upconv5")(u4, None, train)
        return u5


class UnetNoCond6DS(nn.Module):
    """6-downsample variant (reference network/unets.py:112-166)."""

    output_nc: int = 3
    nf: int = 64
    up_mode: str = "upconv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        d1 = Conv2DBlock(nf, use_bn=False, use_relu=False, name="conv1")(x, train)
        d2 = Conv2DBlock(2 * nf, name="conv2")(d1, train)
        d3 = Conv2DBlock(4 * nf, name="conv3")(d2, train)
        d4 = Conv2DBlock(8 * nf, name="conv4")(d3, train)
        d5 = Conv2DBlock(8 * nf, name="conv5")(d4, train)
        d6 = Conv2DBlock(8 * nf, use_bn=False, name="conv6")(d5, train)

        u1 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv1")(d6, d5, train)
        u2 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv2")(u1, d4, train)
        u3 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv3")(u2, d3, train)
        u4 = UpConv2DBlock(4 * nf, up_mode=self.up_mode, name="upconv4")(u3, d2, train)
        uc5 = UpConv2DBlock(2 * nf, up_mode="upsample", name="upconvC5")(u4, d1, train)
        uc6 = UpConv2DBlock(self.output_nc, use_bn=False, use_bias=True,
                            up_mode="upsample", name="upconvC6")(uc5, None, train)
        return uc6


class UnetNoCond7DS(nn.Module):
    """7-downsample variant used by the warping field
    (reference network/unets.py:169-229, constructed at arch_avatar.py:95
    with input 6ch, output 64ch, nf 32).

    256x256 input -> 2x2 bottleneck -> 256x256 x output_nc feature map.
    """

    output_nc: int = 64
    nf: int = 32
    up_mode: str = "upconv"

    @nn.compact
    def __call__(self, x, train: bool = False):
        nf = self.nf
        d1 = Conv2DBlock(nf, use_bn=False, use_relu=False, name="conv1")(x, train)
        d2 = Conv2DBlock(2 * nf, name="conv2")(d1, train)
        d3 = Conv2DBlock(4 * nf, name="conv3")(d2, train)
        d4 = Conv2DBlock(8 * nf, name="conv4")(d3, train)
        d5 = Conv2DBlock(8 * nf, name="conv5")(d4, train)
        d6 = Conv2DBlock(8 * nf, name="conv6")(d5, train)
        d7 = Conv2DBlock(8 * nf, use_bn=False, name="conv7")(d6, train)

        upconv3 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv3")
        u1 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv1")(d7, d6, train)
        u2 = UpConv2DBlock(8 * nf, up_mode=self.up_mode, name="upconv2")(u1, d5, train)
        u3 = upconv3(u2, d4, train)
        # Reference quirk: upconv3 applied again (network/unets.py:214);
        # the same parameters are shared between both applications.
        u4 = upconv3(u3, d3, train)

        uc5 = UpConv2DBlock(2 * nf, up_mode="upsample", name="upconvC5")(u4, d2, train)
        uc6 = UpConv2DBlock(1 * nf, up_mode="upsample", name="upconvC6")(uc5, d1, train)
        uc7 = UpConv2DBlock(self.output_nc, use_bn=False, use_bias=True,
                            up_mode="upsample", name="upconvC7")(uc6, None, train)
        return uc7
