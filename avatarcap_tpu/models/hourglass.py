"""Stacked-hourglass image encoder (PIFuHD-style).

Parity with the reference HGFilter (reference network/HGFilters.py:33-219)
in the configuration ReconNet uses: stack=1, depth=4, group norm,
down_type='no_down', use_sigmoid=False (reference network/arch_recon.py:28).
The dead ``down_type == ['conv64','conv128']`` branch (HGFilters.py:182 —
comparing a string to a list, always False) is intentionally not
reproduced; only the live 'no_down' / 'ave_pool' paths exist.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from avatarcap_tpu.models.layers import (
    Conv, GroupNormTorch, avg_pool_2x, upsample_bicubic_x2_align_corners)


def _norm(norm: str, name: str):
    if norm == "group":
        return GroupNormTorch(num_groups=32, name=name)
    # 'batch' norm in the reference is only used by configs we don't ship;
    # group norm is the live path. Fall back to GroupNorm(32) regardless.
    return GroupNormTorch(num_groups=32, name=name)


class ConvBlock(nn.Module):
    """3-way split residual block (reference network/HGFilters.py:33-75)."""

    in_planes: int
    out_planes: int
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        o2 = self.out_planes // 2
        o4 = self.out_planes // 4
        out1 = Conv(o2, kernel=3, stride=1, padding=1, use_bias=False,
                    name="conv1")(jax.nn.relu(_norm(self.norm, "bn1")(x)))
        out2 = Conv(o4, kernel=3, stride=1, padding=1, use_bias=False,
                    name="conv2")(jax.nn.relu(_norm(self.norm, "bn2")(out1)))
        out3 = Conv(o4, kernel=3, stride=1, padding=1, use_bias=False,
                    name="conv3")(jax.nn.relu(_norm(self.norm, "bn3")(out2)))
        out = jnp.concatenate([out1, out2, out3], axis=-1)
        if self.in_planes != self.out_planes:
            residual = Conv(self.out_planes, kernel=1, stride=1, padding=0,
                            use_bias=False, name="downsample_conv")(
                jax.nn.relu(_norm(self.norm, "bn4")(x)))
        else:
            residual = x
        return out + residual


class HourGlass(nn.Module):
    """Recursive hourglass, depth-d, bicubic align_corners upsampling
    (reference network/HGFilters.py:77-121)."""

    depth: int = 4
    features: int = 256
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        f = self.features

        def level(lvl, inp):
            up1 = ConvBlock(f, f, self.norm, name=f"b1_{lvl}")(inp)
            low1 = avg_pool_2x(inp)
            low1 = ConvBlock(f, f, self.norm, name=f"b2_{lvl}")(low1)
            if lvl > 1:
                low2 = level(lvl - 1, low1)
            else:
                low2 = ConvBlock(f, f, self.norm, name=f"b2_plus_{lvl}")(low1)
            low3 = ConvBlock(f, f, self.norm, name=f"b3_{lvl}")(low2)
            up2 = upsample_bicubic_x2_align_corners(low3)
            return up1 + up2

        return level(self.depth, x)


class HGFilter(nn.Module):
    """Hourglass image filter (reference network/HGFilters.py:124-219).

    Returns (list of per-stack feature maps, normx).
    """

    n_stack: int = 1
    depth: int = 4
    last_ch: int = 32
    norm: str = "group"
    down_type: str = "no_down"
    use_sigmoid: bool = False

    @nn.compact
    def __call__(self, x) -> Tuple[Sequence[jnp.ndarray], jnp.ndarray]:
        x = Conv(64, kernel=7, stride=2, padding=3, use_bias=True,
                 name="conv1")(x)
        x = jax.nn.relu(_norm(self.norm, "bn1")(x))

        if self.down_type == "ave_pool":
            x = avg_pool_2x(ConvBlock(64, 128, self.norm, name="conv2")(x))
        elif self.down_type == "no_down":
            x = ConvBlock(64, 128, self.norm, name="conv2")(x)
        else:
            raise ValueError(f"unsupported down_type: {self.down_type}")

        normx = x
        x = ConvBlock(128, 128, self.norm, name="conv3")(x)
        x = ConvBlock(128, 256, self.norm, name="conv4")(x)

        previous = x
        outputs = []
        for i in range(self.n_stack):
            hg = HourGlass(self.depth, 256, self.norm, name=f"m{i}")(previous)
            ll = ConvBlock(256, 256, self.norm, name=f"top_m_{i}")(hg)
            ll = Conv(256, kernel=1, stride=1, padding=0, use_bias=True,
                      name=f"conv_last{i}")(ll)
            ll = jax.nn.relu(_norm(self.norm, f"bn_end{i}")(ll))
            tmp_out = Conv(self.last_ch, kernel=1, stride=1, padding=0,
                           use_bias=True, name=f"l{i}")(ll)
            outputs.append(jnp.tanh(tmp_out) if self.use_sigmoid else tmp_out)
            if i < self.n_stack - 1:
                ll = Conv(256, kernel=1, stride=1, padding=0, use_bias=True,
                          name=f"bl{i}")(ll)
                tmp_out_ = Conv(256, kernel=1, stride=1, padding=0,
                                use_bias=True, name=f"al{i}")(tmp_out)
                previous = previous + ll + tmp_out_
        return outputs, normx
