"""Network parity: random-weight reference torch modules vs converted flax.

These tests import the reference's torch-only module files as *oracles*
(they are never shipped); if /root/reference is absent the tests skip.
Passing means both the architecture reimplementation AND the checkpoint
converter are correct, so released checkpoints will reproduce.
"""

import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference repo not mounted")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.insert(0, REF)


def to_nhwc(x):
    return np.moveaxis(x, 1, -1)


def from_nhwc(x):
    return np.moveaxis(np.asarray(x), -1, 1)


@pytest.fixture(autouse=True)
def _seed():
    torch.manual_seed(31359)
    np.random.seed(31359)


class TestMLPParity:
    def test_plain_mlp(self):
        from network.mlp import MLP as TorchMLP
        from avatarcap_tpu.models.mlp import MLP
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_mlp

        tm = TorchMLP(63, 256, [256] * 6, res_layers=[4], nlactv="relu",
                      last_op=None, norm=None).eval()
        x = np.random.randn(2, 63, 100).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        m = MLP(out_channels=256, inter_channels=(256,) * 6, res_layers=(4,),
                nlactv="relu")
        params = convert_mlp(tm.state_dict(), "", 6)
        got = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                                   atol=2e-5)

    def test_weightnorm_leaky_sigmoid(self):
        from network.mlp import MLP as TorchMLP
        from avatarcap_tpu.models.mlp import MLP
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_mlp

        tm = TorchMLP(33, 1, [512, 256, 128], res_layers=[1, 2],
                      nlactv="leaky_relu", last_op="sigmoid",
                      norm="weight").eval()
        x = np.random.randn(1, 33, 64).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = MLP(out_channels=1, inter_channels=(512, 256, 128),
                res_layers=(1, 2), nlactv="leaky_relu", last_op="sigmoid",
                weight_norm=True)
        params = convert_mlp(tm.state_dict(), "", 3, weight_norm=True)
        got = m.apply({"params": params}, jnp.asarray(x.transpose(0, 2, 1)))
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                                   atol=2e-5)

    def test_offset_decoder_eval(self):
        from network.mlp import OffsetDecoder as TorchOD
        from avatarcap_tpu.models.mlp import OffsetDecoder
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_offset_decoder

        tm = TorchOD(67).eval()
        # make running stats non-trivial
        with torch.no_grad():
            for _ in range(3):
                tm.train()(torch.randn(2, 67, 50))
            tm.eval()
        x = np.random.randn(2, 67, 40).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = OffsetDecoder()
        params, stats = convert_offset_decoder(tm.state_dict(), "")
        got = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x.transpose(0, 2, 1)), train=False)
        # rsqrt-vs-div rounding through 7 BN layers: allow f32 noise
        np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                                   atol=5e-4)


class TestUnetParity:
    def test_unet7ds_eval(self):
        from network.unets import UnetNoCond7DS as TorchUnet
        from avatarcap_tpu.models.unets import UnetNoCond7DS
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_unet7ds

        tm = TorchUnet(input_nc=6, output_nc=64, nf=32, up_mode="upconv",
                       use_dropout=False)
        with torch.no_grad():
            for _ in range(2):
                tm.train()(torch.randn(2, 6, 128, 128))
            tm.eval()
        x = np.random.randn(1, 6, 256, 256).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()

        m = UnetNoCond7DS(output_nc=64, nf=32)
        params, stats = convert_unet7ds(tm.state_dict())
        got = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(to_nhwc(x)), train=False)
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)


class TestUnet56Parity:
    @pytest.mark.parametrize("variant", ["5DS", "6DS"])
    def test_unet_small_variants(self, variant):
        import network.unets as tu
        import avatarcap_tpu.models.unets as mu
        from avatarcap_tpu.tools.convert_torch_ckpt import (
            _conv_block, _upconv_block)

        if variant == "5DS":
            tm = tu.UnetNoCond5DS(input_nc=3, output_nc=3, nf=16)
            m = mu.UnetNoCond5DS(output_nc=3, nf=16)
            size = 64
            down_bn = {"conv1": False, "conv2": True, "conv3": True,
                       "conv4": True, "conv5": False}
            ups = [("upconv1", True, "upconv", False),
                   ("upconv2", True, "upconv", False),
                   ("upconv3", True, "upconv", False),
                   ("upconv4", True, "upconv", False),
                   ("upconv5", False, "upconv", True)]
        else:
            tm = tu.UnetNoCond6DS(input_nc=3, output_nc=3, nf=16)
            m = mu.UnetNoCond6DS(output_nc=3, nf=16)
            size = 128
            down_bn = {"conv1": False, "conv2": True, "conv3": True,
                       "conv4": True, "conv5": True, "conv6": False}
            ups = [("upconv1", True, "upconv", False),
                   ("upconv2", True, "upconv", False),
                   ("upconv3", True, "upconv", False),
                   ("upconv4", True, "upconv", False),
                   ("upconvC5", True, "upsample", False),
                   ("upconvC6", False, "upsample", True)]
        with torch.no_grad():
            for _ in range(2):
                tm.train()(torch.randn(2, 3, size, size))
            tm.eval()
        sd = tm.state_dict()
        params, stats = {}, {}
        for name, use_bn in down_bn.items():
            pr, st = _conv_block(sd, name, use_bn)
            params[name] = pr
            if st is not None:
                stats[name] = st
        for name, use_bn, mode, use_bias in ups:
            pr, st = _upconv_block(sd, name, use_bn, mode, use_bias)
            params[name] = pr
            if use_bn:
                stats[name] = st
        x = np.random.randn(1, 3, size, size).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        got = m.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(to_nhwc(x)), train=False)
        np.testing.assert_allclose(from_nhwc(got), ref, atol=2e-4)


class TestLayerPrimitives:
    def test_conv_transpose_k4s2p1(self):
        import torch.nn as tnn
        from avatarcap_tpu.models.layers import ConvTranspose
        tm = tnn.ConvTranspose2d(8, 16, 4, 2, 1, bias=True)
        x = np.random.randn(2, 8, 10, 12).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = ConvTranspose(16, kernel=4, stride=2, padding=1, use_bias=True)
        params = {"kernel": tm.weight.detach().numpy().transpose(2, 3, 0, 1),
                  "bias": tm.bias.detach().numpy()}
        got = m.apply({"params": params}, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)

    def test_conv_transpose_k3s2p1op1(self):
        import torch.nn as tnn
        from avatarcap_tpu.models.pix2pix import ConvTransposeOutPad1
        tm = tnn.ConvTranspose2d(6, 3, 3, 2, 1, output_padding=1)
        x = np.random.randn(1, 6, 9, 7).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = ConvTransposeOutPad1(3)
        params = {"kernel": tm.weight.detach().numpy().transpose(2, 3, 0, 1),
                  "bias": tm.bias.detach().numpy()}
        got = m.apply({"params": params}, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)

    def test_bilinear_upsample(self):
        import torch.nn.functional as F
        from avatarcap_tpu.models.layers import upsample_bilinear_x2
        x = np.random.randn(2, 3, 7, 9).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                            mode="bilinear", align_corners=False).numpy()
        got = upsample_bilinear_x2(jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-5)

    def test_bicubic_upsample_align_corners(self):
        import torch.nn.functional as F
        from avatarcap_tpu.models.layers import upsample_bicubic_x2_align_corners
        x = np.random.randn(2, 3, 8, 6).astype(np.float32)
        ref = F.interpolate(torch.from_numpy(x), scale_factor=2,
                            mode="bicubic", align_corners=True).numpy()
        got = upsample_bicubic_x2_align_corners(jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)

    def test_instance_norm(self):
        import torch.nn as tnn
        from avatarcap_tpu.models.layers import InstanceNorm
        tm = tnn.InstanceNorm2d(5, affine=False)
        x = np.random.randn(2, 5, 6, 7).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        got = InstanceNorm().apply({}, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-5)


class TestHGFilterParity:
    def test_hgfilter_recon_config(self):
        from network.HGFilters import HGFilter as TorchHG
        from avatarcap_tpu.models.hourglass import HGFilter
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_hgfilter

        tm = TorchHG(1, 4, 6, 32, "group", "no_down", False).eval()
        x = np.random.randn(1, 6, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref_outs, ref_normx = tm(torch.from_numpy(x))

        m = HGFilter(n_stack=1, depth=4, last_ch=32, norm="group",
                     down_type="no_down", use_sigmoid=False)
        params = convert_hgfilter(tm.state_dict())
        outs, normx = m.apply({"params": params}, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(normx), ref_normx.numpy(),
                                   atol=2e-4)
        np.testing.assert_allclose(from_nhwc(outs[-1]), ref_outs[-1].numpy(),
                                   atol=2e-4)


class TestPix2PixParity:
    def test_global_generator(self):
        from network.networks import define_G
        from avatarcap_tpu.models.pix2pix import GlobalGenerator
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_global_generator

        tm = define_G(3, 3, 64, "global", 4, 9, 1, 3, "instance").eval()
        x = np.random.randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = GlobalGenerator(output_nc=3, ngf=64, n_downsampling=4, n_blocks=9)
        variables = convert_global_generator(tm.state_dict())
        got = m.apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)

    def test_local_enhancer(self):
        """LocalEnhancer variant (reference networks.py:79-131) — unused
        by the pipeline but part of the define_G surface."""
        from network.networks import define_G
        from avatarcap_tpu.models.pix2pix import LocalEnhancer
        from avatarcap_tpu.tools.convert_torch_ckpt import \
            convert_local_enhancer

        tm = define_G(3, 3, 32, "local", 3, 9, 1, 3, "instance").eval()
        x = np.random.randn(1, 3, 64, 64).astype(np.float32)
        with torch.no_grad():
            ref = tm(torch.from_numpy(x)).numpy()
        m = LocalEnhancer(output_nc=3, ngf=32)
        variables = convert_local_enhancer(tm.state_dict())
        got = m.apply(variables, jnp.asarray(to_nhwc(x)))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)

    def test_encoder(self):
        """Encoder variant with instance-wise average pooling (reference
        networks.py:207-242)."""
        from network.networks import define_G
        from avatarcap_tpu.models.pix2pix import Encoder
        from avatarcap_tpu.tools.convert_torch_ckpt import convert_encoder

        tm = define_G(3, 3, 32, "encoder", 4, norm="instance").eval()
        x = np.random.randn(1, 3, 64, 64).astype(np.float32)
        inst = np.random.randint(0, 4, (1, 1, 64, 64))
        with torch.no_grad():
            ref = tm(torch.from_numpy(x),
                     torch.from_numpy(inst)).numpy()
        m = Encoder(output_nc=3, ngf=32, n_downsampling=4)
        variables = convert_encoder(tm.state_dict())
        got = m.apply(variables, jnp.asarray(to_nhwc(x)),
                      jnp.asarray(inst[:, 0]))
        np.testing.assert_allclose(from_nhwc(got), ref, atol=1e-4)
