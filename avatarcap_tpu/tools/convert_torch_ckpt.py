"""PyTorch -> JAX checkpoint conversion for the released AvatarCap weights.

Maps the reference state_dict layouts (reference network/arch_avatar.py,
network/arch_recon.py, network/unets.py, network/mlp.py,
network/HGFilters.py, network/networks.py) onto the avatarcap_tpu flax
param/batch_stats trees. Conventions:

- torch Conv2d weight (O, I, kh, kw)        -> flax kernel (kh, kw, I, O)
- torch ConvTranspose2d weight (I, O, kh, kw)-> our kernel (kh, kw, I, O)
  (no spatial flip: our ConvTranspose flips at apply time)
- torch Conv1d k=1 weight (O, I, 1)         -> Dense kernel (I, O)
- torch weight_norm (weight_g, weight_v)    -> Dense (g, v)
- BatchNorm running stats                   -> 'batch_stats' collection
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def _np(t):
    import torch
    if isinstance(t, torch.Tensor):
        return t.detach().cpu().numpy()
    return np.asarray(t)


def conv2d(sd, name):
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0)}
    if f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def convtranspose2d(sd, name, bias=False):
    out = {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 0, 1)}
    if bias and f"{name}.bias" in sd:
        out["bias"] = _np(sd[f"{name}.bias"])
    return out


def dense_from_conv1d(sd, name):
    w = _np(sd[f"{name}.weight"])  # (O, I, 1)
    return {"kernel": w[:, :, 0].T, "bias": _np(sd[f"{name}.bias"])}


def dense_weightnorm_from_conv1d(sd, name):
    g = _np(sd[f"{name}.weight_g"])  # (O, 1, 1)
    v = _np(sd[f"{name}.weight_v"])  # (O, I, 1)
    return {"g": g[:, 0, 0], "v": v[:, :, 0].T,
            "bias": _np(sd[f"{name}.bias"])}


def bn_stats(sd, name):
    return {"mean": _np(sd[f"{name}.running_mean"]),
            "var": _np(sd[f"{name}.running_var"])}


def bn_affine(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


def groupnorm(sd, name):
    return {"scale": _np(sd[f"{name}.weight"]),
            "bias": _np(sd[f"{name}.bias"])}


# ---------------------------------------------------------------------------
# MLP / OffsetDecoder (reference network/mlp.py)
# ---------------------------------------------------------------------------

def convert_mlp(sd, prefix, n_layers, weight_norm=False):
    """fc_list.{i}.0 for hidden (Sequential conv+act), fc_list.{n} final."""
    params = {}
    for i in range(n_layers):
        name = f"{prefix}fc_list.{i}.0"
        if weight_norm:
            params[f"fc{i}"] = dense_weightnorm_from_conv1d(sd, name)
        else:
            params[f"fc{i}"] = dense_from_conv1d(sd, name)
    params[f"fc{n_layers}"] = dense_from_conv1d(sd, f"{prefix}fc_list.{n_layers}")
    return params


def convert_offset_decoder(sd, prefix):
    params, stats = {}, {}
    for i in range(1, 8):
        params[f"conv{i}"] = dense_from_conv1d(sd, f"{prefix}conv{i}")
        params[f"bn{i}"] = bn_affine(sd, f"{prefix}bn{i}")
        stats[f"bn{i}"] = bn_stats(sd, f"{prefix}bn{i}")
    return params, stats


# ---------------------------------------------------------------------------
# U-Nets (reference network/unets.py)
# ---------------------------------------------------------------------------

def _conv_block(sd, name, use_bn):
    params = {"conv": conv2d(sd, f"{name}.conv")}
    stats = {"bn": bn_stats(sd, f"{name}.bn")} if use_bn else None
    return params, stats


def _upconv_block(sd, name, use_bn, up_mode, use_bias=False):
    params, stats = {}, {}
    if up_mode == "upconv":
        params["up"] = convtranspose2d(sd, f"{name}.up", bias=use_bias)
    else:
        # torch: up = Sequential(Upsample, Conv2d) -> weights at .up.1
        params["up_conv"] = {
            "kernel": _np(sd[f"{name}.up.1.weight"]).transpose(2, 3, 1, 0),
            "bias": _np(sd[f"{name}.up.1.bias"])}
    if use_bn:
        stats["bn"] = bn_stats(sd, f"{name}.bn")
    return params, stats


def convert_unet7ds(sd, prefix=""):
    """Returns (params, batch_stats) for UnetNoCond7DS."""
    params, stats = {}, {}
    down_bn = {"conv1": False, "conv2": True, "conv3": True, "conv4": True,
               "conv5": True, "conv6": True, "conv7": False}
    for name, use_bn in down_bn.items():
        p, s = _conv_block(sd, prefix + name, use_bn)
        params[name] = p
        if s is not None:
            stats[name] = s
    for name in ("upconv1", "upconv2", "upconv3"):
        p, s = _upconv_block(sd, prefix + name, True, "upconv")
        params[name] = p
        stats[name] = s
    for name, use_bn in (("upconvC5", True), ("upconvC6", True),
                         ("upconvC7", False)):
        p, s = _upconv_block(sd, prefix + name, use_bn, "upsample")
        params[name] = p
        if use_bn:
            stats[name] = s
    # reference upconv4 params are dead (network/unets.py:214) — dropped.
    return params, stats


# ---------------------------------------------------------------------------
# GeoTexAvatar (reference network/arch_avatar.py)
# ---------------------------------------------------------------------------

def convert_doubletnet(sd, prefix="cano_template."):
    params = {
        "shared_mlp": convert_mlp(sd, f"{prefix}shared_mlp.", 6),
        "clr_mlp": convert_mlp(sd, f"{prefix}clr_mlp.", 2),
    }
    geo0 = dense_from_conv1d(sd, f"{prefix}geo_mlp.fc_list.0.0")
    geo1 = dense_from_conv1d(sd, f"{prefix}geo_mlp.fc_list.1")
    params["geo_mlp"] = {"fc0": geo0,
                         "fc1_kernel": geo1["kernel"],
                         "fc1_bias": geo1["bias"]}
    return params


def convert_warping_field(sd, prefix="warping_field."):
    unet_p, unet_s = convert_unet7ds(sd, f"{prefix}unet.")
    mlp_p, mlp_s = convert_offset_decoder(sd, f"{prefix}mlp.")
    out = dense_from_conv1d(sd, f"{prefix}out_layer_coord_affine")
    params = {"unet": unet_p, "mlp": mlp_p,
              "out_layer_coord_affine": out}
    stats = {"unet": unet_s, "mlp": mlp_s}
    return params, stats


def convert_geotex_avatar(sd) -> Dict:
    """Full reference 'network' state_dict -> flax variables dict."""
    wf_p, wf_s = convert_warping_field(sd)
    return {
        "params": {
            "cano_template": convert_doubletnet(sd),
            "warping_field": wf_p,
        },
        "batch_stats": {"warping_field": wf_s},
    }


# ---------------------------------------------------------------------------
# HGFilter / ReconNet (reference network/HGFilters.py, arch_recon.py)
# ---------------------------------------------------------------------------

def convert_hg_convblock(sd, name, in_planes, out_planes):
    params = {}
    for i in (1, 2, 3):
        params[f"conv{i}"] = conv2d(sd, f"{name}.conv{i}")
        params[f"bn{i}"] = groupnorm(sd, f"{name}.bn{i}")
    if in_planes != out_planes:
        params["bn4"] = groupnorm(sd, f"{name}.downsample.0")
        params["downsample_conv"] = {
            "kernel": _np(sd[f"{name}.downsample.2.weight"]).transpose(2, 3, 1, 0)}
    return params


def convert_hourglass(sd, name, depth=4):
    params = {}
    for lvl in range(depth, 0, -1):
        params[f"b1_{lvl}"] = convert_hg_convblock(sd, f"{name}.b1_{lvl}", 256, 256)
        params[f"b2_{lvl}"] = convert_hg_convblock(sd, f"{name}.b2_{lvl}", 256, 256)
        params[f"b3_{lvl}"] = convert_hg_convblock(sd, f"{name}.b3_{lvl}", 256, 256)
    params["b2_plus_1"] = convert_hg_convblock(sd, f"{name}.b2_plus_1", 256, 256)
    return params


def convert_hgfilter(sd, prefix="", n_stack=1):
    params = {"conv1": conv2d(sd, f"{prefix}conv1"),
              "bn1": groupnorm(sd, f"{prefix}bn1"),
              "conv2": convert_hg_convblock(sd, f"{prefix}conv2", 64, 128),
              "conv3": convert_hg_convblock(sd, f"{prefix}conv3", 128, 128),
              "conv4": convert_hg_convblock(sd, f"{prefix}conv4", 128, 256)}
    for i in range(n_stack):
        params[f"m{i}"] = convert_hourglass(sd, f"{prefix}m{i}")
        params[f"top_m_{i}"] = convert_hg_convblock(sd, f"{prefix}top_m_{i}",
                                                    256, 256)
        params[f"conv_last{i}"] = conv2d(sd, f"{prefix}conv_last{i}")
        params[f"bn_end{i}"] = groupnorm(sd, f"{prefix}bn_end{i}")
        params[f"l{i}"] = conv2d(sd, f"{prefix}l{i}")
    return params


def convert_recon_network(sd) -> Dict:
    dec = {}
    for i in range(3):
        dec[f"fc{i}"] = dense_weightnorm_from_conv1d(
            sd, f"image_decoder.fc_list.{i}.0")
    dec["fc3"] = dense_from_conv1d(sd, "image_decoder.fc_list.3")
    return {"params": {
        "image_encoder": convert_hgfilter(sd, "image_encoder."),
        "image_decoder": dec,
    }}


# ---------------------------------------------------------------------------
# pix2pixHD GlobalGenerator (reference network/networks.py:133-163)
# ---------------------------------------------------------------------------

def convert_global_generator(sd, prefix="", n_downsampling=4, n_blocks=9,
                             include_out=True):
    def plain_conv(name):
        return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{name}.bias"])}

    params = {"conv_in": plain_conv(f"{prefix}model.1")}
    idx = 4
    for i in range(n_downsampling):
        params[f"down{i}"] = plain_conv(f"{prefix}model.{idx}")
        idx += 3
    for i in range(n_blocks):
        params[f"res{i}"] = {
            "conv1": plain_conv(f"{prefix}model.{idx}.conv_block.1"),
            "conv2": plain_conv(f"{prefix}model.{idx}.conv_block.5"),
        }
        idx += 1
    for i in range(n_downsampling):
        w = _np(sd[f"{prefix}model.{idx}.weight"]).transpose(2, 3, 0, 1)
        params[f"up{i}"] = {"kernel": w,
                            "bias": _np(sd[f"{prefix}model.{idx}.bias"])}
        idx += 3
    if include_out:
        # truncated trunks (LocalEnhancer's global branch,
        # reference networks.py:86-88) have no final pad/conv/tanh
        params["conv_out"] = plain_conv(f"{prefix}model.{idx + 1}")
    return {"params": params}


def convert_local_enhancer(sd, n_local_enhancers=1, n_downsample_global=3,
                           n_blocks_global=9, n_blocks_local=3):
    """pix2pixHD LocalEnhancer (reference network/networks.py:79-131)."""
    def plain_conv(name):
        return {"kernel": _np(sd[f"{name}.weight"]).transpose(2, 3, 1, 0),
                "bias": _np(sd[f"{name}.bias"])}

    params = {"global": convert_global_generator(
        sd, prefix="", n_downsampling=n_downsample_global,
        n_blocks=n_blocks_global, include_out=False)["params"]}
    for n in range(1, n_local_enhancers + 1):
        params[f"enh{n}_conv_in"] = plain_conv(f"model{n}_1.1")
        params[f"enh{n}_down"] = plain_conv(f"model{n}_1.4")
        for i in range(n_blocks_local):
            params[f"enh{n}_res{i}"] = {
                "conv1": plain_conv(f"model{n}_2.{i}.conv_block.1"),
                "conv2": plain_conv(f"model{n}_2.{i}.conv_block.5"),
            }
        w = _np(sd[f"model{n}_2.{n_blocks_local}.weight"]) \
            .transpose(2, 3, 0, 1)
        params[f"enh{n}_up"] = {
            "kernel": w,
            "bias": _np(sd[f"model{n}_2.{n_blocks_local}.bias"])}
        if n == n_local_enhancers:
            params[f"enh{n}_conv_out"] = plain_conv(
                f"model{n}_2.{n_blocks_local + 4}")
    return {"params": params}


def convert_encoder(sd, n_downsampling=4):
    """pix2pixHD Encoder (reference network/networks.py:207-228): same
    sequential layout as GlobalGenerator with zero resnet blocks."""
    return convert_global_generator(sd, n_downsampling=n_downsampling,
                                    n_blocks=0)


def load_torch_state_dict(path: str, key: str = "network"):
    """Load a reference checkpoint file (net.pt / recon_net.pt)."""
    import torch
    data = torch.load(path, map_location="cpu", weights_only=False)
    return data[key] if key in data else data
