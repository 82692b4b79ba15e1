"""ReconNet: PIFuHD-style pixel-aligned implicit reconstruction.

Parity with the reference ReconNetwork (reference network/arch_recon.py:9-76):
HGFilter encoder over concatenated front/back normal maps (6ch, 512^2 ->
256^2 x 32ch) and a weight-normalized residual MLP decoder over
[pixel-aligned feature, z].

TPU-first difference: ``infer`` evaluates the full (padded) point set in one
jitted call — sharding replaces the reference's 262,144-point host chunk
loop (reference arch_recon.py:47-73).
"""

from __future__ import annotations

import jax.numpy as jnp
import flax.linen as nn

from avatarcap_tpu.models.hourglass import HGFilter
from avatarcap_tpu.models.mlp import MLP
from avatarcap_tpu.ops.grid_sample import sample_feature_map_at_points


class ReconNetwork(nn.Module):
    feat_channels: int = 32

    def setup(self):
        self.image_encoder = HGFilter(
            n_stack=1, depth=4, last_ch=self.feat_channels, norm="group",
            down_type="no_down", use_sigmoid=False, name="image_encoder")
        self.image_decoder = MLP(
            out_channels=1, inter_channels=(512, 256, 128),
            res_layers=(1, 2), nlactv="leaky_relu", last_op="sigmoid",
            weight_norm=True, name="image_decoder")

    def get_feat_maps(self, image: jnp.ndarray) -> jnp.ndarray:
        """image: (B, H, W, 6) NHWC -> last stack feature (B, H/2, W/2, C)."""
        feat_maps, _ = self.image_encoder(image)
        return feat_maps[-1]

    def decode_points(self, feat_map: jnp.ndarray, cano_pts: jnp.ndarray,
                      cano_smpl_center: jnp.ndarray) -> jnp.ndarray:
        """Pixel-aligned occupancy decode (reference arch_recon.py:58-71).

        Args:
          feat_map: (B, Hf, Wf, C).
          cano_pts: (B, N, 3).
          cano_smpl_center: (B, 3).
        Returns:
          (B, N) occupancy in [0, 1].
        """
        pts_c = cano_pts - cano_smpl_center[:, None, :]
        feat_nchw = jnp.moveaxis(feat_map, -1, 1)
        pix_feat = sample_feature_map_at_points(feat_nchw, pts_c)  # (B,N,C)
        z = pts_c[..., 2:3]
        h = jnp.concatenate([pix_feat, z], axis=-1)
        return self.image_decoder(h)[..., 0]

    def __call__(self, image: jnp.ndarray, cano_pts: jnp.ndarray,
                 cano_smpl_center: jnp.ndarray) -> jnp.ndarray:
        """Full infer path: encode image once, decode all points."""
        feat_map = self.get_feat_maps(image)
        return self.decode_points(feat_map, cano_pts, cano_smpl_center)
