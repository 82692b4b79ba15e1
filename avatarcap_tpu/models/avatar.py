"""GeoTexAvatar: canonical implicit template + pose-conditioned warp field.

TPU-first re-architecture of the reference GeoTexAvatar
(reference network/arch_avatar.py:26-237):

- Modules are pure flax.linen; there is no cached ``pose_feat_map`` module
  state (reference arch_avatar.py:107-111) — the pose feature map is an
  explicit activation computed once per pose and threaded through.
- No host-driven chunk loops: callers evaluate full padded point batches;
  sharding over devices replaces chunking (SURVEY §2.3).
- The LBS weight volume is data (a pytree leaf), not a module constant
  loaded from config inside a constructor (reference arch_avatar.py:174).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from avatarcap_tpu.models.mlp import MLP, OffsetDecoder
from avatarcap_tpu.models.unets import UnetNoCond7DS
from avatarcap_tpu.models.layers import Dense
from avatarcap_tpu.ops.embed import positional_encoding
from avatarcap_tpu.ops.grid_sample import (
    grid_sample_3d, sample_feature_map_at_points)


def tiny_uniform_init(scale: float = 1e-5):
    """U(-1e-5, 1e-5) output-layer init (reference arch_avatar.py:17-23)."""
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -scale, scale)
    return init


class DoubleTNet(nn.Module):
    """Canonical geometry+texture template (reference arch_avatar.py:26-83).

    PE(10) -> shared MLP 63->[256 x6, res@4]->256; geo head -> (sdf|occ,
    density); color head -> rgb.
    """

    pos_encoding: int = 10
    if_type: str = "sdf"

    @nn.compact
    def __call__(self, pts: jnp.ndarray):
        """pts: (..., N, 3) -> rgb (..., N, 3), alpha (..., N, 1),
        occ (..., N, 1)."""
        x = positional_encoding(pts, self.pos_encoding)
        feat = MLP(out_channels=256, inter_channels=(256,) * 6,
                   res_layers=(4,), nlactv="relu", name="shared_mlp")(x)
        geo = GeoHead(name="geo_mlp")(feat)
        clr = MLP(out_channels=3, inter_channels=(256, 128),
                  nlactv="relu", name="clr_mlp")(feat)
        rgb = jax.nn.sigmoid(clr)
        alpha = jax.nn.relu(geo[..., 1:2])
        if self.if_type == "occupancy":
            occ = jax.nn.sigmoid(geo[..., :1])
        else:
            occ = geo[..., :1]
        return rgb, alpha, occ


class GeoHead(nn.Module):
    """geo_mlp with its tiny-uniform output init
    (reference arch_avatar.py:46-51,60)."""

    @nn.compact
    def __call__(self, feat):
        from avatarcap_tpu.models.layers import leaky_relu
        h = Dense(128, name="fc0")(feat)
        h = leaky_relu(h, 0.02)
        in_ch = h.shape[-1]
        k = self.param("fc1_kernel", tiny_uniform_init(), (in_ch, 2))
        b = self.param("fc1_bias", nn.initializers.zeros, (2,))
        return jnp.matmul(h, k) + b


class WarpingField(nn.Module):
    """Pose-dependent non-rigid warp (reference arch_avatar.py:86-140).

    ``pose_features`` runs the U-Net once per pose on the 6-channel
    front/back SMPL position map; ``__call__`` queries per-point offsets
    by bilinear feature fetch + OffsetDecoder + tiny-init 3-d head.
    """

    pos_encoding: int = 0
    pose_feat_dim: int = 64

    def setup(self):
        self.unet = UnetNoCond7DS(output_nc=self.pose_feat_dim, nf=32,
                                  up_mode="upconv", name="unet")
        self.mlp = OffsetDecoder(name="mlp")
        self.out_dense = OutOffsetHead(name="out_layer_coord_affine")

    def pose_features(self, smpl_pos_map: jnp.ndarray,
                      train: bool = False) -> jnp.ndarray:
        """smpl_pos_map: (B, H, W, 6) NHWC -> (B, H, W, pose_feat_dim)."""
        return self.unet(smpl_pos_map, train)

    def __call__(self, pts: jnp.ndarray, pose_feat_map: jnp.ndarray,
                 cano_smpl_center: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        """Query offsets.

        Args:
          pts: (B, N, 3) canonical points.
          pose_feat_map: (B, H, W, C) from pose_features.
          cano_smpl_center: (B, 3).
        Returns:
          (B, N, 3) offsets.
        """
        pts_en = positional_encoding(pts, self.pos_encoding)
        # grid coords are detached (reference arch_avatar.py:124-128)
        pts_c = jax.lax.stop_gradient(pts - cano_smpl_center[:, None, :])
        feat_nchw = jnp.moveaxis(pose_feat_map, -1, 1)
        pose_feat = sample_feature_map_at_points(feat_nchw, pts_c)  # (B,N,C)
        h = jnp.concatenate([pts_en, pose_feat], axis=-1)
        h = self.mlp(h, train)
        return self.out_dense(h)


class OutOffsetHead(nn.Module):
    """Conv1d(256->3) with U(-1e-5,1e-5) init (reference arch_avatar.py:104-105)."""

    @nn.compact
    def __call__(self, h):
        in_ch = h.shape[-1]
        k = self.param("kernel", tiny_uniform_init(), (in_ch, 3))
        b = self.param("bias", nn.initializers.zeros, (3,))
        return jnp.matmul(h, k) + b


def sample_weight_volume(weight_volume: jnp.ndarray,
                         pts01: jnp.ndarray) -> jnp.ndarray:
    """Trilinear LBS weight fetch (reference arch_avatar.py:143-165).

    Args:
      weight_volume: (X, Y, Z, J) canonical blend-weight volume.
      pts01: (B, N, 3) points normalized to [0, 1] in cano bounds.
    Returns:
      (B, N, J).
    """
    B, N, _ = pts01.shape
    vol = jnp.moveaxis(weight_volume, -1, 0)[None]  # (1, J, X, Y, Z)
    grid = 2.0 * pts01 - 1.0
    # torch 3D grid_sample maps grid (x,y,z) -> (W,H,D) = (Z,Y,X); the
    # reference passes pts[:, [2,1,0]] so world x indexes the volume X axis.
    grid = grid[..., [2, 1, 0]].reshape(1, 1, 1, B * N, 3)
    w = grid_sample_3d(vol, grid)  # (1, J, 1, 1, B*N)
    return jnp.moveaxis(w[0, :, 0, 0].reshape(-1, B, N), 0, -1)


class GeoTexAvatar(nn.Module):
    """Container tying the template and warp field together
    (reference arch_avatar.py:168-176). Inverse skinning and alpha
    masking live in avatarcap_tpu.pipeline.avatar (pure functions over
    explicit state) rather than in the module."""

    pos_encoding_template: int = 10
    pos_encoding_warp: int = 0
    if_type: str = "sdf"

    def setup(self):
        self.cano_template = DoubleTNet(
            pos_encoding=self.pos_encoding_template, if_type=self.if_type,
            name="cano_template")
        self.warping_field = WarpingField(
            pos_encoding=self.pos_encoding_warp, name="warping_field")

    def pose_features(self, smpl_pos_map, train: bool = False):
        return self.warping_field.pose_features(smpl_pos_map, train)

    def query_offsets(self, pts, pose_feat_map, cano_smpl_center,
                      train: bool = False):
        return self.warping_field(pts, pose_feat_map, cano_smpl_center, train)

    def query_template(self, pts):
        return self.cano_template(pts)

    def __call__(self, pts, smpl_pos_map, cano_smpl_center,
                 train: bool = False):
        """Convenience combined query used for initialization: warp then
        template (the OccupancyNet path, reference arch_avatar.py:366-374)."""
        feat_map = self.pose_features(smpl_pos_map, train)
        offsets = self.query_offsets(pts, feat_map, cano_smpl_center, train)
        rgb, alpha, occ = self.query_template(pts + offsets)
        return {"rgb": rgb, "alpha": alpha, "occ": occ,
                "nonrigid_offset": offsets}
