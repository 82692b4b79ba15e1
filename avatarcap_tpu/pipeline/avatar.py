"""GeoTexAvatar evaluation pipeline (pure functions over explicit state).

Implements the reference's implicit-query semantics
(reference network/arch_avatar.py:178-237, NerfRenderer :240-349,
OccupancyNet :352-381) without module-side caches, global singletons, or
host chunk loops:

- the pose feature map is an explicit activation computed once per pose;
- canonical SMPL vertices / skinning weights / the LBS weight volume are
  fields of an AvatarStatics pytree (vs the smpl_util singleton,
  reference utils/smpl_util.py:84);
- full point/ray batches evaluate in one call; callers shard across devices
  instead of looping 2048-ray / 262,144-point host chunks
  (reference arch_avatar.py:330-344, 366-377);
- each public entry is ONE flax apply over a bound-module closure so BN
  batch_stats mutate consistently in training.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from avatarcap_tpu.models.avatar import GeoTexAvatar, sample_weight_volume
from avatarcap_tpu.ops.knn import knn
from avatarcap_tpu.ops.se3 import rigid_inverse
from avatarcap_tpu.ops.volume_render import (
    raw2outputs, stratified_z_vals, z_vals_to_dists)
from avatarcap_tpu.body.skinning import skin_points

NEAR_SMPL_DIST = 0.08  # 8 cm body proximity gate (reference arch_avatar.py:191)


class AvatarStatics(NamedTuple):
    """Per-subject constants, computed once at load time."""

    weight_volume: jnp.ndarray        # (X, Y, Z, J) canonical LBS weights
    cano_smpl_vertices: jnp.ndarray   # (V, 3)
    smpl_skinning_weights: jnp.ndarray  # (V, J)
    cano_bounds: jnp.ndarray          # (2, 3)
    cano_smpl_center: jnp.ndarray     # (3,)


class FrameInputs(NamedTuple):
    """Per-frame pose-dependent inputs (batched, leading dim B)."""

    live_smpl_v: jnp.ndarray          # (B, V, 3)
    cano2live_jnt_mats: jnp.ndarray   # (B, J, 4, 4)
    smpl_pos_map: jnp.ndarray         # (B, H, W, 6) NHWC


def _apply(module, variables, fn, *args, train: bool = False):
    """Single flax apply; collects batch_stats updates when training."""
    if train:
        return module.apply(variables, *args, method=fn,
                            mutable=["batch_stats"])
    out = module.apply(variables, *args, method=fn)
    return out, {}


def compute_pose_features(module: GeoTexAvatar, variables,
                          smpl_pos_map: jnp.ndarray, train: bool = False):
    """U-Net over the SMPL position map, once per pose
    (reference arch_avatar.py:109-111). Returns (feat_map, updates)."""
    def fn(m, x):
        return m.pose_features(x, train)
    return _apply(module, variables, fn, smpl_pos_map, train=train)


def _near_flag(wpts: jnp.ndarray, verts: jnp.ndarray) -> jnp.ndarray:
    """(B, N, 3) vs (B, V, 3) -> (B, N) bool within 8 cm.

    precision='high' (bf16x3): the (N, 3) x (3, V) distance matmul is
    26% of the whole training step at 'highest' (6-pass) — measured
    26.1 -> 16.4 ms per batch-4 call, d2 error um^2-scale against the
    8 cm threshold (same trade the w_nerf color transfer makes).
    """
    def per_item(q, v):
        d2, _ = knn(q, v, k=1, precision="high")
        return d2[:, 0] < NEAR_SMPL_DIST * NEAR_SMPL_DIST
    return jax.vmap(per_item)(wpts, verts)


def inverse_skin_points(wpts: jnp.ndarray, frame: FrameInputs,
                        statics: AvatarStatics):
    """Posed -> canonical points via KNN-initialized, volume-refined
    inverse LBS (reference arch_avatar.py:190-205).

    Returns (cano_pts (B,N,3), near_flag (B,N)).
    """
    def per_item(q, live_v, cano2live):
        # precision='high': see _near_flag. Near-tie index flips pick an
        # equidistant-within-um^2 vertex, and w0 is only the coarse init
        # that the weight-volume resample below refines away.
        d2, idx = knn(q, live_v, k=1, precision="high")
        near = d2[:, 0] < NEAR_SMPL_DIST * NEAR_SMPL_DIST
        live2cano = rigid_inverse(cano2live)
        # coarse inverse skinning with NN vertex weights (no gradient,
        # reference :196-203)
        w0 = statics.smpl_skinning_weights[idx[:, 0]]       # (N, J)
        cano0 = skin_points(q, w0, live2cano)
        lo, hi = statics.cano_bounds[0], statics.cano_bounds[1]
        cano0 = jax.lax.stop_gradient((cano0 - lo) / (hi - lo))
        # refined weights from the canonical weight volume (reference :204)
        w1 = sample_weight_volume(statics.weight_volume, cano0[None])[0]
        return skin_points(q, w1, live2cano), near

    return jax.vmap(per_item)(wpts, frame.live_smpl_v,
                              frame.cano2live_jnt_mats)


def _forward_impl(m: GeoTexAvatar, wpts, dists, pose_feat_map, frame,
                  statics, pts_space, train):
    """Bound-module core query (reference arch_avatar.py:178-237)."""
    B = wpts.shape[0]
    if pts_space == "posed":
        cano_pts, near_flag = inverse_skin_points(wpts, frame, statics)
    else:
        cano_pts = wpts
        near_flag = _near_flag(
            wpts, jnp.broadcast_to(statics.cano_smpl_vertices[None],
                                   (B,) + statics.cano_smpl_vertices.shape))

    center = jnp.broadcast_to(statics.cano_smpl_center[None], (B, 3))
    if pts_space in ("posed", "cano"):
        offsets = m.query_offsets(cano_pts, pose_feat_map, center, train)
        cano_pts = cano_pts + offsets
    else:
        offsets = jnp.zeros_like(cano_pts)

    rgb, alpha, occ = m.query_template(cano_pts)

    # Alpha masking (reference :221-225, after animatable NeRF).
    inside = jnp.all((cano_pts > statics.cano_bounds[0]) &
                     (cano_pts < statics.cano_bounds[1]), axis=-1)
    alpha = jnp.where((inside & near_flag)[..., None], alpha, 0.0)
    # raw2alpha (reference :227-229); alpha is already relu'd density.
    alpha = 1.0 - jnp.exp(-alpha * dists[..., None])

    return {"raw": jnp.concatenate([rgb, alpha], axis=-1),
            "occ": occ, "nonrigid_offset": offsets}


def avatar_forward(module: GeoTexAvatar, variables, wpts: jnp.ndarray,
                   dists: jnp.ndarray, pose_feat_map: jnp.ndarray,
                   frame: FrameInputs, statics: AvatarStatics,
                   pts_space: str = "posed", train: bool = False):
    """Core implicit query. wpts (B, N, 3); dists (B, N).
    Returns (dict(raw, occ, nonrigid_offset), batch_stats_updates)."""
    assert pts_space in ("posed", "cano", "temp")

    def fn(m, wpts, dists, pose_feat_map, frame, statics):
        return _forward_impl(m, wpts, dists, pose_feat_map, frame, statics,
                             pts_space, train)

    return _apply(module, variables, fn, wpts, dists, pose_feat_map, frame,
                  statics, train=train)


def render_rays(module: GeoTexAvatar, variables, ray_o: jnp.ndarray,
                ray_d: jnp.ndarray, near: jnp.ndarray, far: jnp.ndarray,
                depth: jnp.ndarray, pose_feat_map: jnp.ndarray,
                frame: FrameInputs, statics: AvatarStatics,
                n_samples: int = 64, perturb: bool = False,
                rng: Optional[jax.Array] = None, pts_space: str = "posed",
                near_dist: float = 0.05, far_dist: float = 0.05,
                train: bool = False):
    """Volume-render ray batches (reference arch_avatar.py:285-349).

    Args:
      ray_o/ray_d: (B, R, 3); near/far/depth: (B, R). Depth-guided near/far
      override where depth > 1e-6 (reference :285-289).
    Returns (dict(rgb_map (B,R,3), acc_map, depth_map (B,R),
      nonrigid_offset (B,R*S,3), raw (B,R*S,4), occ), updates).
    """
    B, R = ray_o.shape[:2]
    has_depth = depth > 1e-6
    near = jnp.where(has_depth, depth - near_dist, near)
    far = jnp.where(has_depth, depth + far_dist, far)

    z_vals = stratified_z_vals(near, far, n_samples, perturb, rng)  # (B,R,S)
    wpts = ray_o[:, :, None] + ray_d[:, :, None] * z_vals[..., None]
    dists = z_vals_to_dists(z_vals)

    def fn(m, wpts, dists, pose_feat_map, frame, statics):
        return _forward_impl(m, wpts, dists, pose_feat_map, frame, statics,
                             pts_space, train)

    out, updates = _apply(module, variables, fn,
                          wpts.reshape(B, R * n_samples, 3),
                          dists.reshape(B, R * n_samples),
                          pose_feat_map, frame, statics, train=train)

    raw = out["raw"].reshape(B * R, n_samples, 4)
    ro = raw2outputs(raw, z_vals.reshape(B * R, n_samples))
    return {
        "rgb_map": ro.rgb_map.reshape(B, R, 3),
        "acc_map": ro.acc_map.reshape(B, R),
        "depth_map": ro.depth_map.reshape(B, R),
        "raw": out["raw"],
        "occ": out["occ"],
        "nonrigid_offset": out["nonrigid_offset"],
    }, updates


def pack_fused_query_weights(variables):
    """Precompute Pallas operands for query_occupancy_fused (eval only)."""
    from avatarcap_tpu.ops.pallas_query import (pack_template_weights,
                                                pack_offset_weights)
    return {
        "template": pack_template_weights(
            variables["params"]["cano_template"]),
        "offset": pack_offset_weights(
            variables["params"]["warping_field"],
            variables["batch_stats"]["warping_field"]),
    }


@jax.jit
def query_occupancy_fused(packed, cano_pts: jnp.ndarray,
                          pose_feat_map: jnp.ndarray,
                          statics: AvatarStatics):
    """Inference fast path for query_occupancy: the warp OffsetDecoder,
    warped-point PE, and implicit template run as ONE fused Pallas kernel
    holding all activations in VMEM (see ops/pallas_query.py). Matches the
    XLA path at the default bf16 matmul precision.

    Args:
      packed: from pack_fused_query_weights.
      cano_pts: (B, N, 3).
    Returns dict(cano_pts_ov (B,N,1), nonrigid_offset (B,N,3)).
    """
    from avatarcap_tpu.ops.pallas_query import warp_template_query_fused
    from avatarcap_tpu.ops.grid_sample import sample_feature_map_at_points

    B, N, _ = cano_pts.shape
    pts_c = cano_pts - statics.cano_smpl_center[None, None]
    feat_nchw = jnp.moveaxis(pose_feat_map, -1, 1)
    pose_feat = sample_feature_map_at_points(feat_nchw, pts_c)  # (B, N, 64)
    out = warp_template_query_fused(packed["offset"], packed["template"],
                                    cano_pts.reshape(B * N, 3),
                                    pose_feat.reshape(B * N, -1))
    return {"cano_pts_ov": out["occ"].reshape(B, N, 1),
            "nonrigid_offset": out["offset"].reshape(B, N, 3)}


@functools.partial(jax.jit, static_argnames=("grid_shape", "dtype",
                                             "columns"))
def grid_pose_features(pose_feat_map: jnp.ndarray,
                       statics: AvatarStatics,
                       grid_shape, flat_idx: Optional[jnp.ndarray] = None,
                       dtype=None, columns: bool = False):
    """Pose features for REGULAR-GRID query points, exploiting that the
    pixel-aligned fetch only depends on (x, y): sample once per unique grid
    column (X*Y bilinear fetches instead of N) and broadcast along z.

    The reference's pose-feature fetch is pure 2D (arch_avatar.py:124-134);
    at 384x384x128 this removes 128x of the gather traffic — the dominant
    cost of the fused query path on TPU.

    Args:
      pose_feat_map: (1, H, W, C).
      grid_shape: static (X, Y, Z) of the canonical grid over cano_bounds.
      flat_idx: optional (N,) flat indices into the x-major grid (compacted
        valid points); None means the full grid in order.
    Returns:
      (N, C) pose features (N = X*Y*Z when flat_idx is None).
    """
    from avatarcap_tpu.ops.grid_sample import sample_feature_map_at_points
    X, Y, Z = grid_shape
    lo = statics.cano_bounds[0]
    hi = statics.cano_bounds[1]
    xs = jnp.linspace(0.0, 1.0, X) * (hi[0] - lo[0]) + lo[0]
    ys = jnp.linspace(0.0, 1.0, Y) * (hi[1] - lo[1]) + lo[1]
    gx, gy = jnp.meshgrid(xs, ys, indexing="ij")
    cols = jnp.stack([gx.reshape(-1), gy.reshape(-1),
                      jnp.zeros(X * Y, xs.dtype)], axis=-1)   # (X*Y, 3)
    pts_c = cols - statics.cano_smpl_center[None]
    feat_nchw = jnp.moveaxis(pose_feat_map, -1, 1)
    pf_cols = sample_feature_map_at_points(
        feat_nchw, pts_c[None])[0]                            # (X*Y, C)
    if dtype is not None:
        # the fused query kernel consumes bf16 pose features; casting
        # BEFORE the N-row broadcast gather halves its HBM traffic
        pf_cols = pf_cols.astype(dtype)
    if columns:
        # hierarchical query indexes the (X*Y, C) column table itself,
        # once per level
        return pf_cols
    if flat_idx is None:
        return jnp.repeat(pf_cols, Z, axis=0)
    if Z & (Z - 1) == 0:
        # int32 division is emulated on the VPU (~12 ns/element — ~100 ms
        # at capture sizes); grid Z is a power of two in every config
        col = flat_idx >> (Z.bit_length() - 1)
    else:
        col = flat_idx // Z
    return pf_cols[col]


def query_occupancy(module: GeoTexAvatar, variables, cano_pts: jnp.ndarray,
                    pose_feat_map: jnp.ndarray, statics: AvatarStatics,
                    train: bool = False):
    """Canonical occupancy/SDF query (reference arch_avatar.py:352-381):
    warp offsets then template geometry head, no masking.

    Args:
      cano_pts: (B, N, 3).
    Returns (dict(cano_pts_ov (B,N,1), nonrigid_offset (B,N,3)), updates).
    """
    B = cano_pts.shape[0]

    def fn(m, cano_pts, pose_feat_map, statics):
        center = jnp.broadcast_to(statics.cano_smpl_center[None], (B, 3))
        offsets = m.query_offsets(cano_pts, pose_feat_map, center, train)
        _, _, occ = m.query_template(cano_pts + offsets)
        return {"cano_pts_ov": occ, "nonrigid_offset": offsets}

    return _apply(module, variables, fn, cano_pts, pose_feat_map, statics,
                  train=train)
