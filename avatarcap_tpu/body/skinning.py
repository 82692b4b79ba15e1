"""Forward/inverse linear blend skinning.

Functional equivalents of the reference's SmplUtil einsums
(reference utils/smpl_util.py:58-81), without the global singleton: the
canonical vertices / skinning weights are explicit arguments.
"""

from __future__ import annotations

import jax.numpy as jnp


def blend_joint_mats(lbs: jnp.ndarray, jnt_mats: jnp.ndarray) -> jnp.ndarray:
    """Per-point affine mats from blend weights.

    Args:
      lbs: (..., N, J), jnt_mats: (..., J, 4, 4).
    Returns:
      (..., N, 4, 4).
    """
    return jnp.einsum("...nj,...jxy->...nxy", lbs, jnt_mats,
                      precision="highest")


def skin_points(points: jnp.ndarray, lbs: jnp.ndarray,
                jnt_mats: jnp.ndarray, return_pt_mats: bool = False):
    """Forward-skin points: reference utils/smpl_util.py:58-74."""
    pt_mats = blend_joint_mats(lbs, jnt_mats)
    out = (jnp.einsum("...nxy,...ny->...nx", pt_mats[..., :3, :3], points,
                      precision="highest")
           + pt_mats[..., :3, 3])
    if return_pt_mats:
        return out, pt_mats
    return out


def skin_normals(normals: jnp.ndarray, lbs: jnp.ndarray,
                 jnt_mats: jnp.ndarray) -> jnp.ndarray:
    """Rotate normals by blended mats (no renormalize), reference :76-81."""
    pt_mats = blend_joint_mats(lbs, jnt_mats)
    return jnp.einsum("...nxy,...ny->...nx", pt_mats[..., :3, :3], normals,
                      precision="highest")


# ---------------------------------------------------------------------------
# Flat per-point matrices: (N, 16) row-major, channel 4*r + c = mat[r, c]
# ---------------------------------------------------------------------------
#
# At capture scale (millions of soup vertices, vmapped over a frame batch)
# any (..., 4, 4)-shaped tensor that crosses an XLA fusion boundary gets a
# tiled layout on the trailing (4, 4) dims — measured 30-64x padding
# expansion (7.5 GB for a 240 MB tensor) and a compile-time HBM OOM in
# the streaming program. Per-point matrices therefore flow through the
# capture path as rank-2 (N, 16) arrays, and the matvec / rotation /
# inverse-rotation consumers slice channels instead of reshaping.

def blend_joint_mats16(lbs: jnp.ndarray, jnt_mats: jnp.ndarray
                       ) -> jnp.ndarray:
    """Per-point FLAT affine mats: (..., N, J) x (..., J, 4, 4) ->
    (..., N, 16); one MXU matmul, no trailing tiny dims."""
    J = jnt_mats.shape[-3]
    flat = jnt_mats.reshape(jnt_mats.shape[:-3] + (J, 16))
    return jnp.einsum("...nj,...jc->...nc", lbs, flat,
                      precision="highest")


def mats16_apply_points(m16: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply flat affine mats (..., N, 16) to points (..., N, 3)."""
    x, y, z = pts[..., 0], pts[..., 1], pts[..., 2]
    return jnp.stack(
        [m16[..., 0] * x + m16[..., 1] * y + m16[..., 2] * z + m16[..., 3],
         m16[..., 4] * x + m16[..., 5] * y + m16[..., 6] * z + m16[..., 7],
         m16[..., 8] * x + m16[..., 9] * y + m16[..., 10] * z
         + m16[..., 11]], axis=-1)


def mats16_rotate(m16: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Rotate vectors by the 3x3 part of flat mats (no translation)."""
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    return jnp.stack(
        [m16[..., 0] * x + m16[..., 1] * y + m16[..., 2] * z,
         m16[..., 4] * x + m16[..., 5] * y + m16[..., 6] * z,
         m16[..., 8] * x + m16[..., 9] * y + m16[..., 10] * z], axis=-1)


def mats16_inv_rotate(m16: jnp.ndarray, vecs: jnp.ndarray) -> jnp.ndarray:
    """Apply the INVERSE of the 3x3 part of flat mats to vectors.

    Closed-form adjugate on channel slices (same math as
    ops/se3.inverse_3x3, which needs (..., 3, 3) inputs): exact for the
    non-orthogonal blended LBS matrices of normal canonicalization
    (reference normal_fusion.py:59), pure elementwise VPU work.
    """
    a, b, c = m16[..., 0], m16[..., 1], m16[..., 2]
    d, e, f = m16[..., 4], m16[..., 5], m16[..., 6]
    g, h, i = m16[..., 8], m16[..., 9], m16[..., 10]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    x, y, z = vecs[..., 0], vecs[..., 1], vecs[..., 2]
    ox = A * x - (b * i - c * h) * y + (b * f - c * e) * z
    oy = B * x + (a * i - c * g) * y - (a * f - c * d) * z
    oz = C * x - (a * h - b * g) * y + (a * e - b * d) * z
    return jnp.stack([ox, oy, oz], axis=-1) * inv_det[..., None]


# ---------------------------------------------------------------------------
# Volume-accelerated KNN-Gaussian LBS (capture fast path)
# ---------------------------------------------------------------------------
#
# The reference skins every captured mesh vertex with K=4 Gaussian-weighted
# KNN blend weights against 6,890 SMPL vertices (utils/smpl_util.py:24-39,
# called per frame at main.py:383-394). At 3M soup vertices that KNN is a
# 3M x 6890 distance problem per frame (~700 ms on v5e). The weight field
# is smooth on the Gaussian's 5 cm scale, so we evaluate it ONCE per
# subject on a ~1 cm canonical grid and, per frame, blend joint matrices
# on the grid (a tiny (G, J) @ (J, 16) matmul) and trilinearly sample the
# resulting 16-channel matrix field at the vertices — trilinear
# interpolation commutes with the linear blend, so this equals skinning
# with trilinearly interpolated KNN weights (≤ ~1 mm vertex deviation at
# 1 cm voxels; tests/test_capture.py pins the tolerance). The exact KNN
# path stays available via CaptureOptions(skinning_mode="knn").

def build_skin_weight_volume(cano_smpl_vertices: jnp.ndarray,
                             skinning_weights: jnp.ndarray,
                             bounds: jnp.ndarray, voxel: float = 0.01,
                             k: int = 4, radius: float = 0.05):
    """Per-subject KNN-Gaussian LBS weights on a regular canonical grid.

    Returns (weights (Gx, Gy, Gz, J), bounds (2, 3) as given).
    """
    import numpy as np
    from avatarcap_tpu.ops.knn import approx_lbs_weights

    lo = np.asarray(bounds[0])
    hi = np.asarray(bounds[1])
    res = np.maximum(np.ceil((hi - lo) / voxel).astype(np.int32) + 1, 2)
    lin = [jnp.linspace(0.0, 1.0, int(r)) for r in res]
    g = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    pts = g * (jnp.asarray(hi) - jnp.asarray(lo)) + jnp.asarray(lo)
    w = approx_lbs_weights(pts, cano_smpl_vertices, skinning_weights,
                           k=k, radius=radius)
    return w.reshape(tuple(int(r) for r in res) + (w.shape[-1],))


def _trilerp_rows(vol: jnp.ndarray, pts01: jnp.ndarray) -> jnp.ndarray:
    """Channel-LAST trilinear sampling: (Gx, Gy, Gz, C) at (N, 3) in [0, 1]
    (border clamp, node-aligned like align_corners=True).

    All 8 corner rows are pre-concatenated per CELL into one 8C-channel
    table so each sample is a single wide row gather: random gathers on
    v5e are DMA-latency-bound (~10 ns per issued row regardless of width
    up to ~512 B), so 1 x 8C-wide beats 8 x C-wide by ~4-8x at millions
    of points. The (Gx-1)(Gy-1)(Gz-1) x 8C staging table is rebuilt from
    `vol` inside the same jit (pure bandwidth, ~2 ms at capture sizes).
    """
    Gx, Gy, Gz, C = vol.shape
    # cell table: corner (dx, dy, dz) -> channels [k*C:(k+1)*C],
    # k = dx*4 + dy*2 + dz
    cells = jnp.concatenate(
        [vol[dx:Gx - 1 + dx, dy:Gy - 1 + dy, dz:Gz - 1 + dz]
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        axis=-1).reshape(-1, 8 * C)                   # (cells, 8C)
    f = pts01 * jnp.asarray([Gx - 1, Gy - 1, Gz - 1], pts01.dtype)
    f = jnp.clip(f, 0.0, jnp.asarray([Gx - 1, Gy - 1, Gz - 1], f.dtype))
    i0 = jnp.floor(f).astype(jnp.int32)
    i0 = jnp.minimum(i0, jnp.asarray([Gx - 2, Gy - 2, Gz - 2]))
    t = f - i0.astype(f.dtype)                        # (N, 3)
    cell = (i0[:, 0] * (Gy - 1) + i0[:, 1]) * (Gz - 1) + i0[:, 2]
    rows = cells[cell].reshape(-1, 8, C)              # ONE gather
    tx, ty, tz = t[:, 0:1], t[:, 1:2], t[:, 2:3]
    w = jnp.stack([(1 - tx) * (1 - ty) * (1 - tz),
                   (1 - tx) * (1 - ty) * tz,
                   (1 - tx) * ty * (1 - tz),
                   (1 - tx) * ty * tz,
                   tx * (1 - ty) * (1 - tz),
                   tx * (1 - ty) * tz,
                   tx * ty * (1 - tz),
                   tx * ty * tz], axis=1)             # (N, 8, 1)
    return jnp.sum(rows * w, axis=1)


def _trilerp_rows_grouped(vol: jnp.ndarray, pts01: jnp.ndarray,
                          group: int) -> jnp.ndarray:
    """Like `_trilerp_rows`, but ONE cell-row gather per GROUP of
    `group` consecutive points, anchored at the group centroid's cell.

    Row gathers dominate volume skinning (~48 ns per 512 B row on v5e,
    DMA-latency-bound), and a marching-cubes triangle's 3 vertices lie
    on the edges of one extraction cube — within ~9 mm of each other,
    i.e. inside or immediately adjacent to ONE ~1 cm skinning cell. The
    shared-cell weights for a vertex that straddles into a neighbor
    cell are a LINEAR EXTRAPOLATION of the cell's trilinear interpolant
    (offsets outside [0, 1]). Measured vs per-point sampling on a posed
    body: ~0.1 mm median deviation with a ~2.5 mm tail near joints
    (where the blended-matrix field varies on ~2 cm scales) — inside
    the capture mesh's own half-voxel (~2.6 mm) discretization error
    (tests/test_fast_paths.py pins both the tail and the median).
    """
    Gx, Gy, Gz, C = vol.shape
    cells = jnp.concatenate(
        [vol[dx:Gx - 1 + dx, dy:Gy - 1 + dy, dz:Gz - 1 + dz]
         for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)],
        axis=-1).reshape(-1, 8 * C)                   # (cells, 8C)
    scale = jnp.asarray([Gx - 1, Gy - 1, Gz - 1], pts01.dtype)
    f = jnp.clip(pts01 * scale, 0.0, scale)
    fg = f.reshape(-1, group, 3)
    i0 = jnp.floor(fg.mean(axis=1)).astype(jnp.int32)  # centroid's cell
    i0 = jnp.clip(i0, 0, jnp.asarray([Gx - 2, Gy - 2, Gz - 2]))
    t = fg - i0[:, None, :].astype(f.dtype)            # (Ng, group, 3)
    cell = (i0[:, 0] * (Gy - 1) + i0[:, 1]) * (Gz - 1) + i0[:, 2]
    rows = cells[cell].reshape(-1, 1, 8, C)            # ONE gather/group
    tx, ty, tz = t[..., 0:1], t[..., 1:2], t[..., 2:3]
    w = jnp.stack([(1 - tx) * (1 - ty) * (1 - tz),
                   (1 - tx) * (1 - ty) * tz,
                   (1 - tx) * ty * (1 - tz),
                   (1 - tx) * ty * tz,
                   tx * (1 - ty) * (1 - tz),
                   tx * (1 - ty) * tz,
                   tx * ty * (1 - tz),
                   tx * ty * tz], axis=2)              # (Ng, group, 8, 1)
    return jnp.sum(rows * w, axis=2).reshape(-1, C)


def skin_points_by_volume(points: jnp.ndarray, weight_volume: jnp.ndarray,
                          bounds: jnp.ndarray, jnt_mats: jnp.ndarray,
                          return_pt_mats: bool = False,
                          row_group: int = 1):
    """Forward-skin points with the per-subject weight volume.

    Args:
      points: (N, 3) canonical points.
      weight_volume: (Gx, Gy, Gz, J) from build_skin_weight_volume.
      bounds: (2, 3) the volume's world extents.
      jnt_mats: (J, 4, 4) cano->live joint transforms.
      row_group: consecutive points sharing one matrix-row gather
        (see `_trilerp_rows_grouped`); 1 = exact per-point sampling,
        3 = one gather per marching-cubes triangle (~3x fewer row DMAs
        in the capture hot path). N must be a multiple of row_group.

    Returns live points (N, 3); with ``return_pt_mats`` also the FLAT
    per-point mats (N, 16) — never reshaped to (N, 4, 4): trailing
    (4, 4) dims force a tiled layout with 30-64x padding at soup scale
    under vmap (the round-3 streaming HBM OOM). Use the mats16_*
    helpers to consume them.
    """
    G = weight_volume.shape
    # blend matrices on the grid: trilinear commutes with the blend
    mat_field = jnp.einsum("gj,jc->gc",
                           weight_volume.reshape(-1, G[-1]),
                           jnt_mats.reshape(G[-1], 16),
                           precision="highest").reshape(G[:3] + (16,))
    pts01 = (points - bounds[0]) / (bounds[1] - bounds[0])
    if row_group > 1:
        m16 = _trilerp_rows_grouped(mat_field, pts01, row_group)
    else:
        m16 = _trilerp_rows(mat_field, pts01)
    out = mats16_apply_points(m16, points)
    if return_pt_mats:
        return out, m16
    return out
