"""Exact closest point / signed distance to a triangle mesh.

Replaces igl.signed_distance in the preprocessing path
(reference gen_data/preprocess_training_data.py:70,304,454): per query
point, KNN over face centroids proposes candidates, then the exact
point-triangle projection picks the closest. Runs on device in chunks.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from avatarcap_tpu.ops.knn import knn
from avatarcap_tpu.ops.inside import points_inside_mesh


class ClosestPoint(NamedTuple):
    points: jnp.ndarray      # (N, 3) closest surface points
    face_idx: jnp.ndarray    # (N,) face indices
    bary: jnp.ndarray        # (N, 3) barycentric coords
    dist: jnp.ndarray        # (N,) unsigned distances


def _point_triangle_closest(p, a, b, c):
    """Exact closest point on triangle (abc) to p; all (..., 3).
    Ericson, Real-Time Collision Detection §5.1.5 (branchless via where)."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)
    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)
    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    denom = jnp.where(jnp.abs(denom) < 1e-20, 1.0, denom)
    v = vb / denom
    w = vc / denom
    # interior candidate
    u_int = 1.0 - v - w
    bary = jnp.stack([u_int, v, w], -1)

    # edge/vertex regions
    # vertex a
    in_a = (d1 <= 0) & (d2 <= 0)
    # vertex b
    in_b = (d3 >= 0) & (d4 <= d3)
    # vertex c
    in_c = (d6 >= 0) & (d5 <= d6)
    # edge ab
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) < 1e-20, 1.0, d1 - d3)
    in_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    # edge ac
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) < 1e-20, 1.0, d2 - d6)
    in_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    # edge bc
    t_bc = (d4 - d3) / jnp.where(jnp.abs((d4 - d3) + (d5 - d6)) < 1e-20,
                                 1.0, (d4 - d3) + (d5 - d6))
    in_bc = (va <= 0) & (d4 - d3 >= 0) & (d5 - d6 >= 0)

    bary = jnp.where(in_bc[..., None],
                     jnp.stack([jnp.zeros_like(t_bc), 1 - t_bc, t_bc], -1),
                     bary)
    bary = jnp.where(in_ac[..., None],
                     jnp.stack([1 - w_ac, jnp.zeros_like(w_ac), w_ac], -1),
                     bary)
    bary = jnp.where(in_ab[..., None],
                     jnp.stack([1 - v_ab, v_ab, jnp.zeros_like(v_ab)], -1),
                     bary)
    ones = jnp.ones_like(va)
    zeros = jnp.zeros_like(va)
    bary = jnp.where(in_c[..., None],
                     jnp.stack([zeros, zeros, ones], -1), bary)
    bary = jnp.where(in_b[..., None],
                     jnp.stack([zeros, ones, zeros], -1), bary)
    bary = jnp.where(in_a[..., None],
                     jnp.stack([ones, zeros, zeros], -1), bary)
    bary = jnp.clip(bary, 0.0, 1.0)
    bary = bary / jnp.maximum(jnp.sum(bary, -1, keepdims=True), 1e-12)
    cp_out = (bary[..., 0:1] * a + bary[..., 1:2] * b + bary[..., 2:3] * c)
    return cp_out, bary


@functools.partial(jax.jit, static_argnames=("k", "chunk"))
def closest_point_on_mesh(pts: jnp.ndarray, verts: jnp.ndarray,
                          faces: jnp.ndarray, k: int = 32,
                          chunk: int = 8192) -> ClosestPoint:
    """Closest surface point for each query (KNN-candidate + exact test).

    Args:
      pts: (N, 3); verts: (V, 3); faces: (F, 3) int32.
      k: candidate faces per point (by centroid distance). Exact when the
        true closest face is within the k nearest centroids — k=32 is ample
        for body-scan meshes.
    """
    tri = verts[faces]                        # (F, 3, 3)
    centroids = tri.mean(axis=1)              # (F, 3)

    def run_chunk(q):
        _, cand = knn(q, centroids, k=k, chunk=q.shape[0])   # (C, k)
        t = tri[cand]                                        # (C, k, 3, 3)
        cp_pts, bary = _point_triangle_closest(
            q[:, None], t[..., 0, :], t[..., 1, :], t[..., 2, :])
        d2 = jnp.sum((cp_pts - q[:, None]) ** 2, -1)         # (C, k)
        best = jnp.argmin(d2, axis=-1)
        take = lambda x: jnp.take_along_axis(
            x, best[:, None, None] if x.ndim == 3 else best[:, None],
            axis=1).squeeze(1)
        return (take(cp_pts), take(bary),
                jnp.take_along_axis(cand, best[:, None], 1)[:, 0],
                jnp.sqrt(jnp.take_along_axis(d2, best[:, None], 1)[:, 0]))

    N = pts.shape[0]
    pad = (-N) % chunk
    qp = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    cp_pts, bary, fidx, dist = jax.lax.map(run_chunk, qp)
    return ClosestPoint(cp_pts.reshape(-1, 3)[:N],
                        fidx.reshape(-1)[:N].astype(jnp.int32),
                        bary.reshape(-1, 3)[:N],
                        dist.reshape(-1)[:N])


def signed_distance(pts: jnp.ndarray, verts: jnp.ndarray,
                    faces: jnp.ndarray, inside_positive: bool = True):
    """igl.signed_distance equivalent; sign from ray-crossing parity.
    Returns (sdf (N,), ClosestPoint)."""
    cp = closest_point_on_mesh(pts, verts, faces)
    inside = points_inside_mesh(pts, verts[faces])
    sign = jnp.where(inside, 1.0, -1.0)
    if not inside_positive:
        sign = -sign
    return sign * cp.dist, cp
