"""Ray generation and ray/AABB intersection.

Static-shape equivalents of the reference ray utilities
(reference utils/nerf_util.py:21-99). Instead of boolean compaction
(dynamic shapes), intersection returns (near, far, hit_mask) for every ray;
downstream code masks rather than filters — the TPU-friendly trade.

Both functions are backend-generic (``xp`` = jnp for device code, np for
the host-side data pipeline in data/ray_sampling.py) so the ray/AABB
conventions live in exactly one place.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def _matmul(xp, a, b):
    # bf16 is the default matmul precision on TPU (and CPU in recent jax);
    # small-geometry math must pin full precision or golden tests drift.
    if xp is np:
        return a @ b
    return jnp.matmul(a, b, precision="highest")


def get_rays(H: int, W: int, K, R, T, xp=jnp):
    """Per-pixel world-space rays from intrinsics/extrinsics.

    Same conventions as reference utils/nerf_util.py:21-35 — pixel grid at
    integer coordinates (x, y, 1), directions normalized — via the reduced
    form: with world->camera x_c = R x_w + T, the camera center is
    o = -R^T T and the ray through pixel p is d = R^T K^{-1} (x, y, 1).

    Returns:
      rays_o: (H, W, 3), rays_d: (H, W, 3).
    """
    T = xp.reshape(T, (3,))
    rays_o = -_matmul(xp, R.T, T)
    i, j = xp.meshgrid(xp.arange(W, dtype=rays_o.dtype),
                       xp.arange(H, dtype=rays_o.dtype), indexing="xy")
    xy1 = xp.stack([i, j, xp.ones_like(i)], axis=-1)
    # rows of xy1 are pixel vectors: p K^{-T} R = (R^T K^{-1} p^T)^T
    rays_d = _matmul(xp, _matmul(xp, xy1, xp.linalg.inv(K).T), R)
    rays_d = rays_d / xp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = xp.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def get_near_far(bounds, ray_o, ray_d, xp=jnp):
    """Ray/AABB intersection via the 6 box planes.

    Replicates the reference's plane-intersection formulation including its
    0.01 bound padding and "exactly two plane hits" rule
    (reference utils/nerf_util.py:68-99), but with static shapes.

    Args:
      bounds: (2, 3) min/max corners.
      ray_o, ray_d: (N, 3).
    Returns:
      near: (N,), far: (N,), mask_at_box: (N,) bool. near/far are 0 where
      the ray misses.
    """
    pad = xp.asarray([-0.01, 0.01], dtype=ray_o.dtype)
    bounds = bounds + pad[:, None]
    nominator = bounds[None] - ray_o[:, None]  # (N, 2, 3)
    d_intersect = (nominator / (ray_d[:, None] + 1e-9)).reshape(-1, 6)
    p_intersect = (d_intersect[..., None] * ray_d[:, None]
                   + ray_o[:, None])  # (N, 6, 3)
    eps = 1e-6
    lo = bounds[0] - eps
    hi = bounds[1] + eps
    at_box = xp.all((p_intersect >= lo) & (p_intersect <= hi), axis=-1)
    mask_at_box = xp.sum(at_box, axis=-1) == 2

    # Select the (up to) two in-box intersection depths per ray without
    # compaction: mask out misses with +/-inf and take min/max.
    norm_ray = xp.linalg.norm(ray_d, axis=-1)
    depth = (xp.linalg.norm(p_intersect - ray_o[:, None], axis=-1)
             / norm_ray[:, None])
    near = xp.min(xp.where(at_box, depth, xp.inf), axis=-1)
    far = xp.max(xp.where(at_box, depth, -xp.inf), axis=-1)
    near = xp.where(mask_at_box, near, 0.0)
    far = xp.where(mask_at_box, far, 0.0)
    return near, far, mask_at_box
