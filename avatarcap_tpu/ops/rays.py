"""Ray generation and ray/AABB intersection.

Static-shape JAX equivalents of the reference ray utilities
(reference utils/nerf_util.py:21-99). Instead of boolean compaction
(dynamic shapes), intersection returns (near, far, hit_mask) for every ray;
downstream code masks rather than filters — the TPU-friendly trade.
"""

from __future__ import annotations

import jax.numpy as jnp


def get_rays(H: int, W: int, K: jnp.ndarray, R: jnp.ndarray,
             T: jnp.ndarray):
    """Per-pixel world-space rays from intrinsics/extrinsics.

    Matches reference utils/nerf_util.py:21-35: pixel grid at integer
    coordinates (x, y, 1), directions normalized.

    Returns:
      rays_o: (H, W, 3), rays_d: (H, W, 3).
    """
    T = T.reshape(3)
    rays_o = -jnp.matmul(R.T, T, precision="highest")  # camera origin in world space
    i, j = jnp.meshgrid(jnp.arange(W, dtype=K.dtype),
                        jnp.arange(H, dtype=K.dtype), indexing="xy")
    xy1 = jnp.stack([i, j, jnp.ones_like(i)], axis=-1)
    pixel_camera = jnp.matmul(xy1, jnp.linalg.inv(K).T, precision="highest")
    pixel_world = jnp.matmul(pixel_camera - T, R, precision="highest")
    rays_d = pixel_world - rays_o
    rays_d = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    rays_o = jnp.broadcast_to(rays_o, rays_d.shape)
    return rays_o, rays_d


def get_near_far(bounds: jnp.ndarray, ray_o: jnp.ndarray,
                 ray_d: jnp.ndarray):
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
    bounds = bounds + jnp.array([-0.01, 0.01], bounds.dtype)[:, None]
    nominator = bounds[None] - ray_o[:, None]  # (N, 2, 3)
    d_intersect = (nominator / (ray_d[:, None] + 1e-9)).reshape(-1, 6)
    p_intersect = (d_intersect[..., None] * ray_d[:, None]
                   + ray_o[:, None])  # (N, 6, 3)
    eps = 1e-6
    lo = bounds[0] - eps
    hi = bounds[1] + eps
    at_box = jnp.all((p_intersect >= lo) & (p_intersect <= hi), axis=-1)  # (N, 6)
    mask_at_box = jnp.sum(at_box, axis=-1) == 2

    # Select the (up to) two in-box intersection depths per ray without
    # compaction: mask out misses with +/-inf and take min/max.
    norm_ray = jnp.linalg.norm(ray_d, axis=-1)
    depth = jnp.linalg.norm(p_intersect - ray_o[:, None], axis=-1) / norm_ray[:, None]
    near = jnp.min(jnp.where(at_box, depth, jnp.inf), axis=-1)
    far = jnp.max(jnp.where(at_box, depth, -jnp.inf), axis=-1)
    near = jnp.where(mask_at_box, near, 0.0)
    far = jnp.where(mask_at_box, far, 0.0)
    return near, far, mask_at_box
