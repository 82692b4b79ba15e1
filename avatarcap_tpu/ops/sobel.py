"""3D Sobel gradient normals from a scalar volume.

Exact equivalent of the reference's normal extraction
(reference utils/recon_util.py:9-48): a 3x3x3 Sobel filter bank normalized
by (16 * 2 * voxel), trilinearly sampled at mesh vertices, normalized, and
negated by the caller (gradient points inward for inside-positive fields).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from avatarcap_tpu.ops.grid_sample import grid_sample_3d


def _sobel_kernels() -> np.ndarray:
    sx = np.zeros((3, 3, 3), np.float32)
    sx[0] = np.array([[-1, -2, -1], [-2, -4, -2], [-1, -2, -1]], np.float32)
    sx[2] = -sx[0]
    sz = sx.transpose(1, 2, 0)
    sy = sx.transpose(2, 0, 1)
    return np.stack([sx, sy, sz])  # (3, 3, 3, 3) = (out, kx, ky, kz)


_SOBEL = _sobel_kernels()


def extract_normal_volume(volume: jnp.ndarray,
                          voxel_size: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z) scalar volume -> (X, Y, Z, 3) gradient volume."""
    kern = jnp.asarray(_SOBEL) / (16.0 * 2.0 * voxel_size[:, None, None, None])
    out = jax.lax.conv_general_dilated(
        volume[None, None],                # (1, 1, X, Y, Z)
        kern[:, None],                     # (3, 1, 3, 3, 3) OIXYZ
        window_strides=(1, 1, 1),
        padding=((1, 1), (1, 1), (1, 1)),
        dimension_numbers=("NCDHW", "OIDHW", "NCDHW"),
    )
    return jnp.moveaxis(out[0], 0, -1)     # (X, Y, Z, 3)


def sample_volume_normals(volume: jnp.ndarray, voxel_size: jnp.ndarray,
                          pts_grid: jnp.ndarray,
                          eps: float = 1e-12) -> jnp.ndarray:
    """Surface normals at points (reference utils/recon_util.py:32-48).

    Args:
      volume: (X, Y, Z).
      voxel_size: (3,).
      pts_grid: (N, 3) in [-1, 1] normalized volume coords (x, y, z order).
    Returns:
      (N, 3) OUTWARD unit normals (already negated, unlike the reference
      which negates at the call site, main.py:68).
    """
    nvol = extract_normal_volume(volume, voxel_size)   # (X, Y, Z, 3)
    vol_ncdhw = jnp.moveaxis(nvol, -1, 0)[None]        # (1, 3, X, Y, Z)
    grid = pts_grid[:, [2, 1, 0]][None, None, None]    # (1,1,1,N,3)
    n = grid_sample_3d(vol_ncdhw, grid)[0, :, 0, 0]    # (3, N)
    n = n.T
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    return -n / jnp.maximum(norm, eps)
