"""Binary morphology + distance transform on device.

Replaces the reference's cv2.erode / cv2.distanceTransform host calls inside
the per-frame fusion loop (reference normal_fusion/normal_fusion.py:106-109).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def erode_3x3(mask: jnp.ndarray, iterations: int = 1) -> jnp.ndarray:
    """Binary erosion with a 3x3 rect kernel (cv2.erode semantics: border
    replicate, so edge pixels erode against their own value).

    mask: (H, W) bool or {0,1}.
    """
    m = mask.astype(jnp.float32)
    for _ in range(iterations):
        # min filter == -max(-m); the -inf pad value drops out of the max,
        # i.e. out-of-bounds counts as "set" — cv2.erode's default border.
        m = -jax.lax.reduce_window(
            -m, -jnp.inf, jax.lax.max, (3, 3), (1, 1),
            [(1, 1), (1, 1)])
    return m > 0.5


def _dt_1d(init: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 1-D L1 distance relaxation along an axis via min-plus against
    the |i-j| cost matrix (O(n^2) vectorized — n=512 is tiny for the VPU/MXU
    and avoids sequential scans)."""
    n = init.shape[axis]
    i = jnp.arange(n)
    cost = jnp.abs(i[:, None] - i[None, :]).astype(init.dtype)  # (n, n)
    moved = jnp.moveaxis(init, axis, -1)                        # (..., n)
    out = jnp.min(moved[..., None, :] + cost, axis=-1)          # (..., n)
    return jnp.moveaxis(out, -1, axis)


def distance_transform_l1(mask: jnp.ndarray,
                          big: float = 1e6) -> jnp.ndarray:
    """L1 (cityblock) distance to the nearest zero pixel, exact.

    Matches cv2.distanceTransform(mask, DIST_L1, 3) semantics: distance is 0
    on zero pixels; nonzero pixels get the L1 distance to the closest zero.
    mask: (H, W) {0,1}.
    """
    init = jnp.where(mask > 0, big, 0.0).astype(jnp.float32)
    d = _dt_1d(init, 1)   # rows
    d = _dt_1d(d, 0)      # then columns (L1 is separable this way)
    return d
