"""Point-in-mesh test via +z ray-crossing parity.

Replaces trimesh/embree ``contains`` (reference dataset/avatarcap_dataset.py:
121-125, used once per subject to assign inside/outside occupancy to grid
points outside the near-SMPL band). Brute force over all triangles per
point chunk — the SMPL mesh is small (13,776 tris) and this runs once.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _crossings_chunk(pts: jnp.ndarray, tris: jnp.ndarray) -> jnp.ndarray:
    """pts: (C, 3); tris: (F, 3, 3) -> (C,) crossing counts of the +z ray."""
    a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]   # (F, 3)
    p = pts[:, None, :2]                           # (C, 1, 2)
    a2, b2, c2 = a[None, :, :2], b[None, :, :2], c[None, :, :2]

    def edge(p0, p1, q):
        return ((p1[..., 0] - p0[..., 0]) * (q[..., 1] - p0[..., 1])
                - (p1[..., 1] - p0[..., 1]) * (q[..., 0] - p0[..., 0]))

    e0 = edge(a2, b2, p)
    e1 = edge(b2, c2, p)
    e2 = edge(c2, a2, p)
    inside_2d = ((e0 >= 0) & (e1 >= 0) & (e2 >= 0)) | \
                ((e0 <= 0) & (e1 <= 0) & (e2 <= 0))
    area = edge(a2, b2, c2)                        # (1, F)
    w0 = e1 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    w1 = e2 / jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
    w2 = 1.0 - w0 - w1
    z_hit = w0 * a[None, :, 2] + w1 * b[None, :, 2] + w2 * c[None, :, 2]
    hit = inside_2d & (jnp.abs(area) > 1e-12) & (z_hit > pts[:, None, 2])
    return jnp.sum(hit, axis=-1)


@functools.partial(jax.jit, static_argnames=("chunk",))
def points_inside_mesh(pts: jnp.ndarray, tris: jnp.ndarray,
                       chunk: int = 8192) -> jnp.ndarray:
    """(N, 3) points, (F, 3, 3) closed mesh -> (N,) bool inside flags."""
    N = pts.shape[0]
    pad = (-N) % chunk
    pp = jnp.pad(pts, ((0, pad), (0, 0))).reshape(-1, chunk, 3)
    counts = jax.lax.map(lambda q: _crossings_chunk(q, tris), pp)
    return (counts.reshape(-1)[:N] % 2) == 1
