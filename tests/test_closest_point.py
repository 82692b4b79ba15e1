"""Closest point / signed distance tests on analytic geometry."""

import numpy as np
import jax.numpy as jnp

from conftest import uv_sphere
from avatarcap_tpu.ops.closest_point import (closest_point_on_mesh,
                                             signed_distance)


class TestClosestPoint:
    def test_sphere_distances(self, rng):
        verts, faces = uv_sphere(n_lat=24, n_lon=32, radius=1.0)
        pts = rng.standard_normal((200, 3)).astype(np.float32)
        pts = pts / np.linalg.norm(pts, axis=-1, keepdims=True) \
            * rng.uniform(0.3, 1.7, (200, 1)).astype(np.float32)
        cp = closest_point_on_mesh(jnp.asarray(pts), jnp.asarray(verts),
                                   jnp.asarray(faces))
        r = np.linalg.norm(pts, axis=-1)
        # distance to a unit sphere ~ |r - 1| (mesh is a coarse sphere)
        np.testing.assert_allclose(np.asarray(cp.dist), np.abs(r - 1.0),
                                   atol=0.02)
        # closest points lie on the mesh surface (radius ~1)
        cr = np.linalg.norm(np.asarray(cp.points), axis=-1)
        assert np.all(cr < 1.001) and np.all(cr > 0.97)

    def test_barycentric_reconstructs_point(self, rng):
        verts, faces = uv_sphere(n_lat=12, n_lon=16)
        pts = rng.standard_normal((50, 3)).astype(np.float32) * 0.8
        cp = closest_point_on_mesh(jnp.asarray(pts), jnp.asarray(verts),
                                   jnp.asarray(faces))
        tri = verts[faces[np.asarray(cp.face_idx)]]
        rec = (np.asarray(cp.bary)[:, :, None] * tri).sum(1)
        np.testing.assert_allclose(rec, np.asarray(cp.points), atol=1e-5)

    def test_signed_distance_signs(self, rng):
        verts, faces = uv_sphere(n_lat=16, n_lon=24)
        inside_pts = rng.standard_normal((50, 3)).astype(np.float32)
        inside_pts = inside_pts / np.linalg.norm(
            inside_pts, axis=-1, keepdims=True) * 0.5
        outside_pts = inside_pts * 3.0
        sdf_in, _ = signed_distance(jnp.asarray(inside_pts),
                                    jnp.asarray(verts), jnp.asarray(faces))
        sdf_out, _ = signed_distance(jnp.asarray(outside_pts),
                                     jnp.asarray(verts), jnp.asarray(faces))
        assert np.all(np.asarray(sdf_in) > 0)   # inside-positive
        assert np.all(np.asarray(sdf_out) < 0)
        np.testing.assert_allclose(np.asarray(sdf_in), 0.5, atol=0.03)
