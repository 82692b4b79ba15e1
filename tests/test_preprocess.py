"""Preprocessing tools: canonicalization, nonrigid fit, TSDF watertight."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import make_toy_smpl_params, uv_sphere


class TestWatertight:
    def test_sphere_reconstruction(self, rng):
        from avatarcap_tpu.tools.preprocess import watertight_from_points
        # oriented points on a unit sphere
        p = rng.standard_normal((20000, 3)).astype(np.float32)
        p /= np.linalg.norm(p, axis=-1, keepdims=True)
        n = p.copy()  # outward normals
        verts, nt = watertight_from_points(p * 0.5, n, voxel=0.02)
        assert nt > 500
        r = np.linalg.norm(verts, axis=-1)
        # surface near radius 0.5
        assert abs(np.median(r) - 0.5) < 0.03


class TestNonrigidFit:
    def test_translation_recovered(self, rng):
        """Template sphere fit to a translated copy: fit should move it."""
        from avatarcap_tpu.tools.preprocess import nonrigid_fit, \
            vertex_normals
        verts, faces = uv_sphere(n_lat=10, n_lon=12, radius=0.3)
        normals = vertex_normals(verts, faces)
        target = verts + np.array([0.03, 0.0, 0.0], np.float32)
        fitted = nonrigid_fit(verts, normals, target, normals,
                              node_radius=0.08, iterations=120, lr=5e-3)
        err_before = np.linalg.norm(verts - target, axis=-1).mean()
        err_after = np.linalg.norm(fitted - target, axis=-1).mean()
        assert err_after < 0.5 * err_before


class TestCanonicalize:
    def test_roundtrip_scan(self, rng):
        """A 'scan' that IS the posed body must canonicalize onto the
        canonical body."""
        from avatarcap_tpu.tools.preprocess import canonicalize_scan, \
            vertex_normals
        from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
        import jax

        params = make_toy_smpl_params()
        shape = np.zeros(10, np.float32)
        pose = canonical_pose().copy()
        pose[6:] += rng.uniform(-0.2, 0.2, pose.size - 6).astype(np.float32)
        live = smpl_forward(params, jnp.asarray(pose), jnp.asarray(shape))
        scan_v = np.asarray(live.vertices)
        scan_n = vertex_normals(scan_v, params.faces)
        cano_v, cano_n = canonicalize_scan(scan_v, scan_n, pose, shape,
                                           params)
        cano = smpl_forward(params, jnp.asarray(canonical_pose()),
                            jnp.asarray(shape))
        cv = np.asarray(cano.vertices)
        # each canonicalized point is near the canonical body surface
        from avatarcap_tpu.ops.knn import knn
        d2, _ = knn(jnp.asarray(cano_v), jnp.asarray(cv), k=1)
        assert float(jnp.sqrt(d2).mean()) < 0.02
        assert len(cano_v) > 0.5 * len(scan_v)  # culling keeps most points


class TestSubdivide:
    def test_counts_and_surface(self):
        from avatarcap_tpu.tools.preprocess import subdivide_mesh
        verts, faces = uv_sphere(n_lat=6, n_lon=8)
        v2, f2 = subdivide_mesh(verts, faces)
        assert len(f2) == 4 * len(faces)
        # midpoints lie within the unit ball (chords)
        r = np.linalg.norm(v2, axis=-1)
        assert r.max() <= 1.0 + 1e-6 and r.min() > 0.5
