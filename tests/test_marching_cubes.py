"""Marching tetrahedra + Sobel normal tests on analytic SDFs."""

import numpy as np
import jax.numpy as jnp

from avatarcap_tpu.ops.marching_cubes import marching_tets, mesh_grid_coords
from avatarcap_tpu.ops.sobel import sample_volume_normals


def sphere_volume(res=48, radius=0.6):
    lin = np.linspace(-1, 1, res, dtype=np.float32)
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    # inside-positive SDF (reference convention)
    sdf = radius - np.sqrt(x * x + y * y + z * z)
    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], np.float32)
    voxel = (bounds[1] - bounds[0]) / res
    return sdf, bounds, voxel


class TestMarchingTets:
    def test_sphere_vertices_on_surface(self):
        sdf, bounds, voxel = sphere_volume()
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 17,
                             max_active=1 << 15)
        n = int(mesh.num_tris)
        assert n > 1000 and not bool(mesh.overflow)
        v = np.asarray(mesh.vertices[: 3 * n])
        # reference adds a half-voxel offset; centre shifts by half a voxel
        center = bounds[0] + 0.5 * voxel + (bounds[1] - bounds[0]) * 0.5 \
            - 0.5 * voxel  # = 0 + half-voxel shift cancels in radius check
        r = np.linalg.norm(v - (0.5 * voxel), axis=-1)
        # vertices should sit within a voxel of the sphere
        assert np.abs(r - 0.6).max() < np.linalg.norm(voxel)

    def test_sphere_area_and_orientation(self):
        sdf, bounds, voxel = sphere_volume()
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 17,
                             max_active=1 << 15)
        n = int(mesh.num_tris)
        v = np.asarray(mesh.vertices[: 3 * n]).reshape(n, 3, 3)
        e1 = v[:, 1] - v[:, 0]
        e2 = v[:, 2] - v[:, 0]
        cross = np.cross(e1, e2)
        area = 0.5 * np.linalg.norm(cross, axis=-1).sum()
        ref_area = 4 * np.pi * 0.6 ** 2
        assert abs(area - ref_area) / ref_area < 0.05
        # winding: triangle normals should point outward (away from centre)
        centroid = v.mean(axis=1) - 0.5 * voxel
        nz = np.linalg.norm(cross, axis=-1) > 1e-12
        dots = (cross[nz] * centroid[nz]).sum(-1)
        assert (dots > 0).mean() > 0.99

    def test_padding_is_pad_value(self):
        sdf, bounds, voxel = sphere_volume(res=16)
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 14,
                             max_active=1 << 12, pad_value=-1e6)
        n = int(mesh.num_tris)
        v = np.asarray(mesh.vertices)
        assert np.all(v[3 * n:] == -1e6)

    def test_overflow_flag(self):
        sdf, bounds, voxel = sphere_volume(res=32)
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=64,
                             max_active=1 << 12)
        assert bool(mesh.overflow)
        v = np.asarray(mesh.vertices)
        assert v.shape == (64 * 3, 3)

    def test_empty_volume(self):
        sdf = -np.ones((8, 8, 8), np.float32)
        mesh = marching_tets(jnp.asarray(sdf), 0.0,
                             jnp.zeros(3), jnp.ones(3) / 8,
                             max_tris=128, max_active=128)
        assert int(mesh.num_tris) == 0 and not bool(mesh.overflow)


class TestSobelNormals:
    def test_sphere_normals_outward(self):
        sdf, bounds, voxel = sphere_volume()
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 17,
                             max_active=1 << 15)
        n = int(mesh.num_tris)
        v = np.asarray(mesh.vertices[: 3 * n])
        grid = mesh_grid_coords(jnp.asarray(v), jnp.asarray(bounds))
        normals = np.asarray(sample_volume_normals(
            jnp.asarray(sdf), jnp.asarray(voxel), grid))
        np.testing.assert_allclose(np.linalg.norm(normals, axis=-1), 1.0,
                                   atol=1e-4)
        radial = v - 0.5 * voxel
        radial /= np.linalg.norm(radial, axis=-1, keepdims=True)
        cos = (normals * radial).sum(-1)
        assert cos.mean() > 0.99  # outward


class TestMC256VsTets:
    """Cross-validate the derived 256-case table against marching tets:
    same surface (Chamfer ~ sub-voxel), ~2-3x fewer triangles, watertight
    (every edge shared by exactly two triangles with opposite direction),
    and consistent outward winding (positive signed volume)."""

    def _soups(self):
        rng = np.random.RandomState(3)
        # smooth random blobby volume: sum of gaussians, well inside bounds
        res = 48
        lin = np.linspace(-1, 1, res, dtype=np.float32)
        g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        sdf = -np.ones((res, res, res), np.float32) * 0.4
        for _ in range(6):
            c = rng.uniform(-0.4, 0.4, 3).astype(np.float32)
            r = rng.uniform(0.2, 0.35)
            sdf += np.exp(-np.sum((g - c) ** 2, -1) / (r * r)).astype(
                np.float32)
        kw = dict(max_tris=1 << 17, max_active=1 << 15)
        bmin = jnp.asarray([-1.0, -1.0, -1.0])
        voxel = jnp.full((3,), 2.0 / res)
        m_tets = marching_tets(jnp.asarray(sdf), 0.0, bmin, voxel,
                               method="tets", **kw)
        m_256 = marching_tets(jnp.asarray(sdf), 0.0, bmin, voxel,
                              method="mc256", **kw)
        assert not bool(m_tets.overflow) and not bool(m_256.overflow)
        return m_tets, m_256

    @staticmethod
    def _valid_tris(mesh):
        n = int(mesh.num_tris)
        return np.asarray(mesh.vertices[: 3 * n]).reshape(n, 3, 3)

    def test_fewer_tris_same_surface(self):
        m_tets, m_256 = self._soups()
        t_t = self._valid_tris(m_tets)
        t_c = self._valid_tris(m_256)
        ratio = len(t_t) / len(t_c)
        assert 1.8 < ratio < 4.5, ratio
        # symmetric point-to-point Chamfer on triangle centroids vs the
        # other soup's vertices must be well under a voxel (~0.042)
        from avatarcap_tpu.utils.metrics import chamfer_distance
        ca = t_c.mean(axis=1)
        d = float(chamfer_distance(jnp.asarray(ca),
                                   jnp.asarray(t_t.reshape(-1, 3))))
        assert d < 0.03, d

    def test_watertight_and_oriented(self):
        _, m_256 = self._soups()
        t = self._valid_tris(m_256)
        # quantize vertices to kill fp jitter; edges must pair up with
        # opposite orientation (closed, consistently wound 2-manifold)
        q = np.round(t / 1e-5).astype(np.int64)
        from collections import Counter
        directed = Counter()
        for tri in q:
            for i in range(3):
                a = tuple(tri[i])
                b = tuple(tri[(i + 1) % 3])
                directed[(a, b)] += 1
        for (a, b), c in directed.items():
            assert c == directed.get((b, a), 0), "unpaired/mis-wound edge"
        # signed volume positive => outward winding for inside-positive sdf
        v0, v1, v2 = t[:, 0], t[:, 1], t[:, 2]
        vol6 = np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum()
        assert vol6 > 0


class TestGradientNormals:
    def test_sphere_trilinear_normals_outward(self):
        sdf, bounds, voxel = sphere_volume()
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 17,
                             max_active=1 << 15, gradient_normals=True)
        n = int(mesh.num_tris)
        v = np.asarray(mesh.vertices[: 3 * n])
        nm = np.asarray(mesh.normals[: 3 * n])
        np.testing.assert_allclose(np.linalg.norm(nm, axis=-1), 1.0,
                                   atol=1e-4)
        radial = v - 0.5 * voxel
        radial /= np.linalg.norm(radial, axis=-1, keepdims=True)
        cos = (nm * radial).sum(-1)
        assert cos.mean() > 0.99, cos.mean()  # outward, near-radial


class TestEdgeIds:
    def test_shared_vertices_share_ids(self):
        """edge_ids: slots at the SAME position get the SAME id, distinct
        positions distinct ids (the dedup contract of the NeRF color
        path); unique count obeys the Euler bound V ~ T/2 + 2."""
        sdf, bounds, voxel = sphere_volume()
        mesh = marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 17,
                             max_active=1 << 15, with_edge_ids=True)
        n = int(mesh.num_tris)
        ids = np.asarray(mesh.edge_ids)
        v = np.asarray(mesh.vertices)
        assert (ids[3 * n:] == -1).all()
        ids = ids[: 3 * n]
        v = v[: 3 * n]
        assert (ids >= 0).all()
        # group by id: all positions within a group identical
        order = np.argsort(ids, kind="stable")
        sid, sv = ids[order], v[order]
        same = sid[1:] == sid[:-1]
        dv = np.linalg.norm(sv[1:] - sv[:-1], axis=-1)
        # ulp-level only: two cubes may traverse the edge in opposite
        # endpoint order (tt vs 1-tt)
        assert dv[same].max() < 1e-6, "same id, different position"
        # distinct ids are (almost always) geometrically distinct points
        assert (dv[~same] > 1e-7).mean() > 0.999
        n_unique = len(np.unique(ids))
        assert n_unique == int(same.size + 1 - same.sum())
        # closed surface: V = T/2 + 2
        assert abs(n_unique - (n / 2 + 2)) < 3
