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
