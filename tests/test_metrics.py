"""Chamfer metric tests."""

import numpy as np
import jax.numpy as jnp

from avatarcap_tpu.utils.metrics import chamfer_distance, mesh_chamfer
from avatarcap_tpu.ops.marching_cubes import marching_tets


def test_chamfer_identical_zero(rng):
    a = jnp.asarray(rng.standard_normal((500, 3)).astype(np.float32))
    assert float(chamfer_distance(a, a)) < 1e-6


def test_chamfer_offset(rng):
    a = jnp.asarray(rng.standard_normal((2000, 3)).astype(np.float32))
    b = a + jnp.asarray([0.1, 0.0, 0.0])
    d = float(chamfer_distance(a, b))
    # dense clouds: one-sided NN dist <= 0.1 each way
    assert 0.0 < d <= 0.2 + 1e-5


def test_mesh_chamfer_spheres():
    def sphere_mesh(radius, res=32):
        lin = np.linspace(-1, 1, res, dtype=np.float32)
        x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
        sdf = radius - np.sqrt(x * x + y * y + z * z)
        bounds = np.array([[-1, -1, -1], [1, 1, 1]], np.float32)
        voxel = (bounds[1] - bounds[0]) / res
        return marching_tets(jnp.asarray(sdf), 0.0, jnp.asarray(bounds[0]),
                             jnp.asarray(voxel), max_tris=1 << 15,
                             max_active=1 << 13)
    m1 = sphere_mesh(0.5)
    m2 = sphere_mesh(0.6)
    d_same = float(mesh_chamfer(m1.vertices, m1.num_tris,
                                m1.vertices, m1.num_tris, samples=20000))
    d_diff = float(mesh_chamfer(m1.vertices, m1.num_tris,
                                m2.vertices, m2.num_tris, samples=20000))
    assert d_same < 0.02
    assert abs(d_diff - 0.2) < 0.05  # 2 x 0.1 radius gap
