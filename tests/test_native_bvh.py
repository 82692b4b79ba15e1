"""Native BVH vs JAX closest-point/signed-distance parity."""

import numpy as np
import jax.numpy as jnp
import pytest

from conftest import uv_sphere

native = pytest.importorskip("avatarcap_tpu.native")
pytestmark = pytest.mark.skipif(not native.available(),
                                reason="g++ build unavailable")


def test_bvh_matches_jax(rng):
    from avatarcap_tpu.ops.closest_point import closest_point_on_mesh, \
        signed_distance

    verts, faces = uv_sphere(n_lat=20, n_lon=28)
    bvh = native.MeshBVH(verts, faces)
    q = rng.standard_normal((2000, 3)).astype(np.float32) * 0.8
    pts, fid, bary, dist = bvh.closest_points(q)
    ref = closest_point_on_mesh(jnp.asarray(q), jnp.asarray(verts),
                                jnp.asarray(faces))
    np.testing.assert_allclose(dist, np.asarray(ref.dist), atol=1e-5)
    np.testing.assert_allclose(pts, np.asarray(ref.points), atol=1e-4)

    sdf = bvh.signed_distance(q)
    ref_sdf, _ = signed_distance(jnp.asarray(q), jnp.asarray(verts),
                                 jnp.asarray(faces))
    np.testing.assert_allclose(sdf, np.asarray(ref_sdf), atol=1e-5)


def test_bvh_throughput(rng):
    import time
    verts, faces = uv_sphere(n_lat=60, n_lon=80)  # ~9.5k tris
    bvh = native.MeshBVH(verts, faces)
    q = rng.standard_normal((500000, 3)).astype(np.float32)
    t0 = time.time()
    sdf = bvh.signed_distance(q)
    dt = time.time() - t0
    assert np.isfinite(sdf).all()
    # sanity: ~70k q/s/core observed; this CI box has 1 core. OpenMP scales
    # it on real preprocessing hosts.
    assert 500000 / dt > 3e4
