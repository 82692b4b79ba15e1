"""Capture fast-path approximations vs their exact counterparts.

The capture pipeline's default fast paths (volume-sampled KNN-LBS
skinning, MC-edge Sobel normals) are documented approximations of the
reference semantics; these tests pin their error bounds so a regression
in either approximation is caught, and the exact paths stay available.
"""

import numpy as np
import jax
import jax.numpy as jnp

from conftest import make_toy_smpl_params


class TestVolumeSkinning:
    def test_matches_exact_knn(self, rng):
        """skin_points_by_volume == KNN-Gaussian skinning to ~1 mm at
        1 cm voxels (body/skinning.py fast path)."""
        from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
        from avatarcap_tpu.body.skinning import (
            build_skin_weight_volume, skin_points_by_volume, skin_points)
        from avatarcap_tpu.ops.knn import approx_lbs_weights

        params = make_toy_smpl_params()
        cano = smpl_forward(params, jnp.asarray(canonical_pose()),
                            jnp.zeros(10))
        v = np.asarray(cano.vertices)
        lo = v.min(0) - np.array([0.05, 0.05, 0.15], np.float32)
        hi = v.max(0) + np.array([0.05, 0.05, 0.15], np.float32)
        bounds = jnp.asarray(np.stack([lo, hi]))
        wvol = build_skin_weight_volume(
            cano.vertices, jnp.asarray(params.weights), bounds, voxel=0.01)

        # random joint motion
        J = params.num_joints
        mats = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
        from scipy.spatial.transform import Rotation
        for j in range(J):
            mats[j, :3, :3] = Rotation.from_rotvec(
                0.2 * rng.standard_normal(3)).as_matrix()
            mats[j, :3, 3] = 0.05 * rng.standard_normal(3)
        mats = jnp.asarray(mats)

        # points near the body surface (where captured mesh verts live)
        sel = rng.choice(len(v), 500)
        pts = jnp.asarray(v[sel] + 0.02 * rng.standard_normal((500, 3))
                          .astype(np.float32))

        lbs = approx_lbs_weights(pts, cano.vertices,
                                 jnp.asarray(params.weights))
        exact, exact_mats = skin_points(pts, lbs, mats, return_pt_mats=True)
        fast, fast_mats = skin_points_by_volume(pts, wvol, bounds, mats,
                                                return_pt_mats=True)
        err = np.linalg.norm(np.asarray(exact) - np.asarray(fast), axis=-1)
        assert err.max() < 2e-3, f"max skinning deviation {err.max():.4f} m"
        # fast path returns FLAT (N, 16) mats (body/skinning.py mats16)
        assert fast_mats.shape == (pts.shape[0], 16)
        m_err = np.abs(np.asarray(exact_mats).reshape(-1, 16)
                       - np.asarray(fast_mats)).max()
        assert m_err < 0.05, m_err

        # --- triangle-grouped row gathers (skin_row_group=3) ---------
        # MC-triangle-like triplets: 3 points within one ~5 mm cube near
        # the surface. The shared-cell extrapolation error is ~0.1 mm
        # typical with a ~2.5 mm tail near joints (weight field varies
        # on ~2 cm scales there) — inside the mesh's own half-voxel
        # (~2.6 mm) discretization error and the fast path's 2 mm KNN
        # tolerance above.
        centers = v[rng.choice(len(v), 400)]
        tri_pts = (centers[:, None, :]
                   + 0.005 * rng.standard_normal((400, 3, 3))
                   .astype(np.float32)).reshape(-1, 3)
        tri_pts = jnp.asarray(tri_pts)
        per_pt = skin_points_by_volume(tri_pts, wvol, bounds, mats)
        grouped = skin_points_by_volume(tri_pts, wvol, bounds, mats,
                                        row_group=3)
        g_err = np.linalg.norm(np.asarray(per_pt) - np.asarray(grouped),
                               axis=-1)
        assert g_err.max() < 3e-3, (
            f"grouped-row deviation {g_err.max():.5f} m")
        assert np.median(g_err) < 2e-4, (
            f"median grouped-row deviation {np.median(g_err):.5f} m")

        # triplets strictly inside ONE cell: grouping is EXACT (pure
        # interpolation, no extrapolation) up to fp tolerance
        Gx, Gy, Gz, _ = wvol.shape
        cell_lo = np.asarray(lo) + np.array([3, 4, 5]) * (
            (np.asarray(hi) - np.asarray(lo))
            / (np.array([Gx, Gy, Gz]) - 1))
        inside = jnp.asarray(
            cell_lo + 0.002 + 0.004 * rng.random_sample((5, 3, 3))
        ).reshape(-1, 3).astype(jnp.float32)
        a = skin_points_by_volume(inside, wvol, bounds, mats)
        b = skin_points_by_volume(inside, wvol, bounds, mats, row_group=3)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)


class TestMats16:
    def test_flat_mat_helpers_match_dense(self, rng):
        """mats16_* channel-slice math == dense (N, 4, 4) linalg
        (the flat layout exists so no trailing-(4,4) tensor is ever
        materialized at soup scale — round-3 streaming OOM)."""
        from avatarcap_tpu.body.skinning import (
            blend_joint_mats, blend_joint_mats16, mats16_apply_points,
            mats16_rotate, mats16_inv_rotate)

        J, N = 7, 64
        jm = np.tile(np.eye(4, dtype=np.float32), (J, 1, 1))
        from scipy.spatial.transform import Rotation
        for j in range(J):
            jm[j, :3, :3] = Rotation.from_rotvec(
                0.4 * rng.standard_normal(3)).as_matrix()
            jm[j, :3, 3] = 0.1 * rng.standard_normal(3)
        lbs = rng.random_sample((N, J)).astype(np.float32)
        lbs /= lbs.sum(-1, keepdims=True)
        pts = rng.standard_normal((N, 3)).astype(np.float32)
        vecs = rng.standard_normal((N, 3)).astype(np.float32)
        jm, lbs_j, pts_j, vecs_j = map(jnp.asarray, (jm, lbs, pts, vecs))

        dense = np.asarray(blend_joint_mats(lbs_j, jm))       # (N, 4, 4)
        m16 = blend_joint_mats16(lbs_j, jm)
        np.testing.assert_allclose(np.asarray(m16),
                                   dense.reshape(-1, 16), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(mats16_apply_points(m16, pts_j)),
            np.einsum("nij,nj->ni", dense[:, :3, :3], pts)
            + dense[:, :3, 3], atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(mats16_rotate(m16, vecs_j)),
            np.einsum("nij,nj->ni", dense[:, :3, :3], vecs), atol=1e-5)
        inv = np.linalg.inv(dense[:, :3, :3])
        np.testing.assert_allclose(
            np.asarray(mats16_inv_rotate(m16, vecs_j)),
            np.einsum("nij,nj->ni", inv, vecs), atol=1e-4)


class TestMcEdgeNormals:
    def test_matches_sobel_sampling_on_sphere(self):
        """MC-edge gradient normals align with the reference-style Sobel
        resampling (and with the analytic sphere normal)."""
        from avatarcap_tpu.ops.marching_cubes import (marching_tets,
                                                      mesh_grid_coords)
        from avatarcap_tpu.ops.sobel import (extract_normal_volume,
                                             sample_volume_normals)

        res = 48
        lin = np.linspace(-1, 1, res, dtype=np.float32)
        g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        vol = jnp.asarray(0.6 - np.linalg.norm(g, axis=-1))  # inside-positive
        bmin = jnp.asarray([-1.0, -1.0, -1.0])
        voxel = jnp.asarray([2.0 / res] * 3)
        nvol = extract_normal_volume(vol, voxel)
        mesh = marching_tets(vol, 0.0, bmin, voxel, max_tris=1 << 15,
                             max_active=1 << 13, normal_volume=nvol)
        nt = int(mesh.num_tris)
        assert nt > 500
        fast_n = np.asarray(mesh.normals[: 3 * nt])

        bounds = jnp.stack([bmin, bmin + voxel * res])
        gc = mesh_grid_coords(mesh.vertices, bounds)
        exact_n = np.asarray(sample_volume_normals(vol, voxel, gc)[: 3 * nt])

        dots = np.sum(fast_n * exact_n, axis=-1)
        assert np.quantile(dots, 0.01) > 0.98, np.quantile(dots, 0.01)

        # both should point outward (along +position for a sphere)
        verts = np.asarray(mesh.vertices[: 3 * nt])
        vhat = verts / np.maximum(
            np.linalg.norm(verts, axis=-1, keepdims=True), 1e-9)
        assert np.mean(np.sum(fast_n * vhat, -1)) > 0.99


class TestNormalModes:
    def test_three_modes_agree_on_sphere(self):
        """'trilinear' (default), 'mc_edge', and 'sobel_sample' produce
        near-identical outward normals on a smooth surface."""
        import jax.numpy as jnp
        from avatarcap_tpu.ops.marching_cubes import (marching_tets,
                                                      mesh_grid_coords)
        from avatarcap_tpu.ops.sobel import (extract_normal_volume,
                                             sample_volume_normals)

        res = 48
        lin = np.linspace(-1, 1, res, dtype=np.float32)
        g = np.stack(np.meshgrid(lin, lin, lin, indexing="ij"), -1)
        sdf = 0.6 - np.linalg.norm(g / np.array([0.9, 0.7, 0.8]), axis=-1)
        vol = jnp.asarray(sdf)
        bmin = jnp.asarray([-1.0, -1.0, -1.0])
        voxel = jnp.full((3,), 2.0 / res)
        bounds = jnp.asarray([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        kw = dict(max_tris=1 << 15, max_active=1 << 13)

        m_tri = marching_tets(vol, 0.0, bmin, voxel, gradient_normals=True,
                              **kw)
        n = int(m_tri.num_tris)
        assert n > 100
        v = m_tri.vertices[: 3 * n]

        nvol = extract_normal_volume(vol, voxel)
        m_edge = marching_tets(vol, 0.0, bmin, voxel, normal_volume=nvol,
                               **kw)
        n_samp = sample_volume_normals(vol, voxel,
                                       mesh_grid_coords(v, bounds))

        a = np.asarray(m_tri.normals[: 3 * n])
        b = np.asarray(m_edge.normals[: 3 * n])
        c = np.asarray(n_samp)
        assert (a * b).sum(-1).mean() > 0.995
        assert (a * c).sum(-1).mean() > 0.995
