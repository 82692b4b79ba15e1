"""Golden tests for core ops vs torch / reference math reproductions."""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from avatarcap_tpu.ops.se3 import (axis_angle_to_matrix, rigid_inverse,
                                   transform_points, inverse_3x3,
                                   affine_inverse)
from avatarcap_tpu.ops.embed import positional_encoding, embed_dim
from avatarcap_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from avatarcap_tpu.ops.volume_render import raw2outputs, z_vals_to_dists
from avatarcap_tpu.ops.rays import get_rays, get_near_far
from avatarcap_tpu.ops.knn import knn, approx_lbs_weights


class TestSE3:
    def test_rodrigues_vs_cv2_formula(self, rng):
        import cv2 as cv
        for _ in range(20):
            aa = rng.uniform(-2, 2, 3).astype(np.float32)
            r_ref = cv.Rodrigues(aa)[0]
            r = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
            np.testing.assert_allclose(r, r_ref, atol=1e-5)

    def test_rodrigues_zero(self):
        r = np.asarray(axis_angle_to_matrix(jnp.zeros(3)))
        np.testing.assert_allclose(r, np.eye(3), atol=1e-7)

    def test_rodrigues_tiny_angle(self):
        aa = jnp.array([1e-6, -2e-6, 1e-6])
        r = np.asarray(axis_angle_to_matrix(aa))
        assert np.all(np.isfinite(r))
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)

    def test_rigid_inverse(self, rng):
        aa = rng.uniform(-1, 1, (5, 3)).astype(np.float32)
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        mats = np.tile(np.eye(4, dtype=np.float32), (5, 1, 1))
        mats[:, :3, :3] = R
        mats[:, :3, 3] = rng.uniform(-1, 1, (5, 3))
        inv = np.asarray(rigid_inverse(jnp.asarray(mats)))
        np.testing.assert_allclose(inv @ mats, np.tile(np.eye(4), (5, 1, 1)),
                                   atol=1e-5)

    def test_inverse_3x3_and_affine(self, rng):
        m = rng.standard_normal((50, 3, 3)).astype(np.float32)
        m += 3 * np.eye(3)  # well-conditioned
        inv = np.asarray(inverse_3x3(jnp.asarray(m)))
        np.testing.assert_allclose(inv @ m, np.tile(np.eye(3), (50, 1, 1)),
                                   atol=1e-4)
        a = np.tile(np.eye(4, dtype=np.float32), (50, 1, 1))
        a[:, :3, :3] = m
        a[:, :3, 3] = rng.standard_normal((50, 3))
        ainv = np.asarray(affine_inverse(jnp.asarray(a)))
        np.testing.assert_allclose(ainv @ a, np.tile(np.eye(4), (50, 1, 1)),
                                   atol=1e-4)

    def test_transform_points(self, rng):
        mats = np.eye(4, dtype=np.float32)
        mats[:3, 3] = [1, 2, 3]
        pts = rng.standard_normal((10, 3)).astype(np.float32)
        out = np.asarray(transform_points(jnp.asarray(mats), jnp.asarray(pts)))
        np.testing.assert_allclose(out, pts + np.array([1, 2, 3]), atol=1e-6)


class TestEmbed:
    def _ref_embed(self, x, num_freqs):
        # reproduction of reference utils/net_util.py:11-37 ordering
        outs = [x]
        for f in 2.0 ** np.arange(num_freqs):
            outs.append(np.sin(x * f))
            outs.append(np.cos(x * f))
        return np.concatenate(outs, axis=-1)

    def test_matches_reference_ordering(self, rng):
        x = rng.uniform(-2, 2, (4, 7, 3)).astype(np.float32)
        for nf in (1, 4, 10):
            ref = self._ref_embed(x, nf)
            got = np.asarray(positional_encoding(jnp.asarray(x), nf))
            assert got.shape[-1] == embed_dim(nf, 3)
            np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_zero_freq_identity(self, rng):
        x = rng.standard_normal((5, 3)).astype(np.float32)
        np.testing.assert_array_equal(
            np.asarray(positional_encoding(jnp.asarray(x), 0)), x)


class TestGridSample:
    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_2d_vs_torch(self, rng, mode):
        img = rng.standard_normal((2, 5, 9, 7)).astype(np.float32)
        grid = rng.uniform(-1.3, 1.3, (2, 4, 6, 2)).astype(np.float32)
        ref = F.grid_sample(torch.from_numpy(img), torch.from_numpy(grid),
                            mode, "border", True).numpy()
        got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid),
                                        mode=mode))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    @pytest.mark.parametrize("mode", ["bilinear", "nearest"])
    def test_3d_vs_torch(self, rng, mode):
        vol = rng.standard_normal((1, 4, 6, 5, 7)).astype(np.float32)
        grid = rng.uniform(-1.2, 1.2, (1, 3, 2, 5, 3)).astype(np.float32)
        ref = F.grid_sample(torch.from_numpy(vol), torch.from_numpy(grid),
                            mode, "border", True).numpy()
        got = np.asarray(grid_sample_3d(jnp.asarray(vol), jnp.asarray(grid),
                                        mode=mode))
        np.testing.assert_allclose(got, ref, atol=1e-5)

    def test_2d_exact_grid_points(self):
        # align_corners=True: grid -1/+1 hit exact corner texels
        img = np.arange(12, dtype=np.float32).reshape(1, 1, 3, 4)
        grid = np.array([[[[-1.0, -1.0], [1.0, 1.0]]]], np.float32)
        got = np.asarray(grid_sample_2d(jnp.asarray(img), jnp.asarray(grid)))
        np.testing.assert_allclose(got[0, 0, 0], [0.0, 11.0])


class TestVolumeRender:
    def test_raw2outputs_vs_torch_reproduction(self, rng):
        raw = rng.uniform(0, 1, (16, 8, 4)).astype(np.float32)
        z = np.sort(rng.uniform(1, 3, (16, 8)).astype(np.float32), axis=-1)
        # torch reproduction of reference utils/nerf_util.py:185-212
        traw, tz = torch.from_numpy(raw), torch.from_numpy(z)
        alpha = traw[..., -1]
        weights = alpha * torch.cumprod(
            torch.cat([torch.ones((alpha.shape[0], 1)), 1. - alpha + 1e-10],
                      -1), -1)[:, :-1]
        rgb_ref = torch.sum(weights[..., None] * traw[..., :-1], -2).numpy()
        depth_ref = torch.sum(weights * tz, -1).numpy()
        acc_ref = torch.sum(weights, -1).numpy()

        out = raw2outputs(jnp.asarray(raw), jnp.asarray(z))
        np.testing.assert_allclose(np.asarray(out.rgb_map), rgb_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.depth_map), depth_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.acc_map), acc_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(out.weights), weights.numpy(),
                                   atol=1e-5)

    def test_dists(self):
        z = jnp.array([[1.0, 2.0, 4.0]])
        np.testing.assert_allclose(np.asarray(z_vals_to_dists(z)),
                                   [[1.0, 2.0, 2.0]])


class TestRays:
    def test_get_rays_reference_repro(self, rng):
        H, W = 8, 10
        K = np.array([[100, 0, 5], [0, 100, 4], [0, 0, 1]], np.float32)
        aa = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        T = rng.uniform(-1, 1, (3, 1)).astype(np.float32)
        # numpy reproduction of reference utils/nerf_util.py:21-35
        rays_o_ref = -np.dot(R.T, T).ravel()
        i, j = np.meshgrid(np.arange(W, dtype=np.float32),
                           np.arange(H, dtype=np.float32), indexing="xy")
        xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
        pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
        pixel_world = np.dot(pixel_camera - T.ravel(), R)
        rays_d_ref = pixel_world - rays_o_ref[None, None]
        rays_d_ref /= np.linalg.norm(rays_d_ref, axis=2, keepdims=True)

        ro, rd = get_rays(H, W, jnp.asarray(K), jnp.asarray(R), jnp.asarray(T))
        np.testing.assert_allclose(np.asarray(rd), rays_d_ref, atol=1e-5)
        np.testing.assert_allclose(np.asarray(ro),
                                   np.broadcast_to(rays_o_ref, rays_d_ref.shape),
                                   atol=1e-5)

    def test_near_far_axis_ray(self):
        bounds = jnp.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]])
        ro = jnp.array([[0.0, 0.0, -5.0], [0.0, 3.0, -5.0]])
        rd = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 1.0]])
        near, far, mask = get_near_far(bounds, ro, rd)
        assert bool(mask[0]) and not bool(mask[1])
        np.testing.assert_allclose(float(near[0]), 5 - 1.01, atol=1e-4)
        np.testing.assert_allclose(float(far[0]), 5 + 1.01, atol=1e-4)


class TestKnn:
    def test_vs_numpy_bruteforce(self, rng):
        q = rng.standard_normal((200, 3)).astype(np.float32)
        db = rng.standard_normal((50, 3)).astype(np.float32)
        d2 = ((q[:, None] - db[None]) ** 2).sum(-1)
        ref_idx = np.argsort(d2, axis=-1)[:, :4]
        ref_d = np.take_along_axis(d2, ref_idx, axis=-1)
        dists, idx = knn(jnp.asarray(q), jnp.asarray(db), k=4)
        np.testing.assert_allclose(np.asarray(dists), ref_d, atol=1e-4)
        np.testing.assert_array_equal(np.asarray(idx), ref_idx)

    def test_chunked_equals_unchunked(self, rng):
        q = rng.standard_normal((1000, 3)).astype(np.float32)
        db = rng.standard_normal((64, 3)).astype(np.float32)
        d1, i1 = knn(jnp.asarray(q), jnp.asarray(db), k=2, chunk=128)
        d2_, i2 = knn(jnp.asarray(q), jnp.asarray(db), k=2, chunk=4096)
        np.testing.assert_allclose(np.asarray(d1), np.asarray(d2_), atol=1e-5)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_approx_lbs_weights_reference_repro(self, rng):
        pts = rng.standard_normal((30, 3)).astype(np.float32)
        verts = rng.standard_normal((40, 3)).astype(np.float32)
        w = rng.uniform(0, 1, (40, 24)).astype(np.float32)
        w /= w.sum(-1, keepdims=True)
        # numpy reproduction of reference utils/smpl_util.py:24-39
        d2 = ((pts[:, None] - verts[None]) ** 2).sum(-1)
        idx = np.argsort(d2, -1)[:, :4]
        dd = np.take_along_axis(d2, idx, -1)
        gw = np.exp(-dd / (2 * 0.05 ** 2))
        gw /= gw.sum(-1, keepdims=True) + 1e-16
        ref = (w[idx] * gw[..., None]).sum(-2)
        got = np.asarray(approx_lbs_weights(jnp.asarray(pts), jnp.asarray(verts),
                                            jnp.asarray(w)))
        np.testing.assert_allclose(got, ref, atol=1e-5)


class TestNearDistanceVolume:
    """Distance-to-surface grid + trilinear sampling (the fused NeRF
    color integral's near-body flag; CaptureOptions.near_flag_mode)."""

    def test_matches_exact_knn_within_voxel(self):
        import jax.numpy as jnp
        from avatarcap_tpu.ops.knn import (
            knn, near_distance_volume, sample_distance_volume)
        rng = np.random.RandomState(0)
        verts = jnp.asarray(
            rng.standard_normal((500, 3)).astype(np.float32) * 0.3)
        lo = np.asarray(verts.min(0)) - 0.1
        hi = np.asarray(verts.max(0)) + 0.1
        bounds = jnp.asarray(np.stack([lo, hi]).astype(np.float32))
        voxel = 0.05
        vol, res = near_distance_volume(verts, bounds, voxel=voxel)
        assert all(r >= 2 for r in res)
        q = jnp.asarray(
            (rng.uniform(0, 1, (2000, 3)) * (hi - lo) + lo)
            .astype(np.float32))
        d_interp = np.asarray(sample_distance_volume(vol, q, bounds))
        d_exact = np.sqrt(np.asarray(knn(q, verts, k=1)[0][:, 0]))
        # the distance field is 1-Lipschitz: trilinear interpolation on
        # a `voxel` grid is within one cell diagonal of the true value
        err = np.abs(d_interp - d_exact)
        assert err.max() <= voxel * np.sqrt(3.0) + 1e-5, err.max()

    def test_exact_at_grid_nodes(self):
        import jax.numpy as jnp
        from avatarcap_tpu.ops.knn import (
            knn, near_distance_volume, sample_distance_volume)
        rng = np.random.RandomState(1)
        verts = jnp.asarray(
            rng.standard_normal((100, 3)).astype(np.float32) * 0.2)
        bounds = jnp.asarray(
            np.stack([verts.min(0) - 0.05, verts.max(0) + 0.05]))
        vol, res = near_distance_volume(verts, bounds, voxel=0.04)
        lin = [np.linspace(bounds[0][a], bounds[1][a], res[a],
                           dtype=np.float32) for a in range(3)]
        nodes = jnp.asarray(np.stack(
            np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3))
        d = np.asarray(sample_distance_volume(vol, nodes, bounds))
        d_exact = np.sqrt(np.asarray(knn(nodes, verts, k=1)[0][:, 0]))
        np.testing.assert_allclose(d, d_exact, atol=1e-5)
