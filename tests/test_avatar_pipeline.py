"""GeoTexAvatar pipeline semantics tests (inverse skinning, masking, rays).

Setup is module-scoped and entry points are jitted once with shared shapes —
eager per-op dispatch on the CPU test platform is otherwise dominated by
tiny-op compiles.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from avatarcap_tpu.models.avatar import GeoTexAvatar
from avatarcap_tpu.pipeline.avatar import (
    AvatarStatics, FrameInputs, avatar_forward, render_rays,
    query_occupancy, compute_pose_features, inverse_skin_points)
from avatarcap_tpu.ops.se3 import axis_angle_to_matrix

N_PTS = 64
N_RAYS = 16
N_SAMP = 8


def _build():
    rng = np.random.RandomState(31359)
    J = 24
    verts = rng.uniform(-0.4, 0.4, (128, 3)).astype(np.float32)
    w = rng.uniform(0, 1, (128, J)).astype(np.float32) ** 4
    w /= w.sum(-1, keepdims=True)
    wv = np.zeros((16, 16, 16, J), np.float32)
    wv[..., 0] = 1.0  # one-hot joint 0 -> rigid motion is exactly invertible
    statics = AvatarStatics(
        weight_volume=jnp.asarray(wv),
        cano_smpl_vertices=jnp.asarray(verts),
        smpl_skinning_weights=jnp.asarray(w),
        cano_bounds=jnp.asarray(
            np.array([[-1, -1, -1], [1, 1, 1]], np.float32)),
        cano_smpl_center=jnp.zeros(3),
    )
    R = np.asarray(axis_angle_to_matrix(
        jnp.asarray([0.3, -0.2, 0.5], jnp.float32)))
    M = np.eye(4, dtype=np.float32)
    M[:3, :3] = R
    M[:3, 3] = [0.1, 0.2, -0.1]
    mats = np.tile(M, (J, 1, 1))
    live_v = verts @ R.T + M[:3, 3]
    frame = FrameInputs(
        live_smpl_v=jnp.asarray(live_v)[None],
        cano2live_jnt_mats=jnp.asarray(mats)[None],
        smpl_pos_map=jnp.asarray(
            rng.standard_normal((1, 128, 128, 6)).astype(np.float32)),
    )
    module = GeoTexAvatar(if_type="sdf")
    variables = jax.jit(module.init)(jax.random.PRNGKey(0),
                                     jnp.zeros((1, 8, 3)),
                                     frame.smpl_pos_map,
                                     statics.cano_smpl_center[None])
    feat, _ = jax.jit(
        lambda v, x: compute_pose_features(module, v, x))(
            variables, frame.smpl_pos_map)

    fwd = {}
    for space in ("posed", "cano", "temp"):
        fwd[space] = jax.jit(functools.partial(
            lambda v, p, d, f, fr, s, space: avatar_forward(
                module, v, p, d, f, fr, s, space)[0], space=space))

    occ_fn = jax.jit(lambda v, p, f, s: query_occupancy(module, v, p, f, s)[0])
    occ_train_fn = jax.jit(
        lambda v, p, f, s: query_occupancy(module, v, p, f, s, train=True))
    rays_fn = jax.jit(lambda v, ro, rd, nr, fa, de, f, fr, s: render_rays(
        module, v, ro, rd, nr, fa, de, f, fr, s, n_samples=N_SAMP)[0])
    return dict(module=module, variables=variables, statics=statics,
                frame=frame, feat=feat, fwd=fwd, occ_fn=occ_fn,
                occ_train_fn=occ_train_fn, rays_fn=rays_fn,
                inv_fn=jax.jit(lambda p, fr, s: inverse_skin_points(p, fr, s)))


@pytest.fixture(scope="module")
def env():
    return _build()


def rand_pts(scale=0.2, seed=1):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(-scale, scale,
                                   (1, N_PTS, 3)).astype(np.float32))


class TestInverseSkinning:
    def test_rigid_roundtrip_exact(self, env):
        cano_gt = rand_pts(0.3)
        M = np.asarray(env["frame"].cano2live_jnt_mats[0, 0])
        posed = cano_gt @ M[:3, :3].T + M[:3, 3]
        cano_back, near = env["inv_fn"](posed, env["frame"], env["statics"])
        np.testing.assert_allclose(np.asarray(cano_back), np.asarray(cano_gt),
                                   atol=1e-5)

    def test_near_flag_far_points(self, env):
        far_pts = jnp.full((1, N_PTS, 3), 50.0)
        _, near = env["inv_fn"](far_pts, env["frame"], env["statics"])
        assert not bool(near.any())


class TestAvatarForward:
    def test_posed_equals_cano_for_rigid(self, env):
        cano_pts = rand_pts()
        M = np.asarray(env["frame"].cano2live_jnt_mats[0, 0])
        posed = cano_pts @ M[:3, :3].T + M[:3, 3]
        dists = jnp.full((1, N_PTS), 0.01)
        out_p = env["fwd"]["posed"](env["variables"], posed, dists,
                                    env["feat"], env["frame"], env["statics"])
        out_c = env["fwd"]["cano"](env["variables"], cano_pts, dists,
                                   env["feat"], env["frame"], env["statics"])
        np.testing.assert_allclose(np.asarray(out_p["raw"]),
                                   np.asarray(out_c["raw"]), atol=1e-4)
        np.testing.assert_allclose(np.asarray(out_p["occ"]),
                                   np.asarray(out_c["occ"]), atol=1e-4)

    def test_alpha_masked_outside(self, env):
        pts = jnp.full((1, N_PTS, 3), 30.0)
        dists = jnp.full((1, N_PTS), 0.1)
        out = env["fwd"]["cano"](env["variables"], pts, dists, env["feat"],
                                 env["frame"], env["statics"])
        np.testing.assert_allclose(np.asarray(out["raw"][..., 3]), 0.0)

    def test_temp_space_no_offsets(self, env):
        out = env["fwd"]["temp"](env["variables"], rand_pts(),
                                 jnp.full((1, N_PTS), 0.01), env["feat"],
                                 env["frame"], env["statics"])
        np.testing.assert_array_equal(np.asarray(out["nonrigid_offset"]), 0.0)


class TestRenderRays:
    def test_shapes_finite_bounded(self, env):
        B, R = 1, N_RAYS
        ray_o = jnp.tile(jnp.array([0.0, 0.0, -2.0]), (B, R, 1))
        ray_d = jnp.tile(jnp.array([0.0, 0.0, 1.0]), (B, R, 1))
        near = jnp.full((B, R), 1.0)
        far = jnp.full((B, R), 3.0)
        depth = jnp.zeros((B, R)).at[0, :8].set(2.0)
        out = env["rays_fn"](env["variables"], ray_o, ray_d, near, far,
                             depth, env["feat"], env["frame"], env["statics"])
        assert out["rgb_map"].shape == (B, R, 3)
        assert out["nonrigid_offset"].shape == (B, R * N_SAMP, 3)
        assert bool(jnp.isfinite(out["rgb_map"]).all())
        acc = np.asarray(out["acc_map"])
        assert np.all(acc >= 0) and np.all(acc <= 1 + 1e-5)


class TestQueryOccupancy:
    def test_matches_forward_cano_geometry(self, env):
        pts = rand_pts()
        occ_out = env["occ_fn"](env["variables"], pts, env["feat"],
                                env["statics"])
        fwd_out = env["fwd"]["cano"](env["variables"], pts,
                                     jnp.full((1, N_PTS), 0.01), env["feat"],
                                     env["frame"], env["statics"])
        np.testing.assert_allclose(np.asarray(occ_out["cano_pts_ov"]),
                                   np.asarray(fwd_out["occ"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(occ_out["nonrigid_offset"]),
                                   np.asarray(fwd_out["nonrigid_offset"]),
                                   atol=1e-5)

    def test_train_mode_updates_batch_stats(self, env):
        _, updates = env["occ_train_fn"](env["variables"], rand_pts(),
                                         env["feat"], env["statics"])
        assert "batch_stats" in updates
        assert jax.tree.leaves(updates["batch_stats"])
