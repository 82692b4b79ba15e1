"""SMPL FK tests vs a numpy reproduction of reference dataset/smpl.py."""

import numpy as np
import jax.numpy as jnp
import cv2 as cv

from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
from avatarcap_tpu.body.skinning import skin_points, skin_normals
from avatarcap_tpu.ops.se3 import rigid_inverse


def reference_smpl_numpy(params, pose_coeff, shape_coeff):
    """Line-for-line numpy reproduction of reference dataset/smpl.py:49-110
    semantics, used only as a test oracle."""
    pose_coeff = pose_coeff.reshape(-1, 1)
    shape_coeff = shape_coeff.reshape(-1, 1)
    vnum = params.v_template.shape[0]
    jnum = params.weights.shape[1]

    mean_vec = params.v_template.reshape(vnum * 3, 1)
    shaped = (mean_vec + params.shapedirs @ shape_coeff).reshape(-1, 3)
    joints = params.j_regressor @ shaped

    local_mats = []
    for jidx in range(jnum):
        theta = pose_coeff[3 * jidx + 3: 3 * jidx + 6]
        r = cv.Rodrigues(theta)[0]
        t = np.dot(np.identity(3) - r, joints[jidx].T)
        m = np.identity(4)
        m[:3, :3] = r
        m[:3, 3] = pose_coeff[:3, 0] if jidx == 0 else t
        local_mats.append(m)

    jnt_mats = [local_mats[0]]
    for jidx in range(1, jnum):
        jnt_mats.append(jnt_mats[params.kintree_parents[jidx]] @ local_mats[jidx])
    jnt_mats = np.array(jnt_mats)

    posed_joints = np.einsum("jab,jb->ja", jnt_mats[:, :3, :3], joints) \
        + jnt_mats[:, :3, 3]
    vert_mats = np.einsum("vj,jab->vab", params.weights, jnt_mats)
    posed_v = np.einsum("vab,vb->va", vert_mats[:, :3, :3], shaped) \
        + vert_mats[:, :3, 3]
    return posed_v, posed_joints, jnt_mats, vert_mats


class TestSmplForward:
    def test_matches_reference_random_pose(self, toy_smpl, rng):
        pose = rng.uniform(-0.8, 0.8, 75).astype(np.float32)
        shape = rng.uniform(-1, 1, 10).astype(np.float32)
        ref_v, ref_j, ref_m, ref_vm = reference_smpl_numpy(toy_smpl, pose, shape)
        out = smpl_forward(toy_smpl, jnp.asarray(pose), jnp.asarray(shape))
        np.testing.assert_allclose(np.asarray(out.vertices), ref_v, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.joints), ref_j, atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.jnt_affine_mats), ref_m,
                                   atol=2e-5)
        np.testing.assert_allclose(np.asarray(out.vertex_affine_mats), ref_vm,
                                   atol=2e-5)

    def test_zero_pose_is_rest(self, toy_smpl):
        pose = np.zeros(75, np.float32)
        shape = np.zeros(10, np.float32)
        out = smpl_forward(toy_smpl, jnp.asarray(pose), jnp.asarray(shape))
        np.testing.assert_allclose(np.asarray(out.vertices),
                                   toy_smpl.v_template, atol=1e-5)

    def test_canonical_pose_layout(self):
        pose = canonical_pose()
        assert pose.shape == (75,)
        assert pose[3 + 3 * 1 + 2] > 0 and pose[3 + 3 * 2 + 2] < 0
        assert np.count_nonzero(pose) == 2


class TestSkinning:
    def test_roundtrip_inverse(self, toy_smpl, rng):
        pose = rng.uniform(-0.5, 0.5, 75).astype(np.float32)
        shape = np.zeros(10, np.float32)
        cano = smpl_forward(toy_smpl, jnp.asarray(canonical_pose()),
                            jnp.asarray(shape))
        live = smpl_forward(toy_smpl, jnp.asarray(pose), jnp.asarray(shape))
        cano2live = live.jnt_affine_mats @ rigid_inverse(cano.jnt_affine_mats)
        w = jnp.asarray(toy_smpl.weights)
        live_pts = skin_points(cano.vertices, w, cano2live)
        # forward-then-inverse with the exact inverse of the per-point
        # blended mats must round-trip (blended mats are affine, not rigid,
        # so use a general inverse here)
        from avatarcap_tpu.body.skinning import blend_joint_mats
        pt_mats = np.asarray(blend_joint_mats(w, cano2live))
        inv = np.linalg.inv(pt_mats)
        back = np.einsum("nxy,ny->nx", inv[:, :3, :3],
                         np.asarray(live_pts)) + inv[:, :3, 3]
        np.testing.assert_allclose(back, np.asarray(cano.vertices), atol=1e-4)

    def test_normals_rotation_only(self, toy_smpl):
        # pure translation transforms should leave normals unchanged
        mats = jnp.tile(jnp.eye(4), (24, 1, 1))
        mats = mats.at[:, :3, 3].set(jnp.array([1.0, 2.0, 3.0]))
        w = jnp.asarray(toy_smpl.weights)
        n = jnp.asarray(np.random.RandomState(0).standard_normal(
            (toy_smpl.num_vertices, 3)).astype(np.float32))
        out = skin_normals(n, w, mats)
        np.testing.assert_allclose(np.asarray(out), np.asarray(n), atol=1e-5)
