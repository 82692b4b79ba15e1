"""SMPL body model as pure JAX functions.

The reference runs SMPL forward kinematics on the host in numpy, per data
item (reference dataset/smpl.py:49-110) — a notable CPU hot spot in its
data path (SURVEY §3.1). Here FK is a jittable, vmappable function so whole
batches of poses evaluate on-device.

Pose layout matches the reference: 75-d = [trans(3), 24 x axis-angle(3)]
(global rotation is joint 0's axis-angle). Joint 0's local translation is the
global translation, NOT t + (I-R) j0 — a reference quirk we replicate
(reference dataset/smpl.py:86-89).
"""

from __future__ import annotations

import dataclasses
import math
import pickle
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from avatarcap_tpu.ops.se3 import axis_angle_to_matrix


@dataclasses.dataclass(frozen=True)
class SmplParams:
    """Static SMPL model data (loaded once from the official pkl).

    Mirrors the fields the reference reads (dataset/smpl.py:10-43).
    """

    v_template: np.ndarray       # (V, 3)
    faces: np.ndarray            # (F, 3) int32
    joints_template: np.ndarray  # (J, 3) — unused by FK (recomputed), kept for parity
    kintree_parents: np.ndarray  # (J,) int32, parent index, -1/garbage for root
    weights: np.ndarray          # (V, J)
    j_regressor: np.ndarray      # (J, V) dense
    shapedirs: np.ndarray        # (V*3, S)

    @property
    def num_vertices(self) -> int:
        return self.v_template.shape[0]

    @property
    def num_joints(self) -> int:
        return self.weights.shape[1]

    @staticmethod
    def load(pkl_path: str) -> "SmplParams":
        with open(pkl_path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        j_reg = data["J_regressor"]
        if hasattr(j_reg, "toarray"):
            j_reg = j_reg.toarray()
        v_template = np.asarray(data["v_template"], np.float32)
        vnum = v_template.shape[0]
        return SmplParams(
            v_template=v_template,
            faces=np.asarray(data["f"], np.int32),
            joints_template=np.asarray(data["J"], np.float32),
            kintree_parents=np.asarray(data["kintree_table"], np.int64)
            .T[:, 0].astype(np.int32),
            weights=np.asarray(data["weights"], np.float32),
            j_regressor=np.asarray(j_reg, np.float32),
            shapedirs=np.asarray(data["shapedirs"], np.float32)
            .reshape(vnum * 3, -1),
        )


class SmplOutput(NamedTuple):
    vertices: jnp.ndarray          # (V, 3) posed vertices
    joints: jnp.ndarray            # (J, 3) posed joints
    jnt_affine_mats: jnp.ndarray   # (J, 4, 4) joint transforms (cano-template -> posed)
    vertex_affine_mats: jnp.ndarray  # (V, 4, 4) per-vertex LBS transforms
    shaped_vertices: jnp.ndarray   # (V, 3) shape-blended rest vertices
    shaped_joints: jnp.ndarray     # (J, 3) rest joints


def canonical_pose(num_joints: int = 24, leg_angle_deg: float = 25.0) -> np.ndarray:
    """Canonical pose: zero + legs spread +/-25deg about z
    (reference utils/smpl_util.py:16-18)."""
    pose = np.zeros(3 + 3 * num_joints, np.float32)
    pose[3 + 3 * 1 + 2] = math.radians(leg_angle_deg)
    pose[3 + 3 * 2 + 2] = math.radians(-leg_angle_deg)
    return pose


def smpl_forward(params: SmplParams, pose: jnp.ndarray,
                 shape: jnp.ndarray) -> SmplOutput:
    """SMPL forward kinematics + LBS (jit/vmap-friendly).

    Args:
      params: static model data (numpy arrays close over as constants).
      pose: (75,) = [trans(3), 24*axis_angle(3)].
      shape: (S,) shape coefficients (S=10).

    Matches reference dataset/smpl.py:67-110 numerically.
    """
    J = params.num_joints
    v_template = jnp.asarray(params.v_template)
    shapedirs = jnp.asarray(params.shapedirs)
    j_regressor = jnp.asarray(params.j_regressor)
    weights = jnp.asarray(params.weights)
    parents = np.asarray(params.kintree_parents)

    # Shape blend (reference :67-74).
    shaped = (v_template.reshape(-1)
              + jnp.matmul(shapedirs, shape, precision="highest")).reshape(-1, 3)
    joints = jnp.matmul(j_regressor, shaped, precision="highest")  # (J, 3)

    # Local per-joint transforms (reference :76-90).
    aa = pose[3:].reshape(J, 3)
    rots = axis_angle_to_matrix(aa)  # (J, 3, 3)
    # Non-root: t_local = (I - R) j ; root: t_local = global translation.
    t_nonroot = joints - jnp.einsum("jab,jb->ja", rots, joints,
                                    precision="highest")
    t_local = t_nonroot.at[0].set(pose[:3])
    local = jnp.zeros((J, 4, 4), pose.dtype)
    local = local.at[:, :3, :3].set(rots)
    local = local.at[:, :3, 3].set(t_local)
    local = local.at[:, 3, 3].set(1.0)

    # Kinematic chain accumulation (reference :92-98). The kintree is
    # topologically ordered (parent index < child index), so a static
    # Python loop over 24 joints unrolls cleanly under jit.
    mats = [local[0]]
    for j in range(1, J):
        mats.append(jnp.matmul(mats[int(parents[j])], local[j],
                               precision="highest"))
    jnt_mats = jnp.stack(mats)  # (J, 4, 4)

    posed_joints = (jnp.einsum("jab,jb->ja", jnt_mats[:, :3, :3], joints,
                               precision="highest")
                    + jnt_mats[:, :3, 3])

    # LBS (reference :107-110).
    vert_mats = jnp.einsum("vj,jab->vab", weights, jnt_mats,
                           precision="highest")
    posed_vertices = (jnp.einsum("vab,vb->va", vert_mats[:, :3, :3], shaped,
                                 precision="highest")
                      + vert_mats[:, :3, 3])

    return SmplOutput(posed_vertices, posed_joints, jnt_mats, vert_mats,
                      shaped, joints)


def smpl_forward_batch(params: SmplParams, poses: jnp.ndarray,
                       shape: jnp.ndarray) -> SmplOutput:
    """vmap of smpl_forward over a batch of poses (shared shape)."""
    return jax.vmap(lambda p: smpl_forward(params, p, shape))(poses)
