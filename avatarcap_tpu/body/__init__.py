"""SMPL body model: loading, forward kinematics, skinning."""

from avatarcap_tpu.body.smpl import SmplParams, smpl_forward, canonical_pose  # noqa: F401
from avatarcap_tpu.body.skinning import skin_points, skin_normals  # noqa: F401
