"""Forward/inverse linear blend skinning.

Functional equivalents of the reference's SmplUtil einsums
(reference utils/smpl_util.py:58-81), without the global singleton: the
canonical vertices / skinning weights are explicit arguments.
"""

from __future__ import annotations

import jax.numpy as jnp


def blend_joint_mats(lbs: jnp.ndarray, jnt_mats: jnp.ndarray) -> jnp.ndarray:
    """Per-point affine mats from blend weights.

    Args:
      lbs: (..., N, J), jnt_mats: (..., J, 4, 4).
    Returns:
      (..., N, 4, 4).
    """
    return jnp.einsum("...nj,...jxy->...nxy", lbs, jnt_mats,
                      precision="highest")


def skin_points(points: jnp.ndarray, lbs: jnp.ndarray,
                jnt_mats: jnp.ndarray, return_pt_mats: bool = False):
    """Forward-skin points: reference utils/smpl_util.py:58-74."""
    pt_mats = blend_joint_mats(lbs, jnt_mats)
    out = (jnp.einsum("...nxy,...ny->...nx", pt_mats[..., :3, :3], points,
                      precision="highest")
           + pt_mats[..., :3, 3])
    if return_pt_mats:
        return out, pt_mats
    return out


def skin_normals(normals: jnp.ndarray, lbs: jnp.ndarray,
                 jnt_mats: jnp.ndarray) -> jnp.ndarray:
    """Rotate normals by blended mats (no renormalize), reference :76-81."""
    pt_mats = blend_joint_mats(lbs, jnt_mats)
    return jnp.einsum("...nxy,...ny->...nx", pt_mats[..., :3, :3], normals,
                      precision="highest")
