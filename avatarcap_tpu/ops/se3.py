"""Rotation / rigid-transform math.

Closed-form Rodrigues replaces the host-side ``cv2.Rodrigues`` calls of the
reference (reference dataset/smpl.py:81, normal_fusion/normal_fusion.py:124's
pytorch3d ``axis_angle_to_matrix``), so the whole pose path stays on device
and batches under ``vmap``/``jit``.
"""

from __future__ import annotations

import jax.numpy as jnp


def axis_angle_to_matrix(aa: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle vectors -> rotation matrices, Rodrigues formula.

    Args:
      aa: (..., 3) axis-angle (direction = axis, norm = angle in radians).

    Returns:
      (..., 3, 3) rotation matrices. Matches cv2.Rodrigues / pytorch3d
      axis_angle_to_matrix for all inputs, including angle -> 0 (uses a
      Taylor-stable formulation).
    """
    aa = jnp.asarray(aa)
    theta2 = jnp.sum(aa * aa, axis=-1, keepdims=True)  # (..., 1)
    # sin(t)/t and (1-cos(t))/t^2 with small-angle Taylor fallbacks.
    # Double-where keeps the *gradient* finite at theta == 0 (a bare
    # where(small, taylor, f(sqrt(theta2))) still differentiates the sqrt
    # branch at 0 and poisons grads with NaN — the fusion optimizer starts
    # its rotation grid at exactly zero).
    small = theta2[..., 0] < 1e-8
    theta2_safe = jnp.where(small[..., None], 1.0, theta2)
    theta_safe = jnp.sqrt(theta2_safe)
    sin_over = jnp.where(small, 1.0 - theta2[..., 0] / 6.0,
                         jnp.sin(theta_safe[..., 0]) / theta_safe[..., 0])
    one_minus_cos_over = jnp.where(
        small, 0.5 - theta2[..., 0] / 24.0,
        (1.0 - jnp.cos(theta_safe[..., 0])) / theta2_safe[..., 0])

    x, y, z = aa[..., 0], aa[..., 1], aa[..., 2]
    zeros = jnp.zeros_like(x)
    # K = [a]_x (cross-product matrix of the *unnormalized* axis-angle vec)
    K = jnp.stack([
        jnp.stack([zeros, -z, y], axis=-1),
        jnp.stack([z, zeros, -x], axis=-1),
        jnp.stack([-y, x, zeros], axis=-1),
    ], axis=-2)  # (..., 3, 3)
    eye = jnp.broadcast_to(jnp.eye(3, dtype=aa.dtype), K.shape)
    # K @ K == a a^T - |a|^2 I (outer product form: full f32 on the VPU,
    # avoiding TPU default-precision 3x3 matmuls)
    KK = aa[..., :, None] * aa[..., None, :] - theta2[..., None] * eye
    return (eye
            + sin_over[..., None, None] * K
            + one_minus_cos_over[..., None, None] * KK)


def rigid_inverse(mats: jnp.ndarray) -> jnp.ndarray:
    """Invert (..., 4, 4) rigid transforms without a general solve.

    Equivalent to torch.linalg.inv on SE(3) matrices
    (reference network/arch_avatar.py:199) but cheaper and exactly
    orthogonal-friendly: inv([R t; 0 1]) = [R^T -R^T t; 0 1].
    """
    R = mats[..., :3, :3]
    t = mats[..., :3, 3:]
    Rt = jnp.swapaxes(R, -1, -2)
    top = jnp.concatenate([Rt, -Rt @ t], axis=-1)  # (..., 3, 4)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=mats.dtype), top[..., :1, :].shape
    )
    return jnp.concatenate([top, bottom], axis=-2)


def inverse_3x3(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form (adjugate) inverse of batched 3x3 matrices.

    jnp.linalg.inv lowers tiny batched inverses to LU triangular solves
    whose TPU layouts pad the 3/4-wide dims to 128 lanes — observed 18 GB
    of padded temporaries for 3.1M 4x4 inverses. The cofactor formula is
    pure elementwise VPU math.
    """
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    inv_det = 1.0 / jnp.where(jnp.abs(det) < 1e-20, 1.0, det)
    adj = jnp.stack([
        jnp.stack([A, -(b * i - c * h), (b * f - c * e)], -1),
        jnp.stack([B, (a * i - c * g), -(a * f - c * d)], -1),
        jnp.stack([C, -(a * h - b * g), (a * e - b * d)], -1),
    ], -2)
    return adj * inv_det[..., None, None]


def affine_inverse(mats: jnp.ndarray) -> jnp.ndarray:
    """Batched inverse of (..., 4, 4) AFFINE transforms via the closed-form
    3x3 inverse: inv([A t; 0 1]) = [A^-1, -A^-1 t; 0 1]. Unlike
    rigid_inverse this is exact for non-orthogonal A (e.g. blended LBS
    matrices, reference normal_fusion.py:59)."""
    Ainv = inverse_3x3(mats[..., :3, :3])
    t = jnp.einsum("...ij,...j->...i", Ainv, mats[..., :3, 3],
                   precision="highest")
    top = jnp.concatenate([Ainv, -t[..., None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], mats.dtype), top[..., :1, :].shape)
    return jnp.concatenate([top, bottom], axis=-2)


def transform_points(mats: jnp.ndarray, pts: jnp.ndarray) -> jnp.ndarray:
    """Apply (..., 4, 4) affine mats to (..., 3) points (broadcasting)."""
    return jnp.einsum("...ij,...j->...i", mats[..., :3, :3], pts,
                      precision="highest") + mats[..., :3, 3]


def transform_dirs(mats: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """Apply only the rotation part of affine mats to direction vectors."""
    return jnp.einsum("...ij,...j->...i", mats[..., :3, :3], dirs,
                      precision="highest")
