"""Volume rendering compositor.

Exact functional port of the reference's NeRF compositing math
(reference utils/nerf_util.py:185-212): alpha compositing with exclusive
cumulative transmittance product.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class RenderOutputs(NamedTuple):
    rgb_map: jnp.ndarray    # (R, 3)
    disp_map: jnp.ndarray   # (R,)
    acc_map: jnp.ndarray    # (R,)
    weights: jnp.ndarray    # (R, S)
    depth_map: jnp.ndarray  # (R,)


def raw2outputs(raw: jnp.ndarray, z_vals: jnp.ndarray,
                white_bkgd: bool = False) -> RenderOutputs:
    """Composite per-sample (rgb, alpha) along rays.

    Args:
      raw: (R, S, 4) rgb + alpha per sample (alpha already includes the
        1-exp(-sigma*dist) transform, as in the reference where GeoTexAvatar
        emits alpha directly, network/arch_avatar.py:227-229).
      z_vals: (R, S) sample depths.
    """
    rgb = raw[..., :-1]
    alpha = raw[..., -1]
    # Exclusive cumprod of (1 - alpha): T_i = prod_{j<i} (1 - a_j + 1e-10).
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1)
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(1e-10, depth_map / acc_map)
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return RenderOutputs(rgb_map, disp_map, acc_map, weights, depth_map)


def stratified_z_vals(near: jnp.ndarray, far: jnp.ndarray, n_samples: int,
                      perturb: bool, rng=None) -> jnp.ndarray:
    """Sample depths along rays (reference network/arch_avatar.py:244-263).

    Args:
      near/far: (..., R).
    Returns:
      (..., R, S).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=near.dtype)
    z_vals = near[..., None] * (1.0 - t) + far[..., None] * t
    if perturb and rng is not None:
        import jax
        mids = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        upper = jnp.concatenate([mids, z_vals[..., -1:]], axis=-1)
        lower = jnp.concatenate([z_vals[..., :1], mids], axis=-1)
        t_rand = jax.random.uniform(rng, z_vals.shape, dtype=z_vals.dtype)
        z_vals = lower + (upper - lower) * t_rand
    return z_vals


def z_vals_to_dists(z_vals: jnp.ndarray) -> jnp.ndarray:
    """Per-sample segment lengths; last repeats (reference arch_avatar.py:277-278)."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    return jnp.concatenate([dists, dists[..., -1:]], axis=-1)
