"""grid_sample with PyTorch semantics (align_corners=True, border padding).

The reference leans on ``F.grid_sample`` at four load-bearing call sites
(reference network/arch_avatar.py:133,159, network/arch_recon.py:68,
utils/recon_util.py:42, normal_fusion/normal_fusion.py:35,46,76,87); getting
the half-texel conventions wrong silently destroys Chamfer parity, so these
are implemented as exact equivalents and golden-tested against torch.

Implementation notes (TPU): sampling is pure gather + lerp. Channels-last
layout (NHWC / NDHWC) is used internally so the innermost (lane) dimension is
the channel axis, which XLA maps well; the public API mirrors torch's NCHW
for drop-in familiarity.
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool) -> jnp.ndarray:
    if align_corners:
        return (coord + 1.0) * 0.5 * (size - 1)
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img: (N, H, W, C); ix/iy: (N, P) int32 -> (N, P, C)."""
    return jnp.take_along_axis(
        img.reshape(img.shape[0], -1, img.shape[-1]),
        (iy * img.shape[2] + ix)[..., None],
        axis=1,
    )


def grid_sample_2d(
    input_nchw: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent for 4-D inputs.

    Args:
      input_nchw: (N, C, H, W).
      grid: (N, Hg, Wg, 2) normalized coords, grid[..., 0]=x (width axis),
        grid[..., 1]=y (height axis).
    Returns:
      (N, C, Hg, Wg).
    """
    assert padding_mode == "border", "only border padding is implemented"
    N, C, H, W = input_nchw.shape
    _, Hg, Wg, _ = grid.shape
    img = jnp.moveaxis(input_nchw, 1, -1)  # (N, H, W, C)

    x = _unnormalize(grid[..., 0].reshape(N, -1), W, align_corners)
    y = _unnormalize(grid[..., 1].reshape(N, -1), H, align_corners)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)

    if mode == "nearest":
        ix = jnp.round(x).astype(jnp.int32)
        iy = jnp.round(y).astype(jnp.int32)
        out = _gather_2d(img, ix, iy)
    elif mode == "bilinear":
        x0 = jnp.floor(x)
        y0 = jnp.floor(y)
        wx = (x - x0)[..., None]
        wy = (y - y0)[..., None]
        ix0 = x0.astype(jnp.int32)
        iy0 = y0.astype(jnp.int32)
        ix1 = jnp.minimum(ix0 + 1, W - 1)
        iy1 = jnp.minimum(iy0 + 1, H - 1)
        v00 = _gather_2d(img, ix0, iy0)
        v01 = _gather_2d(img, ix1, iy0)
        v10 = _gather_2d(img, ix0, iy1)
        v11 = _gather_2d(img, ix1, iy1)
        out = ((v00 * (1 - wx) + v01 * wx) * (1 - wy)
               + (v10 * (1 - wx) + v11 * wx) * wy)
    else:
        raise ValueError(f"unsupported mode: {mode}")

    return jnp.moveaxis(out.reshape(N, Hg, Wg, C), -1, 1)


def _gather_3d(vol: jnp.ndarray, ix, iy, iz) -> jnp.ndarray:
    """vol: (N, D, H, W, C); indices (N, P) -> (N, P, C)."""
    N, D, H, W, C = vol.shape
    flat = vol.reshape(N, -1, C)
    idx = (iz * H + iy) * W + ix
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample_3d(
    input_ncdhw: jnp.ndarray,
    grid: jnp.ndarray,
    mode: str = "bilinear",
    padding_mode: str = "border",
    align_corners: bool = True,
) -> jnp.ndarray:
    """torch.nn.functional.grid_sample equivalent for 5-D inputs.

    Args:
      input_ncdhw: (N, C, D, H, W).
      grid: (N, Dg, Hg, Wg, 3); grid[..., 0]=x (W), 1=y (H), 2=z (D).
    Returns:
      (N, C, Dg, Hg, Wg).
    """
    assert padding_mode == "border", "only border padding is implemented"
    N, C, D, H, W = input_ncdhw.shape
    _, Dg, Hg, Wg, _ = grid.shape
    vol = jnp.moveaxis(input_ncdhw, 1, -1)  # (N, D, H, W, C)

    x = _unnormalize(grid[..., 0].reshape(N, -1), W, align_corners)
    y = _unnormalize(grid[..., 1].reshape(N, -1), H, align_corners)
    z = _unnormalize(grid[..., 2].reshape(N, -1), D, align_corners)
    x = jnp.clip(x, 0.0, W - 1)
    y = jnp.clip(y, 0.0, H - 1)
    z = jnp.clip(z, 0.0, D - 1)

    if mode == "nearest":
        out = _gather_3d(vol, jnp.round(x).astype(jnp.int32),
                         jnp.round(y).astype(jnp.int32),
                         jnp.round(z).astype(jnp.int32))
    elif mode == "bilinear":  # trilinear
        x0f, y0f, z0f = jnp.floor(x), jnp.floor(y), jnp.floor(z)
        wx = (x - x0f)[..., None]
        wy = (y - y0f)[..., None]
        wz = (z - z0f)[..., None]
        x0 = x0f.astype(jnp.int32)
        y0 = y0f.astype(jnp.int32)
        z0 = z0f.astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, W - 1)
        y1 = jnp.minimum(y0 + 1, H - 1)
        z1 = jnp.minimum(z0 + 1, D - 1)
        v000 = _gather_3d(vol, x0, y0, z0)
        v001 = _gather_3d(vol, x1, y0, z0)
        v010 = _gather_3d(vol, x0, y1, z0)
        v011 = _gather_3d(vol, x1, y1, z0)
        v100 = _gather_3d(vol, x0, y0, z1)
        v101 = _gather_3d(vol, x1, y0, z1)
        v110 = _gather_3d(vol, x0, y1, z1)
        v111 = _gather_3d(vol, x1, y1, z1)
        c00 = v000 * (1 - wx) + v001 * wx
        c01 = v010 * (1 - wx) + v011 * wx
        c10 = v100 * (1 - wx) + v101 * wx
        c11 = v110 * (1 - wx) + v111 * wx
        c0 = c00 * (1 - wy) + c01 * wy
        c1 = c10 * (1 - wy) + c11 * wy
        out = c0 * (1 - wz) + c1 * wz
    else:
        raise ValueError(f"unsupported mode: {mode}")

    return jnp.moveaxis(out.reshape(N, Dg, Hg, Wg, C), -1, 1)


def sample_feature_map_at_points(
    feat_map: jnp.ndarray, pts_centered: jnp.ndarray
) -> jnp.ndarray:
    """Pixel-aligned feature fetch used by the warp field and ReconNet.

    Reference semantics (network/arch_avatar.py:124-134 and
    network/arch_recon.py:62-68): the grid coordinate is the *raw metric
    offset* from the canonical SMPL center, i.e. the feature map spans a
    2m x 2m window; y is negated (image rows grow downward).

    Args:
      feat_map: (N, C, H, W).
      pts_centered: (N, P, 3) points minus cano_smpl_center.
    Returns:
      (N, P, C).
    """
    grid = jnp.stack([pts_centered[..., 0], -pts_centered[..., 1]], axis=-1)
    out = grid_sample_2d(feat_map, grid[:, :, None, :])  # (N, C, P, 1)
    return jnp.moveaxis(out[..., 0], 1, -1)
