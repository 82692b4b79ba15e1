"""Canonical normal fusion, fully on device.

Reimplements the reference's normal-fusion stage
(reference normal_fusion/normal_fusion.py:12-167) as jitted JAX:

- visibility testing uses the software position rasterizer instead of a GL
  position pass (reference :14-36);
- the two-phase Adam optimization (rotation grid then normal image,
  reference :116-143) runs as lax.fori_loop's with optax inside jit — the
  reference pays a 100-iteration Python/torch loop per frame;
- cv2 erode / distanceTransform are device morphology ops.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import optax

from avatarcap_tpu.ops.se3 import axis_angle_to_matrix
from avatarcap_tpu.ops.morphology import erode_3x3, distance_transform_l1
from avatarcap_tpu.render.raster import rasterize
from avatarcap_tpu.render.visualize import render_cano_mesh


@functools.partial(jax.jit, static_argnames=("img_h", "img_w", "window",
                                             "big_tris", "max_candidates",
                                             "with_overflow"))
def lift_image_normals(live_tris: jnp.ndarray, valid_tris: jnp.ndarray,
                       normal_map: jnp.ndarray, vert_mats16: jnp.ndarray,
                       mv: jnp.ndarray, proj: jnp.ndarray,
                       fx: float, fy: float, cx: float, cy: float,
                       img_h: int, img_w: int, window: int = 4,
                       big_tris: int = 0,
                       max_candidates: int = 0,
                       with_overflow: bool = False) -> jnp.ndarray:
    """Image-space normals -> per-soup-vertex canonical normals
    (steps 1-3 of reference normal_fusion.py:12-60):

    1. rasterize live mesh world positions from the camera;
    2. a vertex is visible iff its projected position-buffer sample is
       within 5 cm of itself;
    3. sample the inferred normal map at the vertex projection, flip y/z,
       rotate by inv(view) then per-vertex inv(skinning) rotations.

    Args:
      vert_mats16: (3T, 16) FLAT per-soup-vertex skinning mats
        (cano->live, body/skinning.py mats16 layout) — kept rank-2
        so no (..., 4, 4) tensor exists at soup scale (streaming OOM,
        round 3).

    Returns (T, 3, 3) canonical-space normals (0 where invisible/invalid),
    ready to render with the canonical mesh's index passes; with
    ``with_overflow`` also the position pass's () bool dropped-work flag.
    """
    T = live_tris.shape[0]
    verts = live_tris.reshape(-1, 3)                      # (3T, 3)

    # 1. live position pass (reference :14-19)
    mvp = proj @ mv
    vh = jnp.concatenate([live_tris, jnp.ones_like(live_tris[..., :1])], -1)
    clip = jnp.einsum("ij,tvj->tvi", mvp, vh, precision="highest")
    pos_pass = rasterize(clip, live_tris, valid_tris, img_h, img_w,
                         window=window, big_tri_capacity=big_tris,
                         max_candidates=max_candidates)
    position_map = pos_pass.attrs                         # (H, W, 3)

    # 2. project vertices; visibility by position agreement (reference :26-36)
    cam = jnp.einsum("ij,nj->ni", mv[:3, :3], verts,
                     precision="highest") + mv[:3, 3]
    coord_x = cam[:, 0] / cam[:, 2] * fx + cx
    coord_y = cam[:, 1] / cam[:, 2] * fy + cy
    gx = 2.0 * (coord_x / img_w) - 1.0
    gy = 2.0 * (coord_y / img_h) - 1.0
    # nearest sample of BOTH maps in one 6-channel row gather (same
    # align_corners=True + border-clamp semantics as grid_sample_2d
    # nearest; two channel-major grid_sample calls at 3M vertices are 6
    # scalar gathers — random gathers on v5e are latency-bound)
    xpix = jnp.clip(jnp.round((gx + 1.0) * 0.5 * (img_w - 1))
                    .astype(jnp.int32), 0, img_w - 1)
    ypix = jnp.clip(jnp.round((gy + 1.0) * 0.5 * (img_h - 1))
                    .astype(jnp.int32), 0, img_h - 1)
    both = jnp.concatenate([position_map, normal_map],
                           axis=-1).reshape(-1, 6)
    rows = both[ypix * img_w + xpix]                      # (3T, 6)
    proj_v = rows[:, :3]
    proj_n = rows[:, 3:]
    vis = jnp.linalg.norm(verts - proj_v, axis=-1) < 0.05
    valid = vis & (jnp.linalg.norm(proj_n, axis=-1) > 1e-6)

    # 3. canonicalize normals (reference :56-60). Closed-form inverses on
    # FLAT channel slices: batched linalg.inv on millions of 4x4s LU-pads
    # to gigabytes on TPU, and even an explicit (N, 3, 3) adjugate input
    # materializes a 30x-padded tiled tensor at soup scale under vmap.
    from avatarcap_tpu.body.skinning import mats16_inv_rotate
    proj_n = proj_n * jnp.array([1.0, -1.0, -1.0])
    inv_mv_r = jnp.linalg.inv(mv)[:3, :3]  # single matrix: fine
    proj_n = jnp.einsum("ij,nj->ni", inv_mv_r, proj_n, precision="highest")
    proj_n = mats16_inv_rotate(vert_mats16, proj_n)
    proj_n = jnp.where(valid[:, None], proj_n, 0.0)
    out = proj_n.reshape(T, 3, 3)
    if with_overflow:
        return out, pos_pass.overflow
    return out


@functools.partial(jax.jit, static_argnames=("img_h", "img_w", "res",
                                             "window"))
def canonicalize_normal_map(cano_tris: jnp.ndarray, live_tris: jnp.ndarray,
                            valid_tris: jnp.ndarray,
                            normal_map: jnp.ndarray,
                            vert_mats: jnp.ndarray,
                            mv: jnp.ndarray, proj: jnp.ndarray,
                            front_mvp: jnp.ndarray, front_mv: jnp.ndarray,
                            back_mvp: jnp.ndarray, back_mv: jnp.ndarray,
                            fx: float, fy: float, cx: float, cy: float,
                            img_h: int, img_w: int,
                            res: int = 512, window: int = 4
                            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Lift image-space normals onto the canonical mesh and re-render
    front/back (reference normal_fusion.py:12-63). The capture pipeline
    instead calls `lift_image_normals` and interpolates at its shared
    canonical index passes; this wrapper keeps the standalone API.

    Args:
      cano_tris/live_tris: (T, 3, 3) corresponding triangle soups.
      valid_tris: (T,).
      normal_map: (img_h, img_w, 3) image-space normals (camera convention).
      vert_mats: (T, 3, 4, 4) per-soup-vertex skinning mats (cano->live).
      mv: (4, 4) world->camera; proj: (4, 4) perspective (gl_space=False).
      front_/back_*: canonical ortho matrices (camera.cano_front_back_mvp).
    """
    vert_mats16 = vert_mats.reshape(-1, 16)   # (3T, 16) flat row-major
    attr_tris = lift_image_normals(live_tris, valid_tris, normal_map,
                                   vert_mats16, mv, proj, fx, fy, cx, cy,
                                   img_h, img_w, window=window)
    # 4. re-render on the canonical mesh (reference :62)
    return render_cano_mesh(cano_tris, attr_tris, valid_tris,
                            front_mvp, front_mv, back_mvp, back_mv,
                            res=res, window=window)


def _resize_matrix(n_in: int, n_out: int) -> jnp.ndarray:
    """(n_out, n_in) align_corners=True bilinear interpolation matrix."""
    import numpy as np
    x = np.arange(n_out) * ((n_in - 1) / max(n_out - 1, 1))
    x0 = np.floor(x).astype(np.int64)
    x1 = np.minimum(x0 + 1, n_in - 1)
    t = (x - x0).astype(np.float32)
    m = np.zeros((n_out, n_in), np.float32)
    m[np.arange(n_out), x0] += 1.0 - t
    m[np.arange(n_out), x1] += t
    return jnp.asarray(m)


def _resize_bilinear_ac(img: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """align_corners=True bilinear resize of (H, W, C)
    (reference normal_fusion.py:83-88).

    Separable interpolation MATRICES instead of grid_sample: this resize
    sits inside the fusion optimizer's autodiff, and grid_sample's backward
    is a scatter-add (~6 ms/iteration at 512^2 on TPU) while a matmul's
    backward is a matmul.
    """
    wr = _resize_matrix(img.shape[0], h)
    wc = _resize_matrix(img.shape[1], w)
    out = jnp.einsum("Oh,hwc->Owc", wr, img)
    return jnp.einsum("Pw,Owc->OPc", wc, out)


def _neighbor_shift(img: jnp.ndarray, di: int, dj: int) -> jnp.ndarray:
    """Reference get_neighbor_images quirk-for-quirk
    (normal_fusion.py:66-80): affine grid shift of dj*(2/H) in x and
    di*(2/W) in y, nearest sampling, align_corners=True (a 63/64-pixel
    shift on the 64-grid).

    The nearest-sampled affine grid resolves to STATIC per-axis index
    vectors (for the 64-grid: an exact one-pixel edge-clamped shift), so
    this is implemented as slicing instead of grid_sample: the sampled
    version inside the fusion optimizer's autodiff cost ~16 ms/frame of
    1,616 tiny gather fusions (8 shifts x fwd/bwd x 100 iters) and its
    backward is a scatter-add; a slice's backward is a slice."""
    import numpy as np
    H, W, _ = img.shape

    def axis_indices(n, d, scale):
        # same math as the affine grid + nearest resampling above
        x = np.linspace(-1.0, 1.0, n) + d / (scale / 2.0)
        u = np.clip((x + 1.0) * 0.5 * (n - 1), 0.0, n - 1)
        return np.round(u).astype(np.int64)

    def shift_axis(a, axis, idxs):
        n = a.shape[axis]
        base = np.arange(n)
        if np.array_equal(idxs, base):
            return a
        full = [slice(None)] * a.ndim
        if np.array_equal(idxs, np.minimum(base + 1, n - 1)):
            head, tail = full.copy(), full.copy()
            head[axis] = slice(1, None)
            tail[axis] = slice(n - 1, n)
            return jnp.concatenate([a[tuple(head)], a[tuple(tail)]],
                                   axis=axis)
        if np.array_equal(idxs, np.maximum(base - 1, 0)):
            head, tail = full.copy(), full.copy()
            head[axis] = slice(0, 1)
            tail[axis] = slice(0, n - 1)
            return jnp.concatenate([a[tuple(head)], a[tuple(tail)]],
                                   axis=axis)
        return jnp.take(a, jnp.asarray(idxs), axis=axis)

    out = shift_axis(img, 0, axis_indices(H, di, W))
    return shift_axis(out, 1, axis_indices(W, dj, H))


@functools.partial(jax.jit, static_argnames=("iter_num",))
def merge_normal_images(src_img: jnp.ndarray, tar_img: jnp.ndarray,
                        neck_xy: jnp.ndarray,
                        iter_num: int = 100) -> jnp.ndarray:
    """Optimization-based normal fusion (reference normal_fusion.py:91-155).

    Phase 1 (iters 0..n/2): Adam(lr 1e-2) on a 64x64 axis-angle rotation
    grid aligning rotated avatar normals to image normals + neighbor
    smoothness. Phase 2: Adam(lr 1e-1) directly on the normal image.
    Then distance-transform blending and a forced avatar-normal face box
    below the neck.

    Args:
      src_img: (512, 512, 3) avatar normals.
      tar_img: (512, 512, 3) canonicalized image normals.
      neck_xy: (2,) int32 (x, y) canonical-image neck position.
    """
    H = src_img.shape[0]
    src_mask = jnp.linalg.norm(src_img, axis=-1) > 0.0
    tar_mask = jnp.linalg.norm(tar_img, axis=-1) > 0.0

    tar_mask = erode_3x3(tar_mask, iterations=3)
    dt = distance_transform_l1(tar_mask.astype(jnp.float32))
    valid_mask = src_mask & tar_mask

    init_src = src_img

    def loss_fn(rot_aa, src):
        rot = _resize_bilinear_ac(rot_aa, H, H)
        rot_mat = axis_angle_to_matrix(rot)
        rotated = jnp.einsum("ijab,ijb->ija", rot_mat, src,
                             precision="highest")
        sq = jnp.square(rotated - tar_img)
        data = jnp.sum(jnp.where(valid_mask[..., None], sq, 0.0)) \
            / jnp.maximum(jnp.sum(valid_mask) * 3, 1)
        smooth = 0.0
        for di in (-1, 0, 1):
            for dj in (-1, 0, 1):
                if di == 0 and dj == 0:
                    continue
                smooth = smooth + jnp.mean(
                    jnp.square(_neighbor_shift(rot_aa, di, dj) - rot_aa))
        return data + 1.0 * smooth

    rot_aa0 = jnp.zeros((64, 64, 3), src_img.dtype)
    opt_rot = optax.adam(1e-2)
    opt_src = optax.adam(1e-1)

    # Phase 1: optimize the rotation grid (reference :136-139).
    def rot_step(_, carry):
        rot_aa, opt_state = carry
        g = jax.grad(loss_fn, argnums=0)(rot_aa, src_img)
        updates, opt_state = opt_rot.update(g, opt_state, rot_aa)
        return optax.apply_updates(rot_aa, updates), opt_state

    rot_aa, _ = jax.lax.fori_loop(
        0, iter_num // 2, rot_step, (rot_aa0, opt_rot.init(rot_aa0)))

    # Phase 2: optimize the normal image (reference :140-143).
    def src_step(_, carry):
        src, opt_state = carry
        g = jax.grad(loss_fn, argnums=1)(rot_aa, src)
        updates, opt_state = opt_src.update(g, opt_state, src)
        return optax.apply_updates(src, updates), opt_state

    src, _ = jax.lax.fori_loop(
        0, iter_num - iter_num // 2, src_step,
        (src_img, opt_src.init(src_img)))

    # Distance-transform blending (reference :146-150).
    dtw = (dt / 5.0)[..., None]
    init_w = jnp.where(dtw > 1.0, 0.0, 1.0)
    src = (src * dtw + init_src * init_w) / (dtw + init_w)

    # Face box follows the avatar normal (reference :153-154):
    # rect rows [neck_y-90, neck_y), cols [neck_x-35, neck_x+35). The
    # reference indexes with a Python slice, so a negative start wraps and
    # yields an EMPTY slice (no-op) whenever neck_y < 90 or neck_x < 35,
    # and an out-of-range stop clips to the image edge — both replicated
    # here with an index mask instead of dynamic_slice (which would clamp
    # the start and write a shifted box).
    y0 = neck_xy[1] - 90
    x0 = neck_xy[0] - 35
    H, W = src.shape[:2]
    in_rows = (jnp.arange(H) >= y0) & (jnp.arange(H) < neck_xy[1])
    in_cols = (jnp.arange(W) >= x0) & (jnp.arange(W) < neck_xy[0] + 35)
    box = (in_rows[:, None] & in_cols[None, :]) & (y0 >= 0) & (x0 >= 0)
    return jnp.where(box[..., None], init_src, src)


@jax.jit
def merge_normal_images_cover(src_img: jnp.ndarray,
                              tar_img: jnp.ndarray) -> jnp.ndarray:
    """Overwrite avatar normals wherever the image normal is valid
    (reference normal_fusion.py:158-167)."""
    valid = jnp.linalg.norm(tar_img, axis=-1) > 1e-6
    return jnp.where(valid[..., None], tar_img, src_img)
