"""High-level mesh rendering: canonical ortho front/back + live perspective.

Device-side equivalents of reference utils/visualize_util.py:11-126 and the
GLSL phong shading (reference utils/renderer.py:79-170). All passes run
inside jit; images never leave the device until the caller saves them.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from avatarcap_tpu.render.raster import (rasterize, rasterize_index,
                                          interpolate, RasterOutput,
                                          RasterIndex)


def _transform_tris(tris: jnp.ndarray, mvp: jnp.ndarray) -> jnp.ndarray:
    """(T, 3, 3) world tri verts x row-major (4,4) -> (T, 3, 4) clip."""
    vh = jnp.concatenate([tris, jnp.ones_like(tris[..., :1])], -1)
    return jnp.einsum("ij,tvj->tvi", mvp, vh, precision="highest")


def phong_shade(cam_pos: jnp.ndarray, cam_normal: jnp.ndarray,
                base_color: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Per-pixel Phong (front material; culling removes back faces so
    gl_FrontFacing is always true — reference utils/renderer.py:141,442).

    Light: ambient .3, diffuse .7, specular 1, dir (0,0,1) cam space;
    material: ma=md=.85, ms=.1, shininess 10
    (reference utils/renderer.py:107-120).
    """
    ldir = jnp.array([0.0, 0.0, 1.0], cam_pos.dtype)
    n = cam_normal / jnp.maximum(
        jnp.linalg.norm(cam_normal, axis=-1, keepdims=True), 1e-12)
    vdir = -cam_pos / jnp.maximum(
        jnp.linalg.norm(cam_pos, axis=-1, keepdims=True), 1e-12)
    # reflect(I, N) with I = -ldir
    i = -ldir
    rdir = i - 2.0 * jnp.sum(n * i, axis=-1, keepdims=True) * n
    diff = jnp.maximum(jnp.sum(n * ldir, axis=-1, keepdims=True), 0.0)
    spec = jnp.maximum(jnp.sum(vdir * rdir, axis=-1, keepdims=True), 0.0) ** 10.0
    c = jnp.clip(0.3 * 0.85 + 0.7 * 0.85 * diff + 1.0 * 0.1 * spec, 0.0, 1.0)
    c = jnp.broadcast_to(c, cam_pos.shape)
    if base_color is not None:
        c = c * base_color
    return c


@functools.partial(jax.jit, static_argnames=("res", "window", "big_tris",
                                             "mirror_pair",
                                             "max_candidates"))
def cano_index_passes(tris: jnp.ndarray, valid: jnp.ndarray,
                      front_mvp: jnp.ndarray, back_mvp: jnp.ndarray,
                      res: int = 512, window: int = 4, big_tris: int = 0,
                      mirror_pair: bool = True, max_candidates: int = 0
                      ) -> Tuple[RasterIndex, RasterIndex]:
    """Front + back orthographic visibility buffers of the canonical mesh.

    The capture loop renders the SAME canonical mesh with several attribute
    layers (avatar normals, phong inputs, lifted image normals — reference
    main.py:367-375 + normal_fusion.py:62); one index pass per side feeds
    them all via `interpolate` so the z-resolve cost is paid once.

    mirror_pair=True (valid for `camera.cano_front_back_mvp` matrices,
    which are the same ortho projection with the back view rotated pi
    about y) runs BOTH views in one merged candidate pass
    (`rasterize_index_pair`) — culling sends each triangle to exactly one
    view, so the dense candidate math and compaction are paid once. Pass
    False for arbitrary unrelated matrices.
    """
    from avatarcap_tpu.render.raster import rasterize_index_pair
    if mirror_pair:
        return rasterize_index_pair(
            _transform_tris(tris, front_mvp),
            _transform_tris(tris, back_mvp), valid, res, res,
            window=window, big_tri_capacity=big_tris,
            max_candidates=max_candidates)
    fri = rasterize_index(_transform_tris(tris, front_mvp), valid, res, res,
                          window=window, big_tri_capacity=big_tris,
                          max_candidates=max_candidates)
    bri = rasterize_index(_transform_tris(tris, back_mvp), valid, res, res,
                          window=window, big_tri_capacity=big_tris,
                          max_candidates=max_candidates)
    return fri, bri


def cano_interpolate(fri: RasterIndex, bri: RasterIndex,
                     attr_tris: jnp.ndarray
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Attribute layers at precomputed cano index passes; back x-flipped
    (reference visualize_util.py:51)."""
    front = interpolate(fri, attr_tris)
    back = interpolate(bri, attr_tris)[:, ::-1]
    return front, back


def cano_phong(fri: RasterIndex, bri: RasterIndex, tris: jnp.ndarray,
               normal_tris: jnp.ndarray, front_mv: jnp.ndarray,
               back_mv: jnp.ndarray,
               color_tris: Optional[jnp.ndarray] = None
               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Phong shading from precomputed index passes (same math as
    render_cano_mesh(shading='phong'): per-vertex cam-space transform +
    normalize, interpolate, shade; white background)."""
    def shade(ri, mv):
        cam_v = jnp.einsum("ij,tvj->tvi", mv[:3, :3], tris,
                           precision="highest") + mv[:3, 3]
        cam_n = jnp.einsum("ij,tvj->tvi", mv[:3, :3], normal_tris,
                           precision="highest")
        cam_n = cam_n / jnp.maximum(
            jnp.linalg.norm(cam_n, axis=-1, keepdims=True), 1e-12)
        v = interpolate(ri, cam_v)
        n = interpolate(ri, cam_n)
        base = interpolate(ri, color_tris) if color_tris is not None else None
        img = phong_shade(v, n, base)
        return jnp.where(ri.mask[..., None], img, 1.0)

    front = shade(fri, front_mv)
    back = shade(bri, back_mv)[:, ::-1]
    return front, back


@functools.partial(jax.jit, static_argnames=("res", "window", "shading",
                                             "big_tris"))
def render_cano_mesh(tris: jnp.ndarray, attr_tris: jnp.ndarray,
                     valid: jnp.ndarray,
                     front_mvp: jnp.ndarray, front_mv: jnp.ndarray,
                     back_mvp: jnp.ndarray, back_mv: jnp.ndarray,
                     res: int = 512, window: int = 4,
                     shading: str = "attribute",
                     color_tris: Optional[jnp.ndarray] = None,
                     big_tris: int = 0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Front + back orthographic canonical render.

    Matches reference utils/visualize_util.py:11-52: front pass plain, back
    pass rotated pi about y and the image x-flipped.

    Args:
      tris: (T, 3, 3) world triangle vertices.
      attr_tris: (T, 3, 3) per-vertex attributes (normals for 'attribute'
        and 'phong', positions for 'position').
      valid: (T,) bool.
      *_mvp/*_mv: (4, 4) row-major from camera.cano_front_back_mvp.
      shading: 'attribute' (raw attrs, bg 0), 'phong' (lit gray, bg 1).
    Returns:
      (front (res,res,3), back (res,res,3)).
    """
    def one_pass(mvp, mv):
        clip = _transform_tris(tris, mvp)
        if shading == "phong":
            cam_v = jnp.einsum("ij,tvj->tvi", mv[:3, :3], tris,
                               precision="highest") + mv[:3, 3]
            cam_n = jnp.einsum("ij,tvj->tvi", mv[:3, :3], attr_tris,
                               precision="highest")
            cam_n = cam_n / jnp.maximum(
                jnp.linalg.norm(cam_n, axis=-1, keepdims=True), 1e-12)
            attrs = jnp.concatenate([cam_v, cam_n] +
                                    ([color_tris] if color_tris is not None
                                     else []), axis=-1)
            out = rasterize(clip, attrs, valid, res, res, window=window,
                            big_tri_capacity=big_tris)
            base = out.attrs[..., 6:9] if color_tris is not None else None
            img = phong_shade(out.attrs[..., :3], out.attrs[..., 3:6], base)
            img = jnp.where(out.mask[..., None], img, 1.0)  # white bg
        else:
            out = rasterize(clip, attr_tris, valid, res, res,
                            window=window, big_tri_capacity=big_tris)
            img = out.attrs
        return img

    front = one_pass(front_mvp, front_mv)
    back = one_pass(back_mvp, back_mv)
    back = back[:, ::-1]  # cv.flip(img, 1) (reference visualize_util.py:51)
    return front, back


@functools.partial(jax.jit, static_argnames=("height", "width", "window",
                                             "shading", "big_tris"))
def render_mesh_single(tris: jnp.ndarray, attr_tris: jnp.ndarray,
                       valid: jnp.ndarray, mvp: jnp.ndarray,
                       mv: jnp.ndarray, height: int, width: int,
                       window: int = 4, shading: str = "attribute",
                       color_tris: Optional[jnp.ndarray] = None,
                       big_tris: int = 0
                       ) -> RasterOutput:
    """One perspective/ortho pass; 'position' passes feed the visibility
    test in normal canonicalization (reference normal_fusion.py:14-19)."""
    clip = _transform_tris(tris, mvp)
    if shading == "phong":
        cam_v = jnp.einsum("ij,tvj->tvi", mv[:3, :3], tris,
                           precision="highest") + mv[:3, 3]
        cam_n = jnp.einsum("ij,tvj->tvi", mv[:3, :3], attr_tris,
                           precision="highest")
        attrs = jnp.concatenate([cam_v, cam_n] +
                                ([color_tris] if color_tris is not None
                                 else []), axis=-1)
        out = rasterize(clip, attrs, valid, height, width, window=window,
                        big_tri_capacity=big_tris)
        base = out.attrs[..., 6:9] if color_tris is not None else None
        img = phong_shade(out.attrs[..., :3], out.attrs[..., 3:6], base)
        img = jnp.where(out.mask[..., None], img, 1.0)
        return RasterOutput(img, out.depth, out.mask, out.overflow)
    out = rasterize(clip, attr_tris, valid, height, width, window=window,
                    big_tri_capacity=big_tris)
    return out


def render_live_mesh(tris, normal_tris, valid, front_mv, back_mv, proj,
                     real2gl, res: int = 512, window: int = 4,
                     color_tris=None, big_tris: int = 0):
    """Perspective front/back phong render
    (reference utils/visualize_util.py:90-126)."""
    fmv = jnp.asarray(real2gl) @ jnp.asarray(front_mv)
    bmv = jnp.asarray(real2gl) @ jnp.asarray(back_mv)
    pj = jnp.asarray(proj)
    front = render_mesh_single(tris, normal_tris, valid, pj @ fmv, fmv,
                               res, res, window, "phong", color_tris,
                               big_tris)
    back = render_mesh_single(tris, normal_tris, valid, pj @ bmv, bmv,
                              res, res, window, "phong", color_tris,
                              big_tris)
    return front.attrs, back.attrs


def normal2color(normal_img: jnp.ndarray) -> jnp.ndarray:
    """Map unit normals to displayable colors (reference
    utils/visualize_util.py:129-135): valid pixels -> 0.5*n + 0.5."""
    mask = jnp.linalg.norm(normal_img, axis=-1) > 1e-6
    n = normal_img / jnp.maximum(
        jnp.linalg.norm(normal_img, axis=-1, keepdims=True), 1e-12)
    return jnp.where(mask[..., None], 0.5 * n + 0.5, normal_img)
