"""Static-shape software rasterizer (scatter z-buffer), pure JAX.

Replaces the reference's offscreen OpenGL renderer + GLSL shaders
(reference utils/renderer.py:326-451) so rendering stays on-device inside
the jitted capture loop — the reference crosses GPU<->CPU<->GL at least 6
times per frame (SURVEY §3.2); here it is zero.

Algorithm (TPU-shaped: no data-dependent loops, everything is gathers,
elementwise math, and three scatters):

1. Per triangle: project to pixel space, take a static K x K candidate
   window anchored at the bbox min. Meshes here are marching-cubes soups
   whose triangles span ~1-3 px, so small K covers them; K is a knob.
2. Coverage + barycentrics via edge functions; perspective-correct
   attribute interpolation (matches default GLSL `smooth`); depth is
   NDC z interpolated linearly in screen space (GL window-depth rule).
3. Z-buffer resolve without atomics:
     scatter-min depth -> scatter-min candidate id among depth winners ->
     gather winner attributes.
   Deterministic: ties break to the lowest candidate id.

Triangles larger than the K x K window are exact when
``big_tri_capacity`` > 0: up to that many oversized triangles take a
separate scatter-free per-pixel pass (every pixel tests the <=C big
triangles and keeps the min-depth winner — full GL coverage like the
reference's utils/renderer.py:432-451), merged with the windowed pass by
depth (windowed pass wins exact ties). With capacity 0 they are partially
rasterized as before. Either way ``RasterOutput.overflow`` reports dropped
work: candidate-compaction overflow, or more big triangles than capacity.

Conventions: image row 0 = top (y_ndc=+1), col 0 = left (x_ndc=-1) —
identical to the reference's glReadPixels + y-flip output
(reference utils/renderer.py:446-449). Back-face culling treats
counter-clockwise-in-GL-window-space as front (GL default, enabled at
reference utils/renderer.py:442).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class RasterOutput(NamedTuple):
    attrs: jnp.ndarray  # (H, W, A) interpolated attributes (bg = 0)
    depth: jnp.ndarray  # (H, W) NDC depth in [-1, 1]; +inf where empty
    mask: jnp.ndarray   # (H, W) bool coverage
    overflow: jnp.ndarray  # () bool: candidates or big tris were dropped


class RasterIndex(NamedTuple):
    """Visibility buffer: per-pixel winning triangle + interpolation
    weights. One index pass serves any number of attribute layers via
    `interpolate` — the capture loop renders the same mesh with several
    attribute sets (normals, lifted image normals, phong inputs), and the
    rasterization (candidate scatter + z-resolve) is by far the dominant
    cost, so sharing it is a large per-frame win."""

    tri: jnp.ndarray      # (H*W,) int32 winner triangle (0 where empty)
    bw: jnp.ndarray       # (H*W, 3) perspective-correct vertex weights
    depth: jnp.ndarray    # (H, W)
    mask: jnp.ndarray     # (H, W)
    overflow: jnp.ndarray  # ()
    # () int32 covered-candidate count BEFORE the capacity cut — every
    # z-resolve gather/scatter walks max_candidates slots, so this is
    # the number to size `max_candidates` against (see
    # CaptureOptions.raster_max_candidates)
    n_candidates: jnp.ndarray = None
    # () int32 count of triangles routed to the exact big-triangle pass
    # (larger than the KxK window) — sizes `big_tri_capacity`, whose
    # (capacity, H*W) intermediates are materialized even when empty
    n_big: jnp.ndarray = None


def interpolate(ri: RasterIndex, attrs: jnp.ndarray,
                bg_value: float = 0.0,
                covered_capacity: int = 0,
                with_overflow: bool = False):
    """Interpolate per-vertex attrs (T, 3, A) at a RasterIndex's pixels.

    covered_capacity > 0: gather only at COVERED pixels (compacted) and
    scatter the rows back over a bg-filled image. An MC-soup body covers
    ~8-15% of a 512^2 canonical view, yet the dense form's row gathers
    (latency-bound, ~45 ns each) walk every pixel. Covered pixels are
    bounded by the index pass's covered candidates PLUS any exact
    big-triangle coverage, so the masked path reports its own () bool
    overflow (request it with ``with_overflow``; dropped coverage is
    never silent).
    """
    H, W = ri.mask.shape
    A = attrs.shape[-1]
    if covered_capacity > 0:
        from avatarcap_tpu.ops.compaction import compact_mask_indices
        P = H * W
        pix, n_cov, live = compact_mask_indices(ri.mask.reshape(-1),
                                                covered_capacity)
        at = attrs[ri.tri[pix]]                         # (C, 3, A)
        out_c = jnp.sum(at * ri.bw[pix][..., None], axis=1)
        out = jnp.full((P + 1, A), bg_value, out_c.dtype).at[
            jnp.where(live, pix, P)].set(out_c, mode="drop")[:P]
        img = out.reshape(H, W, A)
        if with_overflow:
            return img, n_cov > covered_capacity
        return img
    at = attrs[ri.tri]                                  # (P, 3, A)
    out = jnp.sum(at * ri.bw[..., None], axis=1)        # (P, A)
    out = jnp.where(ri.mask.reshape(-1)[:, None], out, bg_value)
    img = out.reshape(H, W, A)
    if with_overflow:
        return img, jnp.zeros((), bool)
    return img


def _perspective_weights(w0, w1, iw_tri):
    """Screen-space barycentrics -> perspective-correct weights.

    Args: w0, w1: (..., ) barycentrics; iw_tri: (..., 3) per-vertex 1/w.
    Returns (..., 3) normalized attribute weights.
    """
    w2 = 1.0 - w0 - w1
    bw = jnp.stack([w0 * iw_tri[..., 0], w1 * iw_tri[..., 1],
                    w2 * iw_tri[..., 2]], axis=-1)
    denom = jnp.sum(bw, axis=-1, keepdims=True)
    return bw / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "window", "cull",
                                    "max_candidates", "big_tri_capacity"))
def rasterize_index(clip_verts: jnp.ndarray, valid_tris: jnp.ndarray,
                    height: int, width: int, window: int = 4,
                    cull: bool = True,
                    max_candidates: int = 0,
                    big_tri_capacity: int = 0) -> RasterIndex:
    """Rasterize a triangle soup to a visibility buffer (no attributes).

    Args:
      clip_verts: (T, 3, 4) clip-space positions (x, y, z, w). For
        orthographic passes w == 1.
      valid_tris: (T,) bool (padding from marching cubes is masked here).
      height, width: output size.
      window: static K; triangles larger than K x K pixels go to the big
        pass (if enabled) or are partially rasterized (choose K from
        triangle size: MC voxel meshes ~4, SMPL meshes ~16).
      cull: drop back faces (GL_CULL_FACE with CCW front).
      max_candidates: compaction capacity for covered window candidates
        (default max(T, 65536)); overflow is reported, not silent.
      big_tri_capacity: exact-coverage slots for triangles larger than the
        window; 0 disables the big pass.
    """
    T = clip_verts.shape[0]
    K = window

    # Pad the soup to a power-of-two triangle count: candidate ids become
    # slot * Tp + tri, so the id<->(tri, slot) decode is shift/and — an
    # integer div/mod over millions of candidates costs ~200 ms on v5e
    # (int32 division is not a native VPU op), shifts are free.
    Tp = 1 << max(T - 1, 1).bit_length()
    if Tp != T:
        clip_verts = jnp.pad(clip_verts, ((0, Tp - T), (0, 0), (0, 0)))
        valid_tris = jnp.pad(valid_tris, (0, Tp - T))

    w = clip_verts[..., 3]
    w_ok = jnp.all(w > 1e-8, axis=-1) & valid_tris
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1.0, w)
    ndc = clip_verts[..., :3] / w_safe[..., None]       # (T, 3, 3)

    # Pixel space: col = (x+1)/2*W - 0.5, row = (1-y)/2*H - 0.5
    px = (ndc[..., 0] + 1.0) * (0.5 * width) - 0.5      # (T, 3)
    py = (1.0 - ndc[..., 1]) * (0.5 * height) - 0.5
    pz = ndc[..., 2]

    # Signed area in pixel space (y down): CCW-in-GL-window -> negative here.
    ax, ay = px[:, 0], py[:, 0]
    bx, by = px[:, 1], py[:, 1]
    cx, cy = px[:, 2], py[:, 2]
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    front = area2 < 0.0 if cull else jnp.abs(area2) > 0.0
    tri_ok = w_ok & front & (jnp.abs(area2) > 1e-12)
    iw = 1.0 / w_safe                                   # (T, 3)

    # Candidate pixel window anchored at ceil(bbox min).
    min_x = jnp.ceil(jnp.min(px, axis=-1)).astype(jnp.int32)
    min_y = jnp.ceil(jnp.min(py, axis=-1)).astype(jnp.int32)

    # Oversized triangles: the K-window starting at ceil(min) cannot reach
    # past ceil(min)+K-1.
    too_big = ((jnp.max(px, axis=-1) > min_x.astype(px.dtype) + (K - 1)) |
               (jnp.max(py, axis=-1) > min_y.astype(py.dtype) + (K - 1)))
    is_big = tri_ok & too_big
    tri_main = tri_ok & ~is_big if big_tri_capacity > 0 else tri_ok

    dyx = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                 indexing="ij"), axis=-1).reshape(-1, 2)

    eps = -1e-6
    inv_area = 1.0 / jnp.where(jnp.abs(area2) < 1e-12, 1.0, area2)

    # Dense candidate pass in (K*K, Tp) orientation: Tp on the minor
    # (lane) axis keeps the VPU fully occupied (a (T, 16) layout pads 16
    # lanes to 128), per-triangle rows broadcast with ZERO gathers
    # (indexing per-tri arrays with a broadcast (T, K*K) index inside the
    # fused loop re-runs one serial gather per candidate — ~12 gathers x
    # 16.7M candidates was ~140 ms of this pass), and everything the
    # z-resolve needs later (pixel id, z, w0, w1) is materialized HERE so
    # the compacted/winner stages do 2 flat-array gathers instead of 12
    # per-triangle row gathers (~25M random gathered elem/s on v5e).
    slot_col = jnp.arange(K * K, dtype=jnp.int32)[:, None]
    cy_d = min_y[None, :] + dyx[slot_col, 0]            # (K*K, Tp)
    cx_d = min_x[None, :] + dyx[slot_col, 1]
    in_img = ((cx_d >= 0) & (cx_d < width) & (cy_d >= 0) & (cy_d < height))
    fx_d = cx_d.astype(px.dtype)
    fy_d = cy_d.astype(py.dtype)
    w0_d = ((cx - bx)[None, :] * (fy_d - by[None, :])
            - (cy - by)[None, :] * (fx_d - bx[None, :])) * inv_area[None, :]
    w1_d = ((ax - cx)[None, :] * (fy_d - cy[None, :])
            - (ay - cy)[None, :] * (fx_d - cx[None, :])) * inv_area[None, :]
    w2_d = 1.0 - w0_d - w1_d
    z_d = (w0_d * pz[None, :, 0] + w1_d * pz[None, :, 1]
           + w2_d * pz[None, :, 2])
    ok_d = ((w0_d >= eps) & (w1_d >= eps) & (w2_d >= eps) & in_img
            & (z_d >= -1.0) & (z_d <= 1.0) & tri_main[None, :])

    # Flat candidate id = slot * Tp + tri (C-order flatten, no transpose).
    valid = ok_d.reshape(-1)
    pix_d = (cy_d * width + cx_d).reshape(-1)
    z_flat = z_d.reshape(-1)
    w0_flat = w0_d.reshape(-1)
    w1_flat = w1_d.reshape(-1)

    # Compact covered candidates before the z-resolve: a K x K window over
    # ~1-3 px triangles leaves ~90% of candidates invalid, so the two
    # scatter-min resolve passes run on the ~T survivors instead of
    # T * K*K slots (scatter ~60M updates/s on v5e). Static capacity:
    # overflowing candidates are dropped AND reported via `overflow` —
    # size it by the expected covered-candidate count (default T,
    # ~2 covered px/triangle).
    max_c = max_candidates if max_candidates > 0 else max(T, 1 << 16)
    from avatarcap_tpu.ops.compaction import compact_mask_indices
    cand_of, n_covered, c_live = compact_mask_indices(valid, max_c)
    overflow = n_covered > max_c
    cand_of = jax.lax.optimization_barrier(cand_of)
    pix_c = jnp.where(c_live, pix_d[cand_of], height * width)
    z_c = jnp.where(c_live, z_flat[cand_of], jnp.inf)

    npix = height * width
    # Pass 1: min depth per pixel (+1 sentinel slot for invalid writes).
    zbuf = jnp.full((npix + 1,), jnp.inf, z_c.dtype).at[pix_c].min(z_c)
    # Pass 2: min candidate id among exact depth winners.
    is_winner = (z_c == zbuf[pix_c]) & (z_c < jnp.inf)
    win_ids = jnp.where(is_winner, cand_of, jnp.iinfo(jnp.int32).max)
    winner = jnp.full((npix + 1,), jnp.iinfo(jnp.int32).max,
                      jnp.int32).at[pix_c].min(win_ids)

    mask = (winner[:npix] != jnp.iinfo(jnp.int32).max)
    safe_winner = jnp.where(mask, winner[:npix], 0)
    tri_of = safe_winner & (Tp - 1)                     # tri of slot-major id

    # Perspective-correct weights at winners. When the candidate
    # capacity is tighter than the pixel count, gather only at COVERED
    # pixels (winners <= covered candidates, already capacity-checked)
    # and row-scatter back — the dense form pays 3 latency-bound
    # gathers at every pixel of a ~10%-covered view.
    if 0 < max_c < npix:
        pixc, _, livec = compact_mask_indices(mask, max_c)
        win_c = safe_winner[pixc]
        bw_c = _perspective_weights(w0_flat[win_c], w1_flat[win_c],
                                    iw[win_c & (Tp - 1)])
        bw = jnp.zeros((npix + 1, 3), bw_c.dtype).at[
            jnp.where(livec, pixc, npix)].set(bw_c, mode="drop")[:npix]
    else:
        bw = _perspective_weights(w0_flat[safe_winner],
                                  w1_flat[safe_winner],
                                  iw[tri_of])           # (P, 3)
    out_depth = jnp.where(mask, zbuf[:npix], jnp.inf)

    if big_tri_capacity > 0:
        big_tri, big_bw, big_depth, big_mask, big_over = _big_triangle_pass(
            px, py, pz, iw, area2, is_big, big_tri_capacity, height, width)
        overflow = overflow | big_over
        # Merge by depth; the windowed pass wins exact ties.
        take_big = big_mask & (big_depth < out_depth)
        tri_of = jnp.where(take_big, big_tri, tri_of)
        bw = jnp.where(take_big[:, None], big_bw, bw)
        out_depth = jnp.where(take_big, big_depth, out_depth)
        mask = mask | big_mask
    else:
        # big pass disabled: oversized triangles are partially rasterized —
        # that is dropped coverage, so report it.
        overflow = overflow | jnp.any(is_big)

    return RasterIndex(
        tri=tri_of,
        bw=bw,
        depth=out_depth.reshape(height, width),
        mask=mask.reshape(height, width),
        overflow=overflow,
        n_candidates=n_covered,
        n_big=jnp.sum(is_big).astype(jnp.int32),
    )


@functools.partial(jax.jit,
                   static_argnames=("height", "width", "window",
                                    "max_candidates", "big_tri_capacity"))
def rasterize_index_pair(clip_front: jnp.ndarray, clip_back: jnp.ndarray,
                         valid_tris: jnp.ndarray, height: int, width: int,
                         window: int = 4, max_candidates: int = 0,
                         big_tri_capacity: int = 0
                         ) -> tuple:
    """Front + back index passes of a MIRROR-PAIR camera in ONE candidate
    sweep (the canonical ortho front/back views of capture).

    Precondition (satisfied by `camera.cano_front_back_mvp`: same ortho
    projection, back model-view = rot_y(pi) about the mesh center): for
    every vertex, back NDC = (-x_f, y_f, z_b) with z_b affine-DECREASING
    in z_f. Then the back view's pixel grid is the x-mirror of the
    front's ((x+1)W/2-0.5 maps col c_b <-> W-1-c_b), mirroring preserves
    barycentrics and bbox spans, and back-face culling routes every
    non-degenerate triangle to EXACTLY ONE view (CCW-in-front <=> CW-in-
    back). So one dense candidate pass in front pixel space + one
    compaction + one z-resolve into a double-height buffer replaces two
    full passes — the dense K^2 x Tp candidate math and the 25-log-step
    compaction are the dominant raster cost and are paid ONCE here.

    clip_back is consulted only for per-vertex z (the back view's own
    NDC depth, scattered for back-routed triangles). Outputs are
    bit-compatible in convention with two `rasterize_index` calls
    (back buffer in back-view pixel coords, NOT pre-flipped). Two
    sub-pixel caveats measured on TPU at 512^2 x 1M tris (5 px of 58k
    lit): winners may differ on exact z ties, and pixels inside the
    eps barycentric slack (~1e-6 px of an edge) can be enumerated by
    one window layout and not the other — the merged pass walks the
    MIRRORED front K^2 window, `rasterize_index` walks the back view's
    own bbox window; both cover every pixel-center-inside column, but
    their overhang columns differ.
    """
    T = clip_front.shape[0]
    K = window
    Tp = 1 << max(T - 1, 1).bit_length()
    if Tp != T:
        clip_front = jnp.pad(clip_front, ((0, Tp - T), (0, 0), (0, 0)))
        clip_back = jnp.pad(clip_back, ((0, Tp - T), (0, 0), (0, 0)))
        valid_tris = jnp.pad(valid_tris, (0, Tp - T))

    w = clip_front[..., 3]
    w_ok = jnp.all(w > 1e-8, axis=-1) & valid_tris
    w_safe = jnp.where(jnp.abs(w) < 1e-8, 1.0, w)
    ndc = clip_front[..., :3] / w_safe[..., None]
    pz_b = clip_back[..., 2] / w_safe                   # ortho: w == 1

    px = (ndc[..., 0] + 1.0) * (0.5 * width) - 0.5      # (Tp, 3)
    py = (1.0 - ndc[..., 1]) * (0.5 * height) - 0.5
    pz = ndc[..., 2]

    ax, ay = px[:, 0], py[:, 0]
    bx, by = px[:, 1], py[:, 1]
    cx, cy = px[:, 2], py[:, 2]
    area2 = (bx - ax) * (cy - ay) - (by - ay) * (cx - ax)
    side = area2 > 0.0                  # CW in front view -> back buffer
    tri_ok = w_ok & (jnp.abs(area2) > 1e-12)
    iw = 1.0 / w_safe
    # per-vertex z of the triangle's OWN view
    pz_sel = jnp.where(side[:, None], pz_b, pz)

    min_x = jnp.ceil(jnp.min(px, axis=-1)).astype(jnp.int32)
    min_y = jnp.ceil(jnp.min(py, axis=-1)).astype(jnp.int32)
    too_big = ((jnp.max(px, axis=-1) > min_x.astype(px.dtype) + (K - 1)) |
               (jnp.max(py, axis=-1) > min_y.astype(py.dtype) + (K - 1)))
    is_big = tri_ok & too_big
    tri_main = tri_ok & ~is_big if big_tri_capacity > 0 else tri_ok

    dyx = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                 indexing="ij"), axis=-1).reshape(-1, 2)
    eps = -1e-6
    inv_area = 1.0 / jnp.where(jnp.abs(area2) < 1e-12, 1.0, area2)

    slot_col = jnp.arange(K * K, dtype=jnp.int32)[:, None]
    cy_d = min_y[None, :] + dyx[slot_col, 0]            # (K*K, Tp)
    cx_d = min_x[None, :] + dyx[slot_col, 1]
    in_img = ((cx_d >= 0) & (cx_d < width) & (cy_d >= 0) & (cy_d < height))
    fx_d = cx_d.astype(px.dtype)
    fy_d = cy_d.astype(py.dtype)
    w0_d = ((cx - bx)[None, :] * (fy_d - by[None, :])
            - (cy - by)[None, :] * (fx_d - bx[None, :])) * inv_area[None, :]
    w1_d = ((ax - cx)[None, :] * (fy_d - cy[None, :])
            - (ay - cy)[None, :] * (fx_d - cx[None, :])) * inv_area[None, :]
    w2_d = 1.0 - w0_d - w1_d
    z_d = (w0_d * pz_sel[None, :, 0] + w1_d * pz_sel[None, :, 1]
           + w2_d * pz_sel[None, :, 2])
    ok_d = ((w0_d >= eps) & (w1_d >= eps) & (w2_d >= eps) & in_img
            & (z_d >= -1.0) & (z_d <= 1.0) & tri_main[None, :])

    # back-routed candidates scatter at the MIRRORED column of the back
    # buffer (offset npix) so both outputs keep rasterize_index's
    # convention exactly
    npix = height * width
    col_sel = jnp.where(side[None, :], (width - 1) - cx_d, cx_d)
    pix_d = (jnp.where(side[None, :], npix, 0)
             + cy_d * width + col_sel).reshape(-1)
    valid = ok_d.reshape(-1)
    z_flat = z_d.reshape(-1)
    w0_flat = w0_d.reshape(-1)
    w1_flat = w1_d.reshape(-1)

    # both views' survivors share one compaction: capacity defaults 2x
    max_c = max_candidates if max_candidates > 0 else max(2 * T, 1 << 17)
    from avatarcap_tpu.ops.compaction import compact_mask_indices
    cand_of, n_covered, c_live = compact_mask_indices(valid, max_c)
    overflow = n_covered > max_c
    cand_of = jax.lax.optimization_barrier(cand_of)
    pix_c = jnp.where(c_live, pix_d[cand_of], 2 * npix)
    z_c = jnp.where(c_live, z_flat[cand_of], jnp.inf)

    zbuf = jnp.full((2 * npix + 1,), jnp.inf, z_c.dtype).at[pix_c].min(z_c)
    is_winner = (z_c == zbuf[pix_c]) & (z_c < jnp.inf)
    win_ids = jnp.where(is_winner, cand_of, jnp.iinfo(jnp.int32).max)
    winner = jnp.full((2 * npix + 1,), jnp.iinfo(jnp.int32).max,
                      jnp.int32).at[pix_c].min(win_ids)

    outs = []
    for s in range(2):
        wv = winner[s * npix:(s + 1) * npix]
        mask = wv != jnp.iinfo(jnp.int32).max
        safe_winner = jnp.where(mask, wv, 0)
        tri_of = safe_winner & (Tp - 1)
        # ortho shortcut: the pair precondition is w == 1 everywhere, so
        # perspective-correct weights ARE the screen barycentrics — skip
        # the iw[tri_of] row gather + division (~12 ms/frame of 12 B
        # latency-bound row DMAs at 512^2). Gather at covered pixels
        # only when the candidate capacity is tighter than the view
        # (winners <= covered candidates, already capacity-checked).
        if 0 < max_c < npix:
            pixc, _, livec = compact_mask_indices(mask, max_c)
            win_c = safe_winner[pixc]
            w0_c = w0_flat[win_c]
            w1_c = w1_flat[win_c]
            bw_c = jnp.stack([w0_c, w1_c, 1.0 - w0_c - w1_c], axis=-1)
            bw = jnp.zeros((npix + 1, 3), bw_c.dtype).at[
                jnp.where(livec, pixc, npix)].set(bw_c,
                                                  mode="drop")[:npix]
        else:
            w0_w = w0_flat[safe_winner]
            w1_w = w1_flat[safe_winner]
            bw = jnp.stack([w0_w, w1_w, 1.0 - w0_w - w1_w], axis=-1)
        out_depth = jnp.where(mask, zbuf[s * npix:(s + 1) * npix], jnp.inf)

        if big_tri_capacity > 0:
            if s == 0:
                bpx, bpy, bpz = px, py, pz
                barea, bbig = area2, is_big & ~side
            else:
                # big pass in the back view's own pixel space
                bpx = (width - 1.0) - px
                bpy, bpz = py, pz_b
                barea, bbig = -area2, is_big & side
            (big_tri, big_bw, big_depth, big_mask,
             big_over) = _big_triangle_pass(bpx, bpy, bpz, iw, barea,
                                            bbig, big_tri_capacity,
                                            height, width)
            overflow = overflow | big_over
            take_big = big_mask & (big_depth < out_depth)
            tri_of = jnp.where(take_big, big_tri, tri_of)
            bw = jnp.where(take_big[:, None], big_bw, bw)
            out_depth = jnp.where(take_big, big_depth, out_depth)
            mask = mask | big_mask
        else:
            overflow = overflow | jnp.any(is_big)

        outs.append(RasterIndex(
            tri=tri_of, bw=bw,
            depth=out_depth.reshape(height, width),
            mask=mask.reshape(height, width),
            overflow=overflow, n_candidates=n_covered,
            n_big=jnp.sum(is_big & (side if s else ~side))
            .astype(jnp.int32)))
    # both sides report the shared overflow flag
    return outs[0]._replace(overflow=overflow), \
        outs[1]._replace(overflow=overflow)


def rasterize(clip_verts: jnp.ndarray, attrs: jnp.ndarray,
              valid_tris: jnp.ndarray,
              height: int, width: int, window: int = 4,
              cull: bool = True,
              bg_value: float = 0.0,
              max_candidates: int = 0,
              big_tri_capacity: int = 0) -> RasterOutput:
    """Rasterize a triangle soup with per-vertex attributes (T, 3, A).

    Index pass + one interpolation; callers rendering several attribute
    layers of the same mesh should call `rasterize_index` once and
    `interpolate` per layer instead.
    """
    ri = rasterize_index(clip_verts, valid_tris, height, width,
                         window=window, cull=cull,
                         max_candidates=max_candidates,
                         big_tri_capacity=big_tri_capacity)
    # masked interpolation at the candidate capacity; its own overflow
    # bit covers the case where exact big-triangle coverage pushes the
    # covered-pixel count past the windowed-candidate bound
    img, iovf = interpolate(ri, attrs, bg_value,
                            covered_capacity=max_candidates,
                            with_overflow=True)
    return RasterOutput(attrs=img, depth=ri.depth, mask=ri.mask,
                        overflow=ri.overflow | iovf)


def _big_triangle_pass(px, py, pz, iw, area2, is_big, capacity,
                       height, width):
    """Exact coverage for <=capacity oversized triangles, scatter-free:
    every pixel tests each big triangle and keeps the min-depth winner.

    The (C, P) candidate math feeds the argmin as a SINGLE-consumer
    chain so XLA fuses it into the reduce without materializing any
    (capacity, H*W) array (an earlier version re-read w0/w1/zm at the
    winners — ~6 materialized (C, P) f32 arrays, ~40 ms/frame at
    C=64..128, P=512^2); winner attributes are then RECOMPUTED per
    pixel from a one-hot (P, C) @ (C, 16) coefficient matmul (exact:
    identical per-element expressions, and int columns < 2^24 ride f32
    exactly).

    Returns flat (P,) winner tri ids (into the ORIGINAL soup), (P, 3)
    weights, (P,) depth (+inf empty), (P,) mask, () overflow.
    """
    from avatarcap_tpu.ops.compaction import compact_mask_indices
    idx, n_big, live = compact_mask_indices(is_big, capacity)
    bpx, bpy, bpz = px[idx], py[idx], pz[idx]           # (C, 3)
    biw = iw[idx]
    barea = area2[idx]

    fy, fx = jnp.meshgrid(jnp.arange(height, dtype=px.dtype),
                          jnp.arange(width, dtype=px.dtype), indexing="ij")
    fx = fx.reshape(-1)                                 # (P,)
    fy = fy.reshape(-1)

    ax, ay = bpx[:, 0:1], bpy[:, 0:1]
    bx, by = bpx[:, 1:2], bpy[:, 1:2]
    cx, cy = bpx[:, 2:3], bpy[:, 2:3]
    inv_area = 1.0 / jnp.where(jnp.abs(barea) < 1e-12, 1.0,
                               barea)[:, None]
    eps = -1e-6

    def cover_z(w0, w1, z0, z1, z2, alive):
        w2 = 1.0 - w0 - w1
        covered = (w0 >= eps) & (w1 >= eps) & (w2 >= eps) & alive
        z = w0 * z0 + w1 * z1 + w2 * z2
        covered &= (z >= -1.0) & (z <= 1.0)
        return covered, z

    w0 = ((cx - bx) * (fy[None] - by) - (cy - by) * (fx[None] - bx)) \
        * inv_area                                      # (C, P)
    w1 = ((ax - cx) * (fy[None] - cy) - (ay - cy) * (fx[None] - cx)) \
        * inv_area
    covered, z = cover_z(w0, w1, bpz[:, 0:1], bpz[:, 1:2], bpz[:, 2:3],
                         live[:, None])
    zm = jnp.where(covered, z, jnp.inf)                 # (C, P)
    best = jnp.argmin(zm, axis=0)                       # (P,) first min wins

    # one-hot winner row: 16 coefficient columns recomputed per pixel
    C = zm.shape[0]
    table = jnp.concatenate(
        [bpx, bpy, bpz, biw, barea[:, None],
         idx.astype(px.dtype)[:, None],
         live.astype(px.dtype)[:, None]], axis=-1)      # (C, 14+2)
    onehot = (best[:, None]
              == jnp.arange(C, dtype=best.dtype)[None, :]).astype(px.dtype)
    rows = jnp.matmul(onehot, table, precision="highest")  # (P, 16)
    rax, ray = rows[:, 0], rows[:, 3]
    rbx, rby = rows[:, 1], rows[:, 4]
    rcx, rcy = rows[:, 2], rows[:, 5]
    rz = rows[:, 6:9]
    riw = rows[:, 9:12]
    rarea = rows[:, 12]
    rtri = rows[:, 13]
    rlive = rows[:, 14] > 0.5
    rinv = 1.0 / jnp.where(jnp.abs(rarea) < 1e-12, 1.0, rarea)
    w0b = ((rcx - rbx) * (fy - rby) - (rcy - rby) * (fx - rbx)) * rinv
    w1b = ((rax - rcx) * (fy - rcy) - (ray - rcy) * (fx - rcx)) * rinv
    mask, zbest = cover_z(w0b, w1b, rz[:, 0], rz[:, 1], rz[:, 2], rlive)
    bw = _perspective_weights(w0b, w1b, riw)            # (P, 3)
    tri = jnp.where(mask, rtri.astype(jnp.int32), 0)
    return tri, bw, jnp.where(mask, zbest, jnp.inf), mask, n_big > capacity


def transform_to_clip(vertices: jnp.ndarray, mvp: jnp.ndarray) -> jnp.ndarray:
    """(N, 3) world verts x (4, 4) row-major MVP -> (N, 4) clip coords."""
    vh = jnp.concatenate([vertices, jnp.ones_like(vertices[..., :1])], -1)
    return jnp.einsum("ij,nj->ni", mvp, vh, precision="highest")


def soup_to_tris(vertices: jnp.ndarray, num_tris: jnp.ndarray,
                 max_tris: int):
    """Marching-cubes soup (3T, 3) -> ((T,3,3) verts, (T,) valid)."""
    tris = vertices.reshape(max_tris, 3, 3)
    valid = jnp.arange(max_tris) < num_tris
    return tris, valid


def indexed_to_soup(vertices: jnp.ndarray, faces: jnp.ndarray):
    """Indexed mesh -> per-triangle vertex array (F, 3, 3)."""
    return vertices[faces]
