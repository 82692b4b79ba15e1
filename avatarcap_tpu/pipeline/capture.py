"""Full AvatarCap capture pipeline (reference main.py:275-504).

Per frame, stages 1-4 of run_avatarcap, all device-side:

1. avatar geometry: occupancy over the compacted near-SMPL grid points ->
   scatter into the SMPL-prior volume -> marching tets -> Sobel normals ->
   canonical normal/phong renders -> LBS skinning to live space.
2. canonical normal fusion: image normals lifted to the canonical mesh +
   optimization-based merge with avatar normals.
3. ReconNet: hourglass features of the fused front/back normal maps ->
   pixel-aligned occupancy -> second marching tets -> skin to live.
4. optional texture: NeRF vertex colors integrated along -normal rays in
   canonical space, transferred to the recon mesh by nearest neighbor.

The reference crosses GPU<->CPU>=6x per frame (skimage MC, GL renders,
normal EXR, torch chunk loops, SURVEY §3.2); here every stage is jitted
and only final images/meshes leave the device.

Every stage function takes the per-subject dynamic arrays explicitly as a
``CaptureState`` pytree (first argument) — nothing is read through
mutable instance attributes during tracing, so the fused whole-frame
program, the per-stage jits, and vmapped streaming all share the same
stage bodies re-entrantly.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from avatarcap_tpu.models.avatar import GeoTexAvatar
from avatarcap_tpu.models.recon import ReconNetwork
from avatarcap_tpu.pipeline.avatar import (
    AvatarStatics, FrameInputs, compute_pose_features, query_occupancy,
    pack_fused_query_weights, grid_pose_features, render_rays)
from avatarcap_tpu.ops.pallas_query import (ray_color_query_fused,
                                            warp_template_query_fused)
from avatarcap_tpu.ops.marching_cubes import marching_tets, mesh_grid_coords
from avatarcap_tpu.ops.sobel import sample_volume_normals
from avatarcap_tpu.ops.knn import knn, approx_lbs_weights
from avatarcap_tpu.render.camera import (
    cano_front_back_mvp, gl_perspective_projection_matrix, real2gl_matrix)
from avatarcap_tpu.render.visualize import (
    render_live_mesh, cano_index_passes, cano_interpolate, cano_phong)
from avatarcap_tpu.fusion.normal_fusion import (
    lift_image_normals, merge_normal_images, merge_normal_images_cover)


class CaptureGrid(NamedTuple):
    """Static per-subject canonical query grid (from the dataset).

    The optional tail fields hold the coarse level of the hierarchical
    (coarse-to-fine) query; `build_grid_hierarchy` derives them from the
    fine grid once per subject.
    """

    valid_pts: jnp.ndarray     # (Nv_pad, 3) compacted near-SMPL points
    valid_idx: jnp.ndarray     # (Nv_pad,) flat grid indices (OOB = dropped)
    prior_volume: jnp.ndarray  # (X*Y*Z,) SMPL-prior occupancy elsewhere
    vol_res: tuple             # static (X, Y, Z)
    valid_mask: jnp.ndarray = None  # (X*Y*Z,) bool near-SMPL band
    c_pts: jnp.ndarray = None  # (Nc_pad, 3) coarse band points
    c_idx: jnp.ndarray = None  # (Nc_pad,) coarse flat indices (OOB pad)
    c_fine_idx: jnp.ndarray = None  # (Nc_pad,) same nodes' FINE indices
    c_prior: jnp.ndarray = None     # (Xc*Yc*Zc,) coarse prior
    c_res: tuple = None             # static (Xc, Yc, Zc)


# CaptureGrid fields that are (per-subject, device-resident) ARRAYS; the
# remaining fields (vol_res, c_res) are static Python shape tuples and
# must never cross a jit boundary as pytree leaves.
GRID_ARRAY_FIELDS = ("valid_pts", "valid_idx", "prior_volume",
                     "valid_mask", "c_pts", "c_idx", "c_fine_idx",
                     "c_prior")


class CaptureState(NamedTuple):
    """Per-subject dynamic arrays, threaded explicitly through stages.

    The per-subject constants (grid, statics, skinning volume, packed
    kernel weights — several hundred MB) must arrive at the fused frame
    program as ARGUMENTS: embedding them as XLA constants overflows the
    remote-compile payload limit on the tunneled runtime. Threading them
    as one pytree also keeps the stage functions pure, so the fused
    frame, per-stage jits, and vmapped streaming can share the bodies.
    """

    grid: Any          # dict of CaptureGrid array fields (GRID_ARRAY_FIELDS)
    statics: AvatarStatics
    skin_wvol: Any = None      # (X, Y, Z, 12+J?) packed skinning volume
    packed_query: Any = None   # pallas warp+template weights
    packed_recon: Any = None   # pallas recon decoder weights
    packed_tex: Any = None     # pallas weights of the texture-finetuned
    # avatar (reference main.py:307-314); None = share packed_query
    near_d_vol: Any = None     # (X, Y, Z) distance-to-SMPL grid over
    # cano_bounds (ops/knn.near_distance_volume), present when
    # CaptureOptions.near_flag_mode == 'volume'


def build_grid_hierarchy(grid: CaptureGrid, cano_bounds,
                         pad_to: int = 8192) -> CaptureGrid:
    """Derive the coarse level for the hierarchical grid query.

    Coarse node (i, j, k) IS fine node (2i, 2j, 2k), so coarse values
    upsample onto the fine lattice exactly and pose-feature columns are
    shared. One host readback (the coarse band count) sizes the static
    compaction; everything else stays on device.
    """
    X, Y, Z = grid.vol_res
    Xc, Yc, Zc = (X + 1) // 2, (Y + 1) // 2, (Z + 1) // 2
    valid_mask = jnp.zeros((X * Y * Z,), bool).at[grid.valid_idx].set(
        True, mode="drop")
    vm3 = valid_mask.reshape(X, Y, Z)
    cmask = vm3[::2, ::2, ::2]
    c_prior = grid.prior_volume.reshape(X, Y, Z)[::2, ::2, ::2].reshape(-1)

    from avatarcap_tpu.ops.compaction import compact_mask_indices
    n_c = int(jnp.sum(cmask))                   # one readback, init-time
    cap = n_c + ((-n_c) % pad_to)
    cidx, _, live = compact_mask_indices(cmask.reshape(-1), cap)
    ci = cidx // (Yc * Zc)
    cj = (cidx // Zc) % Yc
    ck = cidx % Zc
    lo, hi = cano_bounds[0], cano_bounds[1]
    frac = jnp.stack([(2 * ci) / (X - 1), (2 * cj) / (Y - 1),
                      (2 * ck) / (Z - 1)], axis=-1).astype(jnp.float32)
    c_pts = jnp.where(live[:, None], lo + frac * (hi - lo), 0.0)
    c_idx = jnp.where(live, cidx, Xc * Yc * Zc).astype(jnp.int32)
    c_fine_idx = jnp.where(
        live, ((2 * ci) * Y + 2 * cj) * Z + 2 * ck, 0).astype(jnp.int32)
    return grid._replace(valid_mask=valid_mask, c_pts=c_pts, c_idx=c_idx,
                         c_fine_idx=c_fine_idx, c_prior=c_prior,
                         c_res=(Xc, Yc, Zc))


def _upsample2(c: jnp.ndarray, fine_res) -> jnp.ndarray:
    """(Xc, Yc, Zc) -> (X, Y, Z) linear upsampling where coarse node i
    sits at fine node 2i (edge-clamped)."""
    out = c
    for axis, n_fine in enumerate(fine_res):
        a = jnp.moveaxis(out, axis, 0)
        b = jnp.concatenate([a[1:], a[-1:]], axis=0)
        mid = 0.5 * (a + b)
        inter = jnp.stack([a, mid], axis=1).reshape(
            (-1,) + a.shape[1:])[:n_fine]
        out = jnp.moveaxis(inter, 0, axis)
    return out


def hierarchical_volume(value_fn, grid: CaptureGrid, cano_bounds,
                        c_prior, prior, iso, alpha: float,
                        refine_capacity: int, with_stats: bool = False):
    """Coarse-to-fine occupancy volume (see CaptureOptions).

    Evaluate the implicit field on the 2x-coarse lattice first, refine
    only fine nodes inside coarse cells whose corner range comes within
    ``alpha`` x (local range) of the iso level.

    Args:
      value_fn: ``(pts (N, 3), fine_flat_idx (N,)) -> (N,)`` field values.
      grid: CaptureGrid with the hierarchy fields populated
        (`build_grid_hierarchy`); vol_res/c_res must be static tuples.
      c_prior / prior: coarse / fine prior volumes IN THE FIELD'S OWN
        value range (callers rescale, e.g. recon occupancy in [0, 1]).
      iso: surface level in the field's range.

    Returns (vol_flat (X*Y*Z,), query_overflow ()).
    """
    g = grid
    X, Y, Z = g.vol_res
    c_occ = value_fn(g.c_pts, g.c_fine_idx)
    cvol = c_prior.at[g.c_idx].set(c_occ, mode="drop").reshape(g.c_res)
    # Activation test on a SATURATION-CLAMPED copy: the prior is
    # +-1 but e.g. an sdf-mode field clips at +-0.05, so cells on
    # the band boundary would otherwise show a huge corner range
    # and the alpha margin would activate the entire band surface
    # (~2x the real surface in false positives, measured). The
    # field's own saturation is its max |value - iso| over the
    # queried band.
    c_band = g.c_idx < int(np.prod(g.c_res))
    sat = jnp.max(jnp.where(c_band, jnp.abs(c_occ - iso), 0.0))
    cact = jnp.clip(cvol, iso - sat, iso + sat)
    mx = jax.lax.reduce_window(cact, -jnp.inf, jax.lax.max,
                               (2, 2, 2), (1, 1, 1), "valid")
    mn = -jax.lax.reduce_window(-cact, -jnp.inf, jax.lax.max,
                                (2, 2, 2), (1, 1, 1), "valid")
    rng8 = mx - mn
    act = ((mx >= iso - alpha * rng8)
           & (mn <= iso + alpha * rng8))
    # coarse cell ci covers fine cells [2ci, 2ci+1]; edge cells
    # beyond the coarse lattice are conservatively active
    F = act
    for axis in range(3):
        F = jnp.repeat(F, 2, axis=axis)
    F = jnp.pad(F, [(0, max(0, (X - 1) - F.shape[0])),
                    (0, max(0, (Y - 1) - F.shape[1])),
                    (0, max(0, (Z - 1) - F.shape[2]))],
                constant_values=True)[:X - 1, :Y - 1, :Z - 1]
    # node mask: a node is refined iff it touches an active cell
    node = F
    for axis, n in ((0, X), (1, Y), (2, Z)):
        pl = [(0, 0)] * 3
        pr = [(0, 0)] * 3
        pl[axis] = (1, 0)
        pr[axis] = (0, 1)
        node = jnp.pad(node, pl) | jnp.pad(node, pr)
    node = node & g.valid_mask.reshape(X, Y, Z)

    from avatarcap_tpu.ops.compaction import compact_mask_indices
    r_cap = min(refine_capacity, X * Y * Z)
    ridx, n_r, live = compact_mask_indices(node.reshape(-1), r_cap)
    q_overflow = n_r > r_cap
    zi = ridx & (Z - 1) if Z & (Z - 1) == 0 else ridx % Z
    col = (ridx >> (Z.bit_length() - 1) if Z & (Z - 1) == 0
           else ridx // Z)
    yi = col % Y
    xi = col // Y
    lo = cano_bounds[0]
    hi = cano_bounds[1]
    frac = jnp.stack([xi / (X - 1), yi / (Y - 1), zi / (Z - 1)],
                     axis=-1).astype(jnp.float32)
    rpts = jnp.where(live[:, None], lo + frac * (hi - lo), 0.0)
    r_occ = value_fn(rpts, jnp.where(live, ridx, 0))
    vol = _upsample2(cvol, (X, Y, Z)).reshape(-1)
    vol = vol.at[jnp.where(live, ridx, X * Y * Z)].set(
        r_occ, mode="drop")
    vol = jnp.where(g.valid_mask, vol, prior)
    if with_stats:
        return vol, q_overflow, n_r
    return vol, q_overflow


class CaptureMesh(NamedTuple):
    vertices: jnp.ndarray      # (3*max_tris, 3) triangle soup
    normals: jnp.ndarray       # (3*max_tris, 3)
    num_tris: jnp.ndarray      # ()
    valid: jnp.ndarray         # (max_tris,) bool
    overflow: jnp.ndarray = None  # () bool: max_tris or max_active hit
    edge_ids: jnp.ndarray = None  # (3*max_tris,) shared-vertex keys
    # (ops/marching_cubes.Mesh.edge_ids), present when the deduped NeRF
    # color path is enabled


@dataclasses.dataclass(frozen=True)
class CaptureOptions:
    iso_value: float = 0.0          # 0 sdf / 0.5 occupancy
    max_tris: int = 1 << 20
    max_active: int = (1 << 18) + (1 << 17)  # ~2.3 tris/cube (mc256):
    # a ~600k-tri body has ~260k active cubes; overflow is reported
    # Separate static capacities for the RECON mesh (0 = same as
    # max_tris/max_active). ReconNet output is smoother than the
    # wrinkled avatar template (~245k vs ~554k tris on the bench body),
    # and every downstream walk — emission fill, skinning row gathers,
    # soup padding — is paid at static capacity, so oversizing the
    # recon mesh 3x costs real milliseconds. Overflow is reported.
    recon_max_tris: int = 0
    recon_max_active: int = 0
    render_res: int = 512
    raster_window: int = 4
    # canonical ortho passes see sub-2px MC triangles (cube diag ~1.4
    # voxels at 512px over ~2m bounds): a 3x3 window covers them with
    # 44% fewer candidate slots; stragglers go to the exact big-tri pass
    cano_window: int = 3
    cano_big_tris: int = 64   # the exact pass materializes (cap, H*W)
    # intermediates — keep it small; MC triangles here are sub-2px
    # live position pass (fusion visibility): same small window as the
    # cano passes — the live mesh is the skinned MC soup, still ~1-3 px
    # through the real camera — with a larger exact-pass capacity since
    # perspective can blow up near-camera triangles. Cheaper AND more
    # exact than a plain 4x4 window (which partially rasterizes every
    # oversized triangle).
    live_big_tris: int = 128
    # Candidate-buffer capacity for the index passes (0 = the raster's
    # own 2*T default). EVERY z-resolve gather/scatter walks this many
    # slots (~10 ns each on v5e), so sizing it near the measured covered
    # count (sub-2px MC triangles cover ~1.2 px each; overflow is
    # reported) trims ~10 ns * slack per pass.
    raster_max_candidates: int = 0
    fusion_iters: int = 100
    integrate_manner: str = "merge"  # 'merge' | 'cover'
    n_samples: int = 64              # nerf color samples
    # NeRF vertex colors are integrated for every triangle-soup slot
    # (3*max_tris rays x n_samples): unchunked that is a >100 GB
    # activation at capture size. Chunks of 16k rays (1M samples) keep
    # peak activations ~1 GB while each chunk still fills the MXU; the
    # reference chunks the same loop at 2048 (main.py:469).
    nerf_chunk: int = 16384
    # Dedup NeRF color rays to UNIQUE mesh vertices: an MC soup slot is
    # one corner of one triangle, but the underlying vertex (a volume-
    # edge crossing, Mesh.edge_ids) is shared by ~6 triangles — per-slot
    # integration redoes the same 64-sample ray ~6x (round-3's 35 s
    # w_nerf frame). Colors are computed once per unique vertex and
    # scattered back to every slot — EXACT for the color values (same
    # query), with the one documented nuance that a shared vertex gets
    # ONE representative normal for its ray instead of per-slot cube
    # normals (sub-degree apart, tests/test_capture.py pins the rgb
    # deviation). 0 disables (reference-shaped per-slot path). Unique
    # count ~ num_tris/2 (closed-mesh Euler bound); overflow reported.
    nerf_unique_capacity: int = 0
    # Pose features along each color ray (fused path): 'lerp' = exact
    # bilinear fetch at the ray's two endpoints + per-sample linear
    # interpolation (the U-Net feature map is smooth over the ray's
    # ~9 px span); 'exact' = per-sample bilinear fetch like the
    # reference — 4 row gathers per sample, the dominant cost at
    # millions of samples.
    nerf_feat_mode: str = "lerp"
    # <8 cm near-body flag inside the fused color integral:
    # 'ray' = exact KNN at `near_flag_anchors` static depths per ray +
    # linear interpolation of the 1-Lipschitz distance along the ray
    # (the per-sample interp is one static (A, S) matmul; 64x fewer KNN
    # rows than per-sample, error <= half the anchor gap ~ 1.2 cm at the
    # flag threshold — see _anchored_near_flags);
    # 'volume' = trilinear sample of a per-subject distance-to-SMPL grid
    # (ops/knn.near_distance_volume; sub-voxel accurate but 8 random
    # gathers per sample — measured ~1.1 s/frame at capture scale);
    # 'knn' = exact per-sample KNN like the reference
    # (arch_avatar.py:190-191) — measured ~1.7 s/frame of K=3 matmuls at
    # capture scale, parity mode.
    near_flag_mode: str = "ray"
    near_flag_voxel: float = 0.025
    near_flag_anchors: int = 4
    # Dedup the RECON soup for NN color transfer (reference
    # main.py:480-485): with both meshes deduped to unique volume-edge
    # vertices, the K=1 NN search shrinks from (3*recon_max_tris) x
    # (3*max_tris) to unique x unique — measured 18.9 s -> sub-second at
    # capture scale (the K=3 distance matmul runs the MXU at 3/128
    # utilization, so its pass count IS the frame cost). 0 disables
    # (brute soup-vs-soup path). Overflow reported.
    recon_unique_capacity: int = 0
    # How the RECON mesh gets vertex colors:
    # 'nn' = the reference's NN transfer from the avatar soup's
    # integrated colors (main.py:480-485) — parity mode; even deduped,
    # the K=3 distance matmul is pinned at 3/128 MXU utilization
    # (~0.7 s/frame at capture scale).
    # 'direct' = integrate the SAME NeRF color ray at each unique recon
    # vertex (its own position/normal) through the fused kernel — the
    # kernel runs at >50% MFU, so integrating ~123k extra rays is ~4x
    # cheaper than the NN search, and the color comes from the exact
    # query point instead of its nearest avatar vertex (<=~2 mm away on
    # a converged capture; the reference only transfers because a CUDA
    # ray integral per recon vertex would cost it another full pass).
    # Requires recon_unique_capacity > 0 and the fused query path.
    recon_color_mode: str = "nn"
    use_fused_query: bool = True     # Pallas fast path for the grid query
    # 'volume': per-subject KNN-LBS weight grid + trilinear matrix
    # sampling (see body/skinning.py); 'knn': exact per-vertex KNN like
    # the reference (utils/smpl_util.py:24-39) — ~30x slower per frame.
    skinning_mode: str = "volume"
    skin_voxel: float = 0.01
    # Consecutive soup vertices sharing ONE skinning matrix-row gather
    # (volume mode): 1 = exact per-vertex sampling, 3 = one row DMA per
    # MC triangle — its 3 vertices sit on one extraction cube, within a
    # single ~1 cm skinning cell, so the shared-cell weights are exact
    # or a bounded linear extrapolation (body/skinning.py). Row DMAs
    # dominate the skinning stage, so 3 cuts it ~3x.
    skin_row_group: int = 1
    # 'trilinear': analytic gradient of each cube's own interpolant —
    # free (corner values already on hand in the extraction kernel);
    # 'mc_edge': Sobel node gradients interpolated along MC edges inside
    # the kernel (~120 ms/frame of carried-gradient traffic);
    # 'sobel_sample': exact reference resampling
    # (utils/recon_util.py:32-48) — slowest, parity mode.
    normal_mode: str = "trilinear"
    # Coarse-to-fine grid query: evaluate the implicit nets on the 2x
    # coarse lattice first, refine only fine nodes inside coarse cells
    # whose corner range comes within hier_alpha x (local range) of the
    # iso level. ~4x fewer network queries + a 3x smaller occupancy
    # scatter on body-scale grids; exact whenever the field within a
    # coarse cell stays within alpha x its corner range of its corner
    # span (sub-voxel features sharper than that can be missed — the
    # brute-force path remains via hierarchical_query=False).
    hierarchical_query: bool = True
    hier_alpha: float = 1.0
    # ~900k fine nodes refine on a smooth body at 384x384x128, ~1.8M on
    # the wrinkled clothing-complexity body (saturation-clamped
    # activation); the refine kernel runs at this static capacity, so
    # oversizing costs real ms (~5 ms / 256k at 57 Mpts/s). Overflow is
    # reported on the mesh.
    refine_capacity: int = 1 << 21
    # Separate refine capacity for the RECON hierarchical query (0 =
    # same as refine_capacity). Like recon_max_tris/active: the recon
    # field is ~2x smoother than the wrinkled avatar template (~107k vs
    # ~276k active cubes on the bench body), and the refine kernel runs
    # at static capacity, so inheriting the avatar's 2M cap pays ~1M
    # wasted decoder evaluations per frame. Overflow is reported.
    recon_refine_capacity: int = 0


def _extract_mesh(volume_flat, grid: CaptureGrid, bounds, iso, max_tris,
                  max_active, normal_mode: str = "mc_edge",
                  with_edge_ids: bool = False):
    """Volume -> mesh + Sobel normals (reference main.py:357-375).

    normal_mode 'mc_edge' interpolates Sobel node gradients along each MC
    edge inside the extraction kernel (~10x less gather traffic);
    'sobel_sample' trilinearly resamples the Sobel volume at every soup
    vertex exactly like the reference (utils/recon_util.py:32-48).
    """
    from avatarcap_tpu.ops.sobel import extract_normal_volume
    X, Y, Z = grid.vol_res
    vol = volume_flat.reshape(X, Y, Z)
    voxel = (bounds[1] - bounds[0]) / jnp.asarray([X, Y, Z], bounds.dtype)
    kw = dict(max_tris=max_tris, max_active=max_active,
              with_edge_ids=with_edge_ids)
    if normal_mode == "trilinear":
        mesh = marching_tets(vol, iso, bounds[0], voxel,
                             gradient_normals=True, **kw)
        normals = mesh.normals
    elif normal_mode == "mc_edge":
        nvol = extract_normal_volume(vol, voxel)
        mesh = marching_tets(vol, iso, bounds[0], voxel,
                             normal_volume=nvol, **kw)
        normals = mesh.normals
    else:
        mesh = marching_tets(vol, iso, bounds[0], voxel, **kw)
        grid_coords = mesh_grid_coords(mesh.vertices, bounds)
        normals = sample_volume_normals(vol, voxel, grid_coords)
    valid = jnp.arange(max_tris) < mesh.num_tris
    return CaptureMesh(mesh.vertices, normals, mesh.num_tris, valid,
                       mesh.overflow, mesh.edge_ids)


def anchored_near_flags(ro: jnp.ndarray, rd: jnp.ndarray, near: float,
                        far: float, n_samples: int,
                        smpl_vertices: jnp.ndarray,
                        threshold: float = 0.08, n_anchors: int = 4):
    """Near-body flags for every sample of every ray, from per-ray
    anchor distances (CaptureOptions.near_flag_mode == 'ray').

    The distance-to-surface field d is 1-Lipschitz, so along a short ray
    segment it is within (anchor gap)/2 of the linear interpolation of
    exact anchor values: with 4 anchors over the reference's 7 cm color
    band (main.py:468-470: near/far = depth -0.02/+0.05) the worst-case
    flag-threshold error is ~1.2 cm — the same class as the 2.5 cm
    discretization the reference accepts for its LBS weight volume, at
    1/64th the KNN rows of the per-sample flag and none of the gather
    traffic of a distance grid. The per-sample interpolation is one
    static (A, S) matmul.

    Args:
      ro, rd: (R, 3) ray origins / unit directions.
      near, far, n_samples: STATIC sample-depth grid parameters (the
        sample depths are linspace(near, far, n_samples)).
      smpl_vertices: (M, 3) body model vertices.
    Returns:
      (R, n_samples) bool — sample is within `threshold` of the body.
    """
    za = np.linspace(near, far, n_anchors).astype(np.float32)
    zs = np.linspace(near, far, n_samples).astype(np.float32)
    seg = np.clip(np.searchsorted(za, zs) - 1, 0, n_anchors - 2)
    w1 = (zs - za[seg]) / (za[seg + 1] - za[seg])
    W = np.zeros((n_samples, n_anchors), np.float32)
    W[np.arange(n_samples), seg] = 1.0 - w1
    W[np.arange(n_samples), seg + 1] = w1
    d = anchor_distances(ro, rd, near, far, smpl_vertices,
                         n_anchors=n_anchors)
    d_s = jnp.matmul(d, jnp.asarray(W.T), precision="highest")  # (R, S)
    return d_s < threshold


def anchor_distances(ro: jnp.ndarray, rd: jnp.ndarray, near: float,
                     far: float, smpl_vertices: jnp.ndarray,
                     n_anchors: int = 4):
    """Exact distance-to-body at A uniform depth anchors per ray.

    The masking data of near_flag_mode == 'ray': anchored_near_flags
    interpolates these on the sample grid host-side; the fused ray
    kernel (ops/pallas_query.py:ray_color_query_fused) does the same
    lerp in-kernel per sample.
    """
    za = np.linspace(near, far, n_anchors).astype(np.float32)
    R = ro.shape[0]
    pts = (ro[:, None, :]
           + rd[:, None, :] * jnp.asarray(za)[None, :, None])  # (R, A, 3)
    # bf16x3 cross term: ~um^2-scale d2 error at meter coords, 2.4x
    # cheaper than f32 (measured 141 -> 58 ms at 1.31M anchors on v5e)
    # and far inside this mode's own ~1.2 cm interpolation tolerance
    d2, _ = knn(pts.reshape(-1, 3), smpl_vertices, k=1,
                chunk=65536, precision="high")
    return jnp.sqrt(d2[:, 0]).reshape(R, n_anchors)


def _dedupe_soup(tri_valid: jnp.ndarray, edge_ids: jnp.ndarray,
                 capacity: int):
    """Group triangle-soup slots by their shared volume-edge vertex.

    An MC soup slot is one corner of one triangle, but the underlying
    vertex (a volume-edge crossing, marching_cubes.Mesh.edge_ids) is
    shared by ~6 triangles. Sort + segment scan assigns each slot a
    dense unique index so per-vertex work (color rays, NN transfer) runs
    once per vertex instead of ~6x.

    Args:
      tri_valid: (T,) bool per-triangle validity.
      edge_ids: (3T,) int32 volume-edge keys (>= 0 where valid).
      capacity: static unique-vertex capacity U.
    Returns:
      rep: (U,) int32 — one representative soup slot per unique vertex
        (slot 0 for unused capacity; mask with valid_u).
      uo: (3T,) int32 — each slot's unique index, clamped into [0, U).
      valid_v: (3T,) bool — slot carries a real vertex.
      valid_u: (U,) bool — unique slot is populated.
      overflow: () bool — more unique vertices than capacity.
    """
    imax = jnp.iinfo(jnp.int32).max
    valid_v = jnp.repeat(tri_valid, 3) & (edge_ids >= 0)
    ids = jnp.where(valid_v, edge_ids, imax)
    order = jnp.argsort(ids)                      # (3T,)
    sid = ids[order]
    newf = jnp.concatenate([jnp.ones((1,), bool), sid[1:] != sid[:-1]])
    seg = jnp.cumsum(newf.astype(jnp.int32)) - 1  # dense unique index
    vsort = sid != imax
    n_unique = jnp.max(jnp.where(vsort, seg + 1, 0))
    overflow = n_unique > capacity
    rep = jnp.zeros((capacity,), jnp.int32).at[
        jnp.where(newf & vsort, seg, capacity)].set(order, mode="drop")
    uo = jnp.zeros((edge_ids.shape[0],), jnp.int32).at[order].set(
        jnp.minimum(seg, capacity - 1))
    valid_u = jnp.arange(capacity) < jnp.minimum(n_unique, capacity)
    return rep, uo, valid_v, valid_u, overflow


class AvatarCapture:
    """Host orchestrator over jitted per-stage device functions.

    Args mirror the reference's test-time setup (reference main.py:296-331):
    a geometry avatar, an optionally texture-finetuned avatar for color,
    and a ReconNet, plus per-subject statics and the query grid.
    """

    def __init__(self, avatar: GeoTexAvatar, avatar_vars,
                 statics: AvatarStatics, grid: CaptureGrid,
                 recon: Optional[ReconNetwork] = None, recon_vars=None,
                 avatar_tex_vars=None,
                 options: CaptureOptions = CaptureOptions(),
                 shard_mesh=None, shard_axis: str = "data"):
        """shard_mesh: optional jax.sharding.Mesh — POINT-shard the two
        implicit grid queries (the FLOP-dominant stages) of every frame
        over its ``shard_axis`` so a multi-chip mesh cuts single-frame
        LATENCY, not just throughput (SURVEY §2.3's second scaling axis;
        the reference's equivalent is the chunked host loop at
        network/arch_avatar.py:366-377). Params/pose features are
        replicated; each device evaluates its slab of query points via
        shard_map and the occupancy scatter all-gathers slabs over ICI.
        Requires hierarchical_query; don't combine with the
        frame-sharded streaming vmap (one mesh axis per program)."""
        self.avatar = avatar
        self.avatar_vars = avatar_vars
        self.avatar_tex_vars = avatar_tex_vars or avatar_vars
        self.statics = statics
        self.recon = recon
        self.recon_vars = recon_vars
        self.opt = options
        self.shard_mesh = shard_mesh
        self.shard_axis = shard_axis

        center = np.asarray(statics.cano_smpl_center)
        (self._fmvp, self._fmv, self._bmvp, self._bmv) = \
            cano_front_back_mvp(center)

        o = self.opt

        # Pallas kernels are TPU-only; fall back to the XLA path elsewhere
        # (e.g. the virtual-CPU test platform).
        use_fused = o.use_fused_query and jax.default_backend() == "tpu"
        o = dataclasses.replace(o, use_fused_query=use_fused)
        self.opt = o
        packed_query = (pack_fused_query_weights(avatar_vars)
                        if o.use_fused_query else None)
        packed_tex = (pack_fused_query_weights(self.avatar_tex_vars)
                      if o.use_fused_query
                      and avatar_tex_vars is not None else None)

        if o.hierarchical_query and grid.c_idx is None:
            grid = build_grid_hierarchy(grid, statics.cano_bounds)
        self.grid = grid
        use_hier = o.hierarchical_query and grid.c_idx is not None

        if shard_mesh is not None:
            assert use_hier, "point sharding wraps the hierarchical vfs"
            n_shards = int(shard_mesh.shape[shard_axis])
            for name, cap in (
                    ("coarse capacity", grid.c_pts.shape[0]),
                    ("refine_capacity",
                     min(o.refine_capacity,
                         int(np.prod(grid.vol_res)))),
                    ("recon_refine_capacity",
                     min(o.recon_refine_capacity or o.refine_capacity,
                         int(np.prod(grid.vol_res))))):
                assert cap % n_shards == 0, (
                    f"{name}={cap} must divide the {n_shards}-way "
                    f"point shard")

        def shard_value_fn(vf):
            """Wrap a (pts (N,3), fidx (N,)) -> (N,) implicit-field fn
            so each mesh device evaluates its point slab (no-op without
            a shard_mesh). Closed-over packed weights / pose-feature
            columns are replicated by shard_map."""
            if shard_mesh is None:
                return vf
            from jax.sharding import PartitionSpec as SP
            spec = SP(shard_axis)

            def vf_sharded(pts, fidx):
                return jax.shard_map(vf, mesh=shard_mesh,
                                     in_specs=(spec, spec),
                                     out_specs=spec)(pts, fidx)
            return vf_sharded

        if o.skinning_mode == "volume":
            from avatarcap_tpu.body.skinning import build_skin_weight_volume
            skin_wvol = build_skin_weight_volume(
                statics.cano_smpl_vertices, statics.smpl_skinning_weights,
                statics.cano_bounds, voxel=o.skin_voxel)
            if o.skin_row_group > 1:
                # Triangle-grouped skinning rows are only a bounded
                # approximation when an MC triangle (~1.4 grid voxels
                # across) fits within ~one skinning cell; on coarser
                # grids vertices straddle several cells and the
                # shared-cell extrapolation error grows without bound
                # (measured: ~2.5 mm tail at 5 mm voxels vs 14 mm at
                # 28 mm voxels on the same body).
                span = np.asarray(statics.cano_bounds[1]
                                  - statics.cano_bounds[0], np.float64)
                voxel = float(np.max(span / (np.asarray(grid.vol_res)
                                             - 1)))
                if voxel > 1.5 * o.skin_voxel:
                    raise ValueError(
                        f"skin_row_group={o.skin_row_group} needs the "
                        f"query-grid voxel ({voxel * 1000:.1f} mm) to be "
                        f"<= 1.5x skin_voxel "
                        f"({o.skin_voxel * 1000:.1f} mm); use "
                        "skin_row_group=1 or a finer grid")
        else:
            skin_wvol = None

        if o.use_fused_query and recon_vars is not None:
            from avatarcap_tpu.ops.pallas_query import pack_recon_weights
            packed_recon = pack_recon_weights(
                recon_vars["params"]["image_decoder"])
        else:
            packed_recon = None

        if o.near_flag_mode == "volume" and o.use_fused_query:
            # consumed only by the fused NeRF color integral
            from avatarcap_tpu.ops.knn import near_distance_volume
            near_d_vol, _ = near_distance_volume(
                statics.cano_smpl_vertices, statics.cano_bounds,
                voxel=o.near_flag_voxel)
        else:
            near_d_vol = None

        self.state = CaptureState(
            grid={k: getattr(grid, k) for k in GRID_ARRAY_FIELDS
                  if getattr(grid, k) is not None},
            statics=statics, skin_wvol=skin_wvol,
            packed_query=packed_query, packed_recon=packed_recon,
            packed_tex=packed_tex, near_d_vol=near_d_vol)
        # convenience aliases (benchmarks reach for the packed weights)
        self._packed_query = packed_query
        self._packed_recon = packed_recon
        self._skin_wvol = skin_wvol

        # Static shape/config values the stage closures may capture:
        # everything DYNAMIC arrives via the CaptureState argument.
        grid_static = grid
        avatar_module = avatar
        recon_module = recon

        _Z = grid.vol_res[2]
        if _Z & (_Z - 1) == 0:
            _zb = _Z.bit_length() - 1
            col_of = lambda fidx: fidx >> _zb  # noqa: E731
        else:
            col_of = lambda fidx: fidx // _Z  # noqa: E731

        def avatar_geometry_stage(st: CaptureState, avatar_vars,
                                  frame: FrameInputs,
                                  want_edge_ids: bool = False):
            g = grid_static._replace(**st.grid)
            statics = st.statics
            feat, _ = compute_pose_features(avatar_module, avatar_vars,
                                            frame.smpl_pos_map)
            if o.use_fused_query:
                if use_hier:
                    pf_cols = grid_pose_features(
                        feat, statics, g.vol_res,
                        dtype=jnp.bfloat16, columns=True)

                    def vf(pts, fidx):
                        pf = pf_cols[col_of(fidx)]
                        return warp_template_query_fused(
                            st.packed_query["offset"],
                            st.packed_query["template"],
                            pts, pf)["occ"][:, 0]

                    vol, q_ovf = hierarchical_volume(
                        shard_value_fn(vf), g, statics.cano_bounds,
                        g.c_prior, g.prior_volume, o.iso_value,
                        o.hier_alpha, o.refine_capacity)
                else:
                    # grid-structured pose features (z-broadcast) +
                    # one-kernel warp+template query
                    pf = grid_pose_features(feat, statics, g.vol_res,
                                            g.valid_idx,
                                            dtype=jnp.bfloat16)
                    qout = warp_template_query_fused(
                        st.packed_query["offset"],
                        st.packed_query["template"],
                        g.valid_pts, pf)
                    vol = g.prior_volume.at[g.valid_idx].set(
                        qout["occ"][:, 0], mode="drop")
            elif use_hier:
                def vf_xla(pts, fidx):
                    out, _ = query_occupancy(avatar_module, avatar_vars,
                                             pts[None], feat, statics)
                    return out["cano_pts_ov"][0, :, 0]

                vol, q_ovf = hierarchical_volume(
                    shard_value_fn(vf_xla), g, statics.cano_bounds,
                    g.c_prior, g.prior_volume, o.iso_value, o.hier_alpha,
                    o.refine_capacity)
            else:
                out, _ = query_occupancy(avatar_module, avatar_vars,
                                         g.valid_pts[None], feat,
                                         statics)
                vol = g.prior_volume.at[g.valid_idx].set(
                    out["cano_pts_ov"][0, :, 0], mode="drop")
            mesh = _extract_mesh(vol, g, statics.cano_bounds,
                                 o.iso_value, o.max_tris, o.max_active,
                                 o.normal_mode,
                                 with_edge_ids=want_edge_ids
                                 and o.nerf_unique_capacity > 0)
            if use_hier:
                mesh = mesh._replace(overflow=mesh.overflow | q_ovf)
            return mesh, feat

        def cano_layers_stage(mesh: CaptureMesh, extra_tri_attrs=None):
            """One front + one back index pass over the canonical mesh,
            then all attribute layers by interpolation: avatar normals
            (reference main.py:369) and the phong preview (main.py:371-375).

            All per-vertex layers (normals + both sides' phong camera
            positions/normals + any EXTRA per-tri layer, e.g. the lifted
            image normals of the fusion stage) are concatenated into ONE
            15-18 channel attribute table so each side pays a single
            ~200 B row gather per pixel instead of several 36 B ones —
            row DMAs are latency-bound, so folding the fusion stage's
            two lifted-normal interpolations in here (the fused
            frame_body path) is 4 gather passes -> 2 (~19 ms/frame at
            512^2; same math as cano_interpolate + cano_phong)."""
            from avatarcap_tpu.render.raster import interpolate
            from avatarcap_tpu.render.visualize import phong_shade
            tris = mesh.vertices.reshape(-1, 3, 3)
            attr = mesh.normals.reshape(-1, 3, 3)
            fri, bri = cano_index_passes(
                tris, mesh.valid, jnp.asarray(self._fmvp),
                jnp.asarray(self._bmvp), res=o.render_res,
                window=o.cano_window, big_tris=o.cano_big_tris,
                max_candidates=o.raster_max_candidates)

            def cam_attrs(mv):
                cam_v = jnp.einsum("ij,tvj->tvi", mv[:3, :3], tris,
                                   precision="highest") + mv[:3, 3]
                cam_n = jnp.einsum("ij,tvj->tvi", mv[:3, :3], attr,
                                   precision="highest")
                cam_n = cam_n / jnp.maximum(
                    jnp.linalg.norm(cam_n, axis=-1, keepdims=True), 1e-12)
                return cam_v, cam_n

            fv, fn = cam_attrs(jnp.asarray(self._fmv))
            bv, bn = cam_attrs(jnp.asarray(self._bmv))
            layers = [attr, fv, fn, bv, bn]
            if extra_tri_attrs is not None:
                layers.append(extra_tri_attrs)
            wide = jnp.concatenate(layers, axis=-1)
            # masked interpolation: gather only covered pixels (the body
            # covers ~8-15% of the cano views); each call reports its
            # own overflow (big-triangle coverage can exceed the
            # windowed-candidate bound), OR'd into the frame flag
            cc = o.raster_max_candidates
            f_out, f_iovf = interpolate(fri, wide, covered_capacity=cc,
                                        with_overflow=True)
            b_out, b_iovf = interpolate(bri, wide, covered_capacity=cc,
                                        with_overflow=True)
            b_out = b_out[:, ::-1]
            interp_ovf = f_iovf | b_iovf
            front_n = f_out[..., 0:3]
            back_n = b_out[..., 0:3]
            phong_f = jnp.where(fri.mask[..., None],
                                phong_shade(f_out[..., 3:6],
                                            f_out[..., 6:9]), 1.0)
            phong_b = jnp.where(bri.mask[:, ::-1][..., None],
                                phong_shade(b_out[..., 9:12],
                                            b_out[..., 12:15]), 1.0)
            fri = fri._replace(overflow=fri.overflow | interp_ovf)
            base = (fri, bri, front_n, back_n, (phong_f, phong_b))
            if extra_tri_attrs is not None:
                # same convention as cano_interpolate: back x-flipped
                # (b_out is already flipped above)
                return base + (f_out[..., 15:18], b_out[..., 15:18])
            return base

        def lift_normals_stage(fri, bri, live_mesh: CaptureMesh,
                               valid, inferred_normal, pt_mats, w2c, proj,
                               fx, fy, cx, cy):
            """Stage 2a: lift image normals to the canonical mesh and
            interpolate at the shared cano index passes (reference
            normal_fusion.py:12-63)."""
            img_h, img_w = inferred_normal.shape[:2]
            proj_n_tris, lift_ovf = lift_image_normals(
                live_mesh.vertices.reshape(-1, 3, 3), valid,
                inferred_normal, pt_mats, w2c, proj,
                fx, fy, cx, cy, img_h, img_w, window=o.cano_window,
                big_tris=o.live_big_tris,
                max_candidates=o.raster_max_candidates,
                with_overflow=True)
            front_n, back_n = cano_interpolate(fri, bri, proj_n_tris)
            return front_n, back_n, lift_ovf

        def skinning_stage(st: CaptureState, mesh: CaptureMesh, cano2live):
            """Avatar mesh -> live space (reference main.py:383-394).

            Per-vertex matrices stay FLAT (N, 16) throughout (see
            body/skinning.py mats16_*): a (N, 4, 4) tensor at soup scale
            under vmap gets a 30-64x padded tiled layout and OOM'd the
            streaming program in round 3.
            """
            from avatarcap_tpu.body.skinning import (
                blend_joint_mats16, mats16_apply_points, mats16_rotate,
                skin_points_by_volume)
            if o.skinning_mode == "volume":
                live_v, pt_mats = skin_points_by_volume(
                    mesh.vertices, st.skin_wvol,
                    st.statics.cano_bounds, cano2live,
                    return_pt_mats=True, row_group=o.skin_row_group)
            else:
                lbs = approx_lbs_weights(mesh.vertices,
                                         st.statics.cano_smpl_vertices,
                                         st.statics.smpl_skinning_weights)
                pt_mats = blend_joint_mats16(lbs, cano2live)
                live_v = mats16_apply_points(pt_mats, mesh.vertices)
            live_n = mats16_rotate(pt_mats, mesh.normals)
            return CaptureMesh(live_v, live_n, mesh.num_tris, mesh.valid,
                               mesh.overflow), \
                pt_mats

        def recon_stage(st: CaptureState, recon_vars, front_normal,
                        back_normal, want_edge_ids: bool = False):
            """Fused normals -> occupancy volume -> mesh
            (reference main.py:435-445)."""
            g = grid_static._replace(**st.grid)
            statics = st.statics
            img = jnp.concatenate([front_normal, back_normal],
                                  axis=-1)[None]          # (1, H, W, 6)
            feat_map = recon_module.apply(recon_vars, img,
                                          method=ReconNetwork.get_feat_maps)
            # recon occupancy iso is 0.5; prior volume is in [-1, 1] ->
            # rescale prior to [0, 1] for a consistent surface crossing
            prior01 = 0.5 * (g.prior_volume + 1.0)
            if o.use_fused_query:
                from avatarcap_tpu.ops.pallas_query import recon_decode_fused
                if use_hier:
                    pf_cols = grid_pose_features(
                        feat_map, statics, g.vol_res, columns=True)

                    def vfr(pts, fidx):
                        pf = pf_cols[col_of(fidx)]
                        z = pts[:, 2] - statics.cano_smpl_center[2]
                        feats = jnp.concatenate([pf, z[:, None]], axis=-1)
                        return recon_decode_fused(st.packed_recon, feats)

                    vol, q_ovf = hierarchical_volume(
                        shard_value_fn(vfr), g, statics.cano_bounds,
                        0.5 * (g.c_prior + 1.0), prior01, 0.5,
                        o.hier_alpha,
                        o.recon_refine_capacity or o.refine_capacity)
                else:
                    # grid-structured pixel-aligned fetch + fused decoder
                    pf = grid_pose_features(feat_map, statics, g.vol_res,
                                            g.valid_idx)
                    z = (g.valid_pts[:, 2]
                         - statics.cano_smpl_center[2])
                    feats = jnp.concatenate([pf, z[:, None]], axis=-1)
                    ov = recon_decode_fused(st.packed_recon, feats)
                    vol = prior01.at[g.valid_idx].set(ov, mode="drop")
            elif use_hier:
                def vfr_xla(pts, fidx):
                    return recon_module.apply(
                        recon_vars, feat_map, pts[None],
                        statics.cano_smpl_center[None],
                        method=ReconNetwork.decode_points)[0]

                vol, q_ovf = hierarchical_volume(
                    shard_value_fn(vfr_xla), g, statics.cano_bounds,
                    0.5 * (g.c_prior + 1.0), prior01, 0.5,
                    o.hier_alpha,
                    o.recon_refine_capacity or o.refine_capacity)
            else:
                ov = recon_module.apply(
                    recon_vars, feat_map, g.valid_pts[None],
                    statics.cano_smpl_center[None],
                    method=ReconNetwork.decode_points)[0]
                vol = prior01.at[g.valid_idx].set(ov, mode="drop")
            mesh = _extract_mesh(vol, g, statics.cano_bounds,
                                 0.5, o.recon_max_tris or o.max_tris,
                                 o.recon_max_active or o.max_active,
                                 o.normal_mode,
                                 with_edge_ids=want_edge_ids
                                 and o.recon_unique_capacity > 0)
            if use_hier:
                mesh = mesh._replace(overflow=mesh.overflow | q_ovf)
            return mesh

        def _nerf_ray_colors_chunked(st: CaptureState, tex_vars, feat,
                                     frame: FrameInputs, v, n):
            """Integrate one color ray per row of (v, n) through the XLA
            query path, chunked like the reference's 2048-ray loop
            (reference main.py:469; see CaptureOptions.nerf_chunk)."""
            N = v.shape[0]
            chunk = min(o.nerf_chunk, N)
            pad = (-N) % chunk
            vp = jnp.pad(v, ((0, pad), (0, 0)))
            np_r = jnp.pad(n, ((0, pad), (0, 0)))
            C = (N + pad) // chunk

            def body(args):
                vv, nn = args
                depth = jnp.ones(vv.shape[:1], vv.dtype)[None]
                out, _ = render_rays(
                    avatar_module, tex_vars, (vv + nn)[None], -nn[None],
                    depth - 0.05, depth + 0.05, depth, feat, frame,
                    st.statics, n_samples=o.n_samples, pts_space="cano",
                    near_dist=0.02, far_dist=0.05)
                return out["rgb_map"][0]

            rgb = jax.lax.map(body, (vp.reshape(C, chunk, 3),
                                     np_r.reshape(C, chunk, 3)))
            return rgb.reshape(-1, 3)[:N]

        def _nerf_ray_colors_fused(st: CaptureState, packed_tex, feat,
                                   v, n):
            """Same ray integral through the fused Pallas warp+template
            kernel (it already evaluates rgb + density in one VMEM-
            resident pass), with reference masking semantics replicated
            outside the kernel. Compositing runs channel-separated on
            (rays, S) 2D arrays — a (rays, S, 4) raw tensor at capture
            scale would take a 32x-padded tiled layout.
            """
            from avatarcap_tpu.ops.grid_sample import (
                sample_feature_map_at_points)

            U = v.shape[0]
            S = o.n_samples
            near, far = 1.0 - 0.02, 1.0 + 0.05   # depth-guided band
            t = jnp.linspace(0.0, 1.0, S, dtype=v.dtype)
            z = near * (1.0 - t) + far * t                     # (S,)
            dz = jnp.concatenate([z[1:] - z[:-1],
                                  (z[-1] - z[-2])[None]])      # (S,)
            center = st.statics.cano_smpl_center
            feat_nchw = jnp.moveaxis(feat, -1, 1)
            ro = v + n
            rd = -n
            if o.nerf_feat_mode == "lerp":
                ends = jnp.concatenate([ro + rd * near, ro + rd * far])
                pf_ends = sample_feature_map_at_points(
                    feat_nchw, (ends - center)[None])[0]
                # bf16 like the geometry path's grid_pose_features: the
                # kernel consumes bf16 features anyway, and the lerp
                # materializes (chunk, S, C) — halving it is ~free
                pf_ends = pf_ends.astype(jnp.bfloat16)
                pf0, pf1 = pf_ends[:U], pf_ends[U:]            # (U, C)

            if o.nerf_feat_mode == "lerp" and o.near_flag_mode == "ray":
                # Whole integral inside the kernel: sample positions,
                # feature lerp, near/bounds masks and the compositing
                # recurrence never touch HBM (the chunked map below
                # moved ~4.6 GB/frame of (chunk*S, .) intermediates —
                # 2x the kernel's own time in DUS/data-formatting).
                danch = anchor_distances(
                    ro, rd, near, far, st.statics.cano_smpl_vertices,
                    n_anchors=o.near_flag_anchors)
                return ray_color_query_fused(
                    packed_tex["offset"], packed_tex["template"],
                    ro, rd, pf0, pf1, danch, st.statics.cano_bounds,
                    n_samples=S, near=near, far=far)

            chunk = min(o.nerf_chunk, U)
            pad = (-U) % chunk
            C_ = (U + pad) // chunk

            def pad0(a):
                return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1))

            def body(args):
                if o.nerf_feat_mode == "lerp":
                    roc, rdc, p0c, p1c = args
                else:
                    roc, rdc = args
                # samples, ray-major: (chunk*S, 3) built from 2D pieces
                pts = (roc[:, None, :]
                       + rdc[:, None, :] * z[None, :, None]).reshape(-1, 3)
                if o.nerf_feat_mode == "lerp":
                    w = ((z - near) / (far - near)).astype(p0c.dtype)
                    pf = (p0c[:, None, :] * (1.0 - w)[None, :, None]
                          + p1c[:, None, :] * w[None, :, None])
                    pf = pf.reshape(-1, p0c.shape[-1])
                else:
                    pf = sample_feature_map_at_points(
                        feat_nchw, (pts - center)[None])[0]
                out = warp_template_query_fused(
                    packed_tex["offset"], packed_tex["template"], pts, pf)
                # masking (reference arch_avatar.py:190-229): near flag
                # on the PRE-warp sample, bounds on the WARPED point
                if o.near_flag_mode == "ray":
                    near_ok = anchored_near_flags(
                        roc, rdc, near, far, S,
                        st.statics.cano_smpl_vertices,
                        n_anchors=o.near_flag_anchors).reshape(-1)
                elif o.near_flag_mode == "volume" \
                        and st.near_d_vol is not None:
                    from avatarcap_tpu.ops.knn import sample_distance_volume
                    d = sample_distance_volume(st.near_d_vol, pts,
                                               st.statics.cano_bounds)
                    near_ok = d < 0.08
                else:
                    d2, _ = knn(pts, st.statics.cano_smpl_vertices, k=1)
                    near_ok = d2[:, 0] < 0.08 * 0.08
                wpts = pts + out["offset"]
                inside = jnp.all(
                    (wpts > st.statics.cano_bounds[0])
                    & (wpts < st.statics.cano_bounds[1]), axis=-1)
                sigma = jnp.where(inside & near_ok, out["alpha"][:, 0], 0.0)
                alpha = 1.0 - jnp.exp(
                    -sigma.reshape(-1, S) * dz[None, :])       # (chunk, S)
                # exclusive transmittance (ops/volume_render.raw2outputs)
                trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
                trans = jnp.concatenate(
                    [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
                wts = alpha * trans
                rgb = out["rgb"].reshape(-1, S, 3)
                return jnp.einsum("rs,rsc->rc", wts, rgb)

            args = ((pad0(ro).reshape(C_, chunk, 3),
                     pad0(rd).reshape(C_, chunk, 3),
                     pad0(pf0).reshape(C_, chunk, -1),
                     pad0(pf1).reshape(C_, chunk, -1))
                    if o.nerf_feat_mode == "lerp" else
                    (pad0(ro).reshape(C_, chunk, 3),
                     pad0(rd).reshape(C_, chunk, 3)))
            rgb = jax.lax.map(body, args)
            return rgb.reshape(-1, 3)[:U]

        def nerf_color_stage(st: CaptureState, tex_vars, feat,
                             frame: FrameInputs, cano_mesh: CaptureMesh):
            """Vertex colors by integrating along -normal rays in cano
            space (reference main.py:464-478).

            With nerf_unique_capacity > 0 the soup is deduped to unique
            mesh vertices first (CaptureOptions.nerf_unique_capacity):
            one ray per volume-edge crossing instead of ~6 per-slot
            repeats, colors scattered back to every slot. Returns
            (colors (3*max_tris, 3), overflow (), uniq) where uniq is
            None on the per-slot path or (v_u (U, 3), rgb_u (U, 3),
            valid_u (U,)) — the unique vertex set the NN color transfer
            searches instead of the full padded soup.
            """
            v = cano_mesh.vertices
            n = cano_mesh.normals
            U = o.nerf_unique_capacity
            if not U or cano_mesh.edge_ids is None:
                rgb = _nerf_ray_colors_chunked(st, tex_vars, feat, frame,
                                               v, n)
                return rgb, jnp.zeros((), bool), None

            rep, uo, valid_v, valid_u, nerf_ovf = _dedupe_soup(
                cano_mesh.valid, cano_mesh.edge_ids, U)
            v_u = v[rep]
            n_u = n[rep]
            if o.use_fused_query:
                packed_tex = st.packed_tex or st.packed_query
                rgb_u = _nerf_ray_colors_fused(st, packed_tex, feat,
                                               v_u, n_u)
            else:
                rgb_u = _nerf_ray_colors_chunked(st, tex_vars, feat,
                                                 frame, v_u, n_u)
            rgb = rgb_u[uo]
            rgb = jnp.where(valid_v[:, None], rgb, 0.0)
            return rgb, nerf_ovf, (v_u, rgb_u, valid_u)

        def color_transfer_stage(st: CaptureState, tex_vars, feat, frame,
                                 recon_mesh: CaptureMesh, avatar_verts,
                                 avatar_colors, uniq):
            """Recon-mesh vertex colors (reference main.py:480-485).

            'nn' (parity): NN transfer from the avatar soup's integrated
            colors. With recon_unique_capacity > 0 and a deduped avatar
            color set available, the K=1 search runs unique-vs-unique
            (both sides deduped by volume-edge key) — ~30x fewer
            distance rows than soup-vs-soup, which the profile showed
            dominating the w_nerf frame (18.9 of 21.7 s).

            'direct': integrate the color ray AT each unique recon
            vertex through the fused kernel instead (see
            CaptureOptions.recon_color_mode). Returns (colors, ovf).
            """
            Ur = o.recon_unique_capacity
            if not Ur or uniq is None or recon_mesh.edge_ids is None:
                _, idx = knn(recon_mesh.vertices, avatar_verts, k=1)
                return avatar_colors[idx[:, 0]], jnp.zeros((), bool)
            rep_r, uo_r, valid_r, _, ovf_r = _dedupe_soup(
                recon_mesh.valid, recon_mesh.edge_ids, Ur)
            if o.recon_color_mode == "direct":
                v_r = recon_mesh.vertices[rep_r]
                n_r = recon_mesh.normals[rep_r]
                if o.use_fused_query:
                    packed_tex = st.packed_tex or st.packed_query
                    rgb_u = _nerf_ray_colors_fused(st, packed_tex, feat,
                                                   v_r, n_r)
                else:
                    rgb_u = _nerf_ray_colors_chunked(st, tex_vars, feat,
                                                     frame, v_r, n_r)
                # bgr->rgb exactly like the avatar soup path (ref :477)
                rgb_r = rgb_u[..., ::-1][uo_r]
                return jnp.where(valid_r[:, None], rgb_r, 0.0), ovf_r
            v_u, rgb_u, valid_u = uniq
            # bgr->rgb was applied to the scattered soup colors; apply
            # the same to the unique color rows we transfer from
            rgb_u = rgb_u[..., ::-1]
            q_u = recon_mesh.vertices[rep_r]
            # unused db capacity parks far away so it never wins the NN
            db = jnp.where(valid_u[:, None], v_u, 1e9)
            _, idx = knn(q_u, db, k=1, precision="high")
            rgb_r = rgb_u[idx[:, 0]][uo_r]
            return jnp.where(valid_r[:, None], rgb_r, 0.0), ovf_r

        def frame_body(st: CaptureState, avatar_vars, recon_vars, tex_vars,
                       frame: FrameInputs, jnt_mats, inferred_normal, w2c,
                       proj, fx, fy, cx, cy, neck_xy,
                       w_recon: bool = True, w_nerf: bool = False):
            """The full per-frame pipeline as one traceable function.

            Pure in its arguments (st carries every per-subject array),
            so it is jitted whole for production frames, vmapped over a
            frame axis by pipeline/streaming.py, and shared by the
            per-stage profiled path.
            """
            cano_mesh, feat = avatar_geometry_stage(
                st, avatar_vars, frame, want_edge_ids=w_nerf)
            live_mesh, pt_mats = skinning_stage(st, cano_mesh, jnt_mats)
            if w_recon:
                # lift image normals BEFORE the cano layers so their
                # interpolation folds into the shared wide-table gather
                # (2 passes instead of 4 — see cano_layers_stage)
                img_h, img_w = inferred_normal.shape[:2]
                proj_n_tris, lift_ovf = lift_image_normals(
                    live_mesh.vertices.reshape(-1, 3, 3), cano_mesh.valid,
                    inferred_normal, pt_mats, w2c, proj,
                    fx, fy, cx, cy, img_h, img_w, window=o.cano_window,
                    big_tris=o.live_big_tris,
                    max_candidates=o.raster_max_candidates,
                    with_overflow=True)
                (fri, bri, front_avatar_n, back_avatar_n, phong,
                 front_img_n, back_img_n) = cano_layers_stage(
                    cano_mesh, extra_tri_attrs=proj_n_tris)
            else:
                (fri, bri, front_avatar_n, back_avatar_n,
                 phong) = cano_layers_stage(cano_mesh)
            # one aggregate dropped-work flag for the whole frame: any
            # static capacity hit (query refine, MC tris/active cubes,
            # raster candidates, big-triangle slots) anywhere in the
            # program — production monitoring needs exactly one bit
            overflow = cano_mesh.overflow | fri.overflow | bri.overflow
            results = {
                "cano_mesh": cano_mesh,
                "live_mesh": live_mesh,
                "cano_phong": phong,
                "front_avatar_normal": front_avatar_n,
                "back_avatar_normal": back_avatar_n,
            }
            if w_recon:
                overflow = overflow | lift_ovf
                if o.integrate_manner == "merge":
                    front_merged = merge_normal_images(
                        front_avatar_n, front_img_n, neck_xy,
                        iter_num=o.fusion_iters)
                else:
                    front_merged = merge_normal_images_cover(
                        front_avatar_n, front_img_n)
                back_merged = back_avatar_n      # reference main.py:430
                recon_mesh = recon_stage(st, recon_vars, front_merged,
                                         back_merged,
                                         want_edge_ids=w_nerf)
                live_recon, _ = skinning_stage(st, recon_mesh, jnt_mats)
                overflow = overflow | recon_mesh.overflow
                results.update({
                    "front_merged_normal": front_merged,
                    "front_image_normal": front_img_n,
                    "recon_mesh": recon_mesh,
                    "live_recon_mesh": live_recon,
                })
            if w_nerf:
                colors, nerf_ovf, uniq = nerf_color_stage(
                    st, tex_vars, feat, frame, cano_mesh)
                overflow = overflow | nerf_ovf
                # bgr->rgb (ref :477)
                results["avatar_colors"] = colors[..., ::-1]
                if w_recon:
                    recon_colors, xfer_ovf = color_transfer_stage(
                        st, tex_vars, feat, frame,
                        results["recon_mesh"], cano_mesh.vertices,
                        results["avatar_colors"], uniq)
                    results["recon_colors"] = recon_colors
                    overflow = overflow | xfer_ovf
            results["overflow"] = overflow
            return results

        # The staged path jits each stage separately (per-stage timing);
        # the fused frame jits frame_body whole — one dispatch, XLA
        # overlaps stages. Both call the SAME plain stage functions.
        self._avatar_geometry = jax.jit(
            avatar_geometry_stage, static_argnames=("want_edge_ids",))
        self._cano_layers = jax.jit(cano_layers_stage)
        self._lift_normals = jax.jit(lift_normals_stage)
        self._skinning = jax.jit(skinning_stage)
        self._recon_stage = jax.jit(recon_stage,
                                    static_argnames=("want_edge_ids",))
        self._nerf_color = jax.jit(nerf_color_stage)
        self._color_transfer = jax.jit(color_transfer_stage)
        self.frame_body = frame_body
        self._frame_fused = jax.jit(
            frame_body, static_argnames=("w_recon", "w_nerf"))

    # ------------------------------------------------------------------

    def _neck_xy(self, neck_vertex_idx: int):
        neck_v = np.asarray(
            self.statics.cano_smpl_vertices[neck_vertex_idx]) \
            - np.asarray(self.statics.cano_smpl_center)
        neck_y = int((1.0 - neck_v[1]) / 2.0 * self.opt.render_res)
        neck_x = int((neck_v[0] - 1.0) / 2.0 * self.opt.render_res) \
            % self.opt.render_res
        return jnp.asarray([neck_x, neck_y], jnp.int32)

    def process_frame(self, item: Dict[str, Any], w_recon: bool = True,
                      w_nerf: bool = False,
                      inferred_normal: Optional[np.ndarray] = None,
                      neck_vertex_idx: Optional[int] = None,
                      camera: Optional[Dict[str, float]] = None,
                      timer=None) -> Dict[str, Any]:
        """Run the capture stages for one dataset item (test mode).

        Returns a dict with canonical/live avatar meshes, renders, fused
        normals, and (if w_recon) the final reconstructed live mesh.

        Args:
          timer: optional ``utils.timers.StageTimer``; when given, each
            stage is force-synced and its wall seconds recorded (the
            reference has no stage attribution at all, SURVEY §5).
        """
        from avatarcap_tpu.utils.timers import StageTimer
        o = self.opt
        frame = FrameInputs(
            live_smpl_v=jnp.asarray(item["live_smpl_v"])[None],
            cano2live_jnt_mats=jnp.asarray(item["cano2live_jnt_mats"])[None],
            smpl_pos_map=jnp.asarray(item["smpl_pos_map"])[None])

        if timer is None and w_recon:
            # production path: one fused dispatch (see frame_body)
            assert self.recon is not None and inferred_normal is not None
            img_h, img_w = inferred_normal.shape[:2]
            cam = camera
            fx, fy, cx, cy = (cam["fx"], cam["fy"], cam["cx"], cam["cy"])
            proj = gl_perspective_projection_matrix(fx, fy, cx, cy,
                                                    img_w, img_h,
                                                    gl_space=False)
            return self._frame_fused(
                self.state, self.avatar_vars, self.recon_vars,
                self.avatar_tex_vars, frame,
                jnp.asarray(item["cano2live_jnt_mats"]),
                jnp.asarray(inferred_normal), jnp.asarray(item["w2c_RT"]),
                jnp.asarray(proj), fx, fy, cx, cy,
                self._neck_xy(neck_vertex_idx),
                w_recon=True, w_nerf=w_nerf)

        # Stage 1: avatar geometry
        with StageTimer.maybe(timer, "1_grid_query_mc"):
            cano_mesh, feat = self._avatar_geometry(
                self.state, self.avatar_vars, frame, want_edge_ids=w_nerf)
            if timer:
                timer.observe((cano_mesh, feat))
        with StageTimer.maybe(timer, "1_cano_renders"):
            (fri, bri, front_avatar_n, back_avatar_n,
             cano_phong) = self._cano_layers(cano_mesh)
            if timer:
                timer.observe((front_avatar_n, back_avatar_n, cano_phong))
        with StageTimer.maybe(timer, "1_skinning"):
            live_mesh, pt_mats = self._skinning(
                self.state, cano_mesh,
                jnp.asarray(item["cano2live_jnt_mats"]))
            if timer:
                timer.observe((live_mesh, pt_mats))

        overflow = cano_mesh.overflow | fri.overflow | bri.overflow
        results = {
            "cano_mesh": cano_mesh,
            "live_mesh": live_mesh,
            "cano_phong": cano_phong,
            "front_avatar_normal": front_avatar_n,
            "back_avatar_normal": back_avatar_n,
        }

        if w_recon:
            assert self.recon is not None and inferred_normal is not None
            img_h, img_w = inferred_normal.shape[:2]
            cam = camera
            fx, fy, cx, cy = (cam["fx"], cam["fy"], cam["cx"], cam["cy"])
            proj = gl_perspective_projection_matrix(fx, fy, cx, cy,
                                                    img_w, img_h,
                                                    gl_space=False)
            # Stage 2: normal fusion (reuses the cano index passes)
            with StageTimer.maybe(timer, "2_canonicalize_normals"):
                front_img_n, back_img_n, lift_ovf = self._lift_normals(
                    fri, bri, live_mesh, cano_mesh.valid,
                    jnp.asarray(inferred_normal), pt_mats,
                    jnp.asarray(item["w2c_RT"]), jnp.asarray(proj),
                    fx, fy, cx, cy)
                overflow = overflow | lift_ovf
                if timer:
                    timer.observe((front_img_n, back_img_n))

            with StageTimer.maybe(timer, "2_merge_normals"):
                if o.integrate_manner == "merge":
                    # neck position on the canonical image (ref :420-422)
                    front_merged = merge_normal_images(
                        front_avatar_n, front_img_n,
                        self._neck_xy(neck_vertex_idx),
                        iter_num=o.fusion_iters)
                else:
                    front_merged = merge_normal_images_cover(front_avatar_n,
                                                             front_img_n)
                back_merged = back_avatar_n  # reference main.py:430
                if timer:
                    timer.observe(front_merged)

            # Stage 3: ReconNet
            with StageTimer.maybe(timer, "3_recon_query_mc"):
                recon_mesh = self._recon_stage(self.state, self.recon_vars,
                                               front_merged, back_merged,
                                               want_edge_ids=w_nerf)
                if timer:
                    timer.observe(recon_mesh)
            with StageTimer.maybe(timer, "3_recon_skinning"):
                live_recon, _ = self._skinning(
                    self.state, recon_mesh,
                    jnp.asarray(item["cano2live_jnt_mats"]))
                if timer:
                    timer.observe(live_recon)
            overflow = overflow | recon_mesh.overflow
            results.update({
                "front_merged_normal": front_merged,
                "front_image_normal": front_img_n,
                "recon_mesh": recon_mesh,
                "live_recon_mesh": live_recon,
            })

        if w_nerf:
            with StageTimer.maybe(timer, "4_nerf_colors"):
                colors, nerf_ovf, uniq = self._nerf_color(
                    self.state, self.avatar_tex_vars, feat, frame,
                    cano_mesh)
                overflow = overflow | nerf_ovf
                # bgr->rgb (ref :477)
                results["avatar_colors"] = colors[..., ::-1]
                if timer:
                    timer.observe(results["avatar_colors"])
            if w_recon:
                with StageTimer.maybe(timer, "4_color_transfer"):
                    recon_colors, xfer_ovf = self._color_transfer(
                        self.state, self.avatar_tex_vars, feat, frame,
                        results["recon_mesh"], cano_mesh.vertices,
                        results["avatar_colors"], uniq)
                    results["recon_colors"] = recon_colors
                    overflow = overflow | xfer_ovf
                    if timer:
                        timer.observe(recon_colors)

        results["overflow"] = overflow
        return results

    def render_live(self, live_mesh: CaptureMesh, front_mv, back_mv,
                    colors=None):
        """Perspective phong preview (reference main.py:397-403)."""
        proj = gl_perspective_projection_matrix(5000, 5000, 256, 256,
                                                512, 512, gl_space=True)
        color_tris = None if colors is None else colors.reshape(-1, 3, 3)
        return render_live_mesh(
            live_mesh.vertices.reshape(-1, 3, 3),
            live_mesh.normals.reshape(-1, 3, 3), live_mesh.valid,
            front_mv, back_mv, proj, real2gl_matrix(),
            res=self.opt.render_res, window=self.opt.raster_window,
            color_tris=color_tris)
