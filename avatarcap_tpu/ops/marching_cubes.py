"""Device-side isosurface extraction (marching tetrahedra), static shapes.

Replaces the reference's CPU skimage marching_cubes round-trip
(reference utils/recon_util.py:51-70, called per frame at main.py:367,444 —
one of the host<->device crossings the TPU rebuild eliminates).

Design for XLA:
- Marching *tetrahedra*: each cube splits into 6 tets sharing the main
  diagonal; per-tet case tables (6 x 16 x up-to-2 triangles) are derived
  programmatically at import time with orientation fixed so triangle
  normals point toward the lower-valued (outside) side — no hand-typed
  256-entry LUTs.
- Static output: a two-pass count/prefix-sum emits into a fixed-capacity
  vertex buffer with a validity count; downstream stages (skinning,
  rasterization) tolerate padded vertices.
- Vertex coordinate convention matches the reference:
  world = index * voxel_size + bounds_min + 0.5 * voxel_size
  (reference utils/recon_util.py:62-65).

Topology differs from skimage's Lewiner MC (more, smaller triangles) but
the surface is identical up to linear interpolation — Chamfer-level parity,
which is the judged metric (SURVEY §4).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

# Cube corner offsets, indexed 0..7 (x, y, z).
_CUBE_CORNERS = np.array([
    [0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0],
    [0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1],
], np.int32)

# 6-tetrahedra decomposition sharing the main diagonal c0-c6.
_TETS = np.array([
    [0, 1, 2, 6],
    [0, 2, 3, 6],
    [0, 3, 7, 6],
    [0, 7, 4, 6],
    [0, 4, 5, 6],
    [0, 5, 1, 6],
], np.int32)


def _build_tet_tables():
    """Per-(tet, case) triangle tables.

    Returns:
      ntris: (6, 16) int32 triangle counts.
      edges: (6, 16, 2, 3, 2) int32 — cube-corner index pairs per triangle
        vertex (edge endpoints), -1 padded.
    """
    ntris = np.zeros((6, 16), np.int32)
    edges = np.full((6, 16, 2, 3, 2), -1, np.int32)
    corner_pos = _CUBE_CORNERS.astype(np.float64)

    def orient(tri_pts, away_from):
        a, b, c = tri_pts
        n = np.cross(b - a, c - a)
        centroid = (a + b + c) / 3.0
        return np.dot(n, centroid - away_from) >= 0

    for t in range(6):
        tet = _TETS[t]
        pos = corner_pos[tet]  # (4, 3) tet corner positions
        for case in range(16):
            inside = [i for i in range(4) if case & (1 << i)]
            outside = [i for i in range(4) if not case & (1 << i)]
            tris = []  # list of 3 edges, each edge = (tet-local a, b)
            if len(inside) == 1:
                a = inside[0]
                es = [(a, x) for x in outside]
                mids = [(pos[e[0]] + pos[e[1]]) / 2 for e in es]
                # normal should point AWAY from the inside corner
                if not orient(mids, pos[a]):
                    es = [es[0], es[2], es[1]]
                tris.append(es)
            elif len(inside) == 2:
                a, b = inside
                c, d = outside
                quad = [(a, c), (a, d), (b, d), (b, c)]
                mids = [(pos[e0] + pos[e1]) / 2 for e0, e1 in quad]
                mid_in = (pos[a] + pos[b]) / 2
                t1 = [quad[0], quad[1], quad[2]]
                if not orient([mids[0], mids[1], mids[2]], mid_in):
                    t1 = [quad[0], quad[2], quad[1]]
                    t2 = [quad[0], quad[3], quad[2]]
                else:
                    t2 = [quad[0], quad[2], quad[3]]
                tris.append(t1)
                tris.append(t2)
            elif len(inside) == 3:
                a = outside[0]
                es = [(x, a) for x in inside]
                mids = [(pos[e[0]] + pos[e[1]]) / 2 for e in es]
                # normal should point TOWARD the single outside corner
                if orient(mids, pos[a]):
                    es = [es[0], es[2], es[1]]
                tris.append(es)
            ntris[t, case] = len(tris)
            for k, tri in enumerate(tris):
                for v, (e0, e1) in enumerate(tri):
                    edges[t, case, k, v, 0] = tet[e0]
                    edges[t, case, k, v, 1] = tet[e1]
    return ntris, edges


_NTRIS_TABLE, _EDGES_TABLE = _build_tet_tables()
MAX_TRIS_PER_CUBE = 12  # 6 tets x up to 2


class Mesh(NamedTuple):
    """Fixed-capacity triangle soup. faces are implicit: triangle i uses
    vertices (3i, 3i+1, 3i+2). ``num_tris`` counts the valid prefix."""

    vertices: jnp.ndarray   # (max_tris * 3, 3) f32; padded entries = pad_value
    num_tris: jnp.ndarray   # () int32
    overflow: jnp.ndarray   # () bool — true if max_tris was exceeded
    normals: jnp.ndarray = None  # (max_tris * 3, 3) unit, when requested


def _corner_values(volume: jnp.ndarray) -> jnp.ndarray:
    """(X, Y, Z) -> (X-1, Y-1, Z-1, 8) cube corner values."""
    vals = []
    for dx, dy, dz in _CUBE_CORNERS:
        vals.append(jax.lax.slice(
            volume, (dx, dy, dz),
            (volume.shape[0] - 1 + dx, volume.shape[1] - 1 + dy,
             volume.shape[2] - 1 + dz)))
    return jnp.stack(vals, axis=-1)


@functools.partial(jax.jit, static_argnames=("max_tris", "max_active"))
def marching_tets(volume: jnp.ndarray, iso: float,
                  bounds_min: jnp.ndarray, voxel_size: jnp.ndarray,
                  max_tris: int = 1 << 20,
                  max_active: int = 1 << 18,
                  pad_value: float = 0.0,
                  normal_volume: jnp.ndarray = None) -> Mesh:
    """Extract the iso-surface of a dense scalar volume.

    Args:
      volume: (X, Y, Z) values; "inside" is value > iso (inside-positive
        SDF / occupancy, matching the reference conventions).
      iso: iso level (0 for sdf, 0.5 for occupancy, reference config.py:16-22).
      bounds_min: (3,) world min corner.
      voxel_size: (3,) world voxel size (bounds_len / resolution).
      max_tris: static output triangle capacity.
      max_active: static capacity of surface-crossing cubes
        (cubes whose 8 corners straddle iso). ~O(surface area / voxel^2).
      normal_volume: optional (X, Y, Z, 3) gradient volume (e.g. Sobel,
        ops/sobel.extract_normal_volume). When given, Mesh.normals carries
        OUTWARD unit normals obtained by interpolating the two edge-node
        gradients of each emitted vertex — node gradients are gathered for
        the ~max_active active cubes only (8 rows/cube), vs a full
        trilinear resample at 3*max_tris scattered points
        (reference utils/recon_util.py:32-48), which is ~10x the gather
        traffic for sub-voxel-identical directions.
    """
    X, Y, Z = volume.shape
    nx, ny, nz = X - 1, Y - 1, Z - 1
    n_cubes = nx * ny * nz

    # Active mask straight from 2x2x2 window extrema — avoids materializing
    # the (N, 8) corner tensor for all 18.6M cubes (~600 MB of traffic).
    max8 = jax.lax.reduce_window(volume, -jnp.inf, jax.lax.max,
                                 (2, 2, 2), (1, 1, 1), "valid")
    min8 = -jax.lax.reduce_window(-volume, -jnp.inf, jax.lax.max,
                                  (2, 2, 2), (1, 1, 1), "valid")
    is_active = ((max8 > iso) & ~(min8 > iso)).reshape(-1)

    # Pass 1: compact active cube ids (hierarchical popcount compaction —
    # scatters and full-length searchsorted both cost 100+ ms at 18.6M).
    from avatarcap_tpu.ops.compaction import compact_mask_indices
    active_ids, n_active, active_valid = compact_mask_indices(
        is_active, max_active)
    active_ids = jax.lax.optimization_barrier(active_ids)

    # Gather the 8 corner values for ACTIVE cubes only (8 scalar gathers of
    # max_active elements from the flat volume).
    aid0 = active_ids
    aix = aid0 // (ny * nz)
    aiy = (aid0 // nz) % ny
    aiz = aid0 % nz
    vol_flat = volume.reshape(-1)
    corner_cols = []
    for dx, dy, dz in _CUBE_CORNERS:
        flat = ((aix + dx) * Y + (aiy + dy)) * Z + (aiz + dz)
        corner_cols.append(vol_flat[flat])
    av = jnp.stack(corner_cols, axis=-1)               # (A, 8)
    av, active_ids = jax.lax.optimization_barrier((av, active_ids))
    a_inside = (av > iso).astype(jnp.int32)            # (A, 8)

    # Per-tet case index: bit i = corner i of the tet inside.
    # _TETS is static numpy, so these are compile-time column picks.
    cases = jnp.zeros((max_active, 6), jnp.int32)
    for i in range(4):
        cases = cases + (a_inside[:, _TETS[:, i]] << i)

    # Table lookup as one-hot matmul: TPU-friendly (tiny gathers with
    # unaligned trailing dims are pathologically slow on TPU).
    cases_1h = jax.nn.one_hot(cases, 16, dtype=av.dtype)  # (A, 6, 16)
    ntris_table = jnp.asarray(_NTRIS_TABLE, av.dtype)     # (6, 16)
    tcounts = jnp.einsum("atc,tc->at", cases_1h, ntris_table).astype(jnp.int32)
    tcounts = jnp.where(active_valid[:, None], tcounts, 0)

    # Triangle bookkeeping: per-cube totals -> cumulative sums (A-long —
    # a 262k binary search instead of one over all A*6 slots).
    cube_counts = tcounts.sum(axis=1)                   # (A,) 0..12
    cube_cum = jnp.cumsum(cube_counts)
    total_tris = cube_cum[-1]
    overflow = total_tris > max_tris

    # Per-output-triangle emission: triangle j's source cube comes from a
    # scatter of each cube's id at its first output slot followed by an
    # inclusive max-scan — two linear passes over max_tris, vs a binary
    # search (searchsorted) whose log2(A) dependent gather rounds are
    # latency-bound at millions of triangles.
    tri_j = jnp.arange(max_tris, dtype=jnp.int32)
    cube_start = cube_cum - cube_counts                 # (A,)
    start_slot = jnp.where((cube_counts > 0) & (cube_start < max_tris),
                           cube_start, max_tris)
    # Per-output-triangle source data rides ONE scatter + forward-fill:
    # every per-cube quantity the emission needs (output start, packed
    # per-tet prefix, packed cases, packed base ijk, the 8 corner values
    # bitcast to int32, and optionally the 8 corner gradients packed as
    # bf16 pairs) is seeded at the cube's first output slot and carried
    # down by a log-step fill keyed on cube rank. Random row gathers at
    # max_tris indices (the alternative) run at ~25M gathered elem/s on
    # v5e — ~300 ms for av/cases/ids at 1M triangles — while the fill is
    # bandwidth-bound (~5 ms/channel).
    from avatarcap_tpu.ops.compaction import prefix_fill_max
    pref_c = jnp.cumsum(tcounts, axis=1)                # (A, 6)
    pref_packed = jnp.sum(pref_c << (4 * jnp.arange(6, dtype=jnp.int32))
                          [None, :], axis=1).astype(jnp.int32)
    cases_packed = jnp.sum(cases << (4 * jnp.arange(6, dtype=jnp.int32))
                           [None, :], axis=1).astype(jnp.int32)
    base_packed = (aix << 20) | (aiy << 10) | aiz       # 10 bits each
    A_cap = cube_cum.shape[0]
    carry_cols = [jnp.arange(A_cap, dtype=jnp.int32), cube_start,
                  pref_packed, cases_packed, base_packed]
    carry_cols += [jax.lax.bitcast_convert_type(av[:, i], jnp.int32)
                   for i in range(8)]

    if normal_volume is not None:
        # corner gradients for ACTIVE cubes, packed 2 bf16 per int32
        nv_flat = normal_volume.reshape(-1, 3)
        grad_cols = []
        for dx, dy, dz in _CUBE_CORNERS:
            flat = ((aix + dx) * Y + (aiy + dy)) * Z + (aiz + dz)
            grad_cols.append(nv_flat[flat])
        gv = jnp.stack(grad_cols, axis=1).reshape(A_cap, 24)   # (A, 24)
        gv16 = jax.lax.bitcast_convert_type(
            gv.astype(jnp.bfloat16), jnp.uint16).astype(jnp.int32)
        carry_cols += [(gv16[:, 2 * i] | (gv16[:, 2 * i + 1] << 16))
                       for i in range(12)]

    seed = jnp.full((max_tris + 1, len(carry_cols)),
                    jnp.iinfo(jnp.int32).min, jnp.int32).at[start_slot].max(
        jnp.stack(carry_cols, axis=-1), mode="drop")[:max_tris]
    filled = prefix_fill_max(seed)
    r = tri_j - jnp.maximum(filled[:, 1], 0)            # 0..11
    pp = filled[:, 2]
    pref = jnp.stack([(pp >> (4 * i)) & 15 for i in range(6)], axis=-1)
    tet_of = jnp.sum((r[:, None] >= pref).astype(jnp.int32), axis=1)
    tet_of = jnp.minimum(tet_of, 5)
    prev = jnp.where(tet_of > 0,
                     jnp.take_along_axis(pref,
                                         jnp.maximum(tet_of - 1, 0)[:, None],
                                         axis=1)[:, 0], 0)
    k_of = jnp.clip(r - prev, 0, 1)

    av_t = jax.lax.bitcast_convert_type(filled[:, 5:13], jnp.float32)
    case_t = (filled[:, 3] >> (4 * tet_of)) & 15        # (T,)
    bp = filled[:, 4]
    base_t = jnp.stack([(bp >> 20) & 1023, (bp >> 10) & 1023,
                        bp & 1023], axis=-1).astype(volume.dtype)

    # Static edge tables flattened over (tet, k, case) -> 192 combos of
    # (3 verts x 8 corners) one-hot endpoint selectors.
    sel_a = np.zeros((6, 2, 16, 3, 8), np.float32)
    sel_b = np.zeros((6, 2, 16, 3, 8), np.float32)
    for t in range(6):
        for k in range(2):
            for c16 in range(16):
                for v3 in range(3):
                    e0, e1 = _EDGES_TABLE[t, c16, k, v3]
                    sel_a[t, k, c16, v3, max(int(e0), 0)] = 1.0
                    sel_b[t, k, c16, v3, max(int(e1), 0)] = 1.0
    sel_a192 = jnp.asarray(sel_a.reshape(192, 24))
    sel_b192 = jnp.asarray(sel_b.reshape(192, 24))
    combo = (tet_of * 2 + k_of) * 16 + case_t           # (T,)
    oh = jax.nn.one_hot(combo, 192, dtype=volume.dtype)  # (T, 192)
    sa = jnp.matmul(oh, sel_a192).reshape(-1, 3, 8)     # (T, 3, 8)
    sb = jnp.matmul(oh, sel_b192).reshape(-1, 3, 8)

    corner_off = jnp.asarray(_CUBE_CORNERS, volume.dtype)  # (8, 3)
    va = jnp.einsum("tvh,th->tv", sa, av_t)             # (T, 3)
    vb = jnp.einsum("tvh,th->tv", sb, av_t)
    pa = jnp.einsum("tvh,hx->tvx", sa, corner_off)      # (T, 3, 3)
    pb = jnp.einsum("tvh,hx->tvx", sb, corner_off)
    denom = vb - va
    tt = (iso - va) / jnp.where(jnp.abs(denom) < 1e-12, 1.0, denom)
    tt = jnp.clip(tt, 0.0, 1.0)
    p = base_t[:, None, :] + pa + (pb - pa) * tt[..., None]
    world = p * voxel_size + bounds_min + 0.5 * voxel_size  # (T, 3, 3)
    tri_valid = tri_j < total_tris
    verts_out = jnp.where(tri_valid[:, None, None], world, pad_value)

    normals_out = None
    if normal_volume is not None:
        # unpack the carried bf16 corner-gradient pairs: (T, 12) i32 ->
        # (T, 24) bf16 -> (T, 8, 3) f32 (bf16 direction error disappears
        # in the final normalization)
        g32 = filled[:, 13:25]
        lo = jax.lax.bitcast_convert_type(
            (g32 & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
        hi = jax.lax.bitcast_convert_type(
            ((g32 >> 16) & 0xFFFF).astype(jnp.uint16), jnp.bfloat16)
        gv_t = jnp.stack([lo, hi], axis=-1).reshape(-1, 8, 3) \
            .astype(jnp.float32)                        # (T, 8, 3)
        na = jnp.einsum("tvh,thx->tvx", sa, gv_t)       # (T, 3, 3)
        nb = jnp.einsum("tvh,thx->tvx", sb, gv_t)
        n = na + (nb - na) * tt[..., None]
        n = -n / jnp.maximum(
            jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-12)
        n = jnp.where(tri_valid[:, None, None], n, 0.0)
        normals_out = n.reshape(max_tris * 3, 3)

    return Mesh(vertices=verts_out.reshape(max_tris * 3, 3),
                num_tris=jnp.minimum(total_tris, max_tris).astype(jnp.int32),
                overflow=overflow, normals=normals_out)


def mesh_grid_coords(vertices: jnp.ndarray, bounds: jnp.ndarray) -> jnp.ndarray:
    """World vertices -> [-1, 1] normalized volume coords (x, y, z)
    (reference utils/recon_util.py:66)."""
    return 2.0 * (vertices - bounds[0]) / (bounds[1] - bounds[0]) - 1.0
