"""Adversarial thin-feature regressions for the hierarchical grid query.

VERDICT r2 item 3: `pipeline/capture.py` documents that sub-coarse-voxel
features sharper than the alpha margin can be missed by the coarse-to-fine
activation test. These tests pin that boundary at the full capture
resolution (384x384x128) with analytic fields:

- features >= one coarse cell (2 fine voxels) — a 2-voxel slab at 45°, a
  finger-scale tube, a 2-voxel ridge — must produce EXACTLY the same
  iso-crossing cells as the brute-force query at the default
  hier_alpha=1.0 (refined nodes are evaluated exactly, so any difference
  means the activation heuristic dropped surface);
- a 1-fine-voxel ridge threaded BETWEEN coarse nodes is invisible to any
  corner-based activation test: the test asserts the miss happens (the
  documented failure boundary) and that the brute-force path
  (hierarchical_query=False semantics) captures it, so a future change
  that silently loosens/breaks the activation logic fails loudly here.
"""

import numpy as np
import jax.numpy as jnp
import pytest


def _make_full_grid(vol_res, lo, hi):
    """CaptureGrid whose valid band is the whole volume + its hierarchy."""
    from avatarcap_tpu.pipeline.capture import (CaptureGrid,
                                                build_grid_hierarchy)
    X, Y, Z = vol_res
    n = X * Y * Z
    idx = jnp.arange(n, dtype=jnp.int32)
    # valid_pts unused by hierarchical_volume (it builds refine points
    # itself); keep a placeholder to satisfy the NamedTuple.
    grid = CaptureGrid(valid_pts=jnp.zeros((1, 3)), valid_idx=idx,
                       prior_volume=jnp.full((n,), 1.0, jnp.float32),
                       vol_res=tuple(vol_res))
    bounds = jnp.asarray(np.stack([lo, hi]).astype(np.float32))
    return build_grid_hierarchy(grid, bounds), bounds


def _grid_points(vol_res, lo, hi):
    X, Y, Z = vol_res
    lin = [np.linspace(0.0, 1.0, r, dtype=np.float32) for r in vol_res]
    g = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    return g * (hi - lo) + lo


def _crossing_cells(vol, vol_res, iso=0.0):
    """Bool mask over the (X-1, Y-1, Z-1) cell lattice: cell marked when
    its low-corner edge along any axis crosses iso (a deterministic
    representative-edge signature; identical volumes -> identical masks,
    and a surface dropped by the hierarchy flips its cells' signatures)."""
    v = np.asarray(vol).reshape(vol_res) - iso
    out = np.zeros(tuple(d - 1 for d in vol_res), bool)
    s = np.sign(v)
    for ax in range(3):
        sl_a = [slice(0, d - 1) for d in vol_res]
        sl_b = [slice(0, d - 1) for d in vol_res]
        sl_b[ax] = slice(1, vol_res[ax])
        out |= s[tuple(sl_a)] * s[tuple(sl_b)] < 0
    return out


def _run_case(field_np, vol_res, lo, hi, alpha=1.0, clip=None):
    """Returns (hier_vol, brute_vol, q_overflow) for an analytic field."""
    from avatarcap_tpu.pipeline.capture import hierarchical_volume

    grid, bounds = _make_full_grid(vol_res, lo, hi)
    pts_all = _grid_points(vol_res, lo, hi)
    brute = field_np(pts_all).astype(np.float32)
    if clip is not None:
        brute = np.clip(brute, -clip, clip)

    def value_fn(pts, fidx):
        v = field_np(np.asarray(pts))
        if clip is not None:
            v = np.clip(v, -clip, clip)
        return jnp.asarray(v.astype(np.float32))

    # priors never matter here (the valid band covers the whole volume,
    # so every node is either queried or upsampled); fill with the
    # outside value.
    fill = clip if clip else 1.0
    c_prior = jnp.full((int(np.prod(grid.c_res)),), fill, jnp.float32)
    prior = jnp.full((int(np.prod(vol_res)),), fill, jnp.float32)
    vol, ovf = hierarchical_volume(
        value_fn, grid, bounds, c_prior, prior, 0.0, alpha,
        refine_capacity=(1 << 20) + (1 << 19))
    return np.asarray(vol), brute, bool(ovf)


FULL_RES = (384, 384, 128)
LO = np.array([-0.5, -1.0, -0.25], np.float32)
HI = np.array([0.5, 1.0, 0.25], np.float32)
# fine voxel sizes: ~2.6 mm x, ~5.2 mm y, ~3.9 mm z


@pytest.mark.slow
def test_hier_slab_45deg_two_voxel():
    """Thin slab at 45° in xz, thickness ~2 fine x-voxels: every crossing
    cell of the brute-force query must survive hierarchy at alpha=1."""
    vx = (HI[0] - LO[0]) / (FULL_RES[0] - 1)
    t = 2.0 * vx

    def field(p):
        d = np.abs((p[:, 0] + p[:, 2]) / np.sqrt(2.0))
        return (d - 0.5 * t).astype(np.float32)  # slab through origin

    vol, brute, ovf = _run_case(field, FULL_RES, LO, HI, clip=0.05)
    assert not ovf
    ch = _crossing_cells(vol, FULL_RES)
    cb = _crossing_cells(brute, FULL_RES)
    missed = cb & ~ch
    assert missed.sum() == 0, f"hier dropped {missed.sum()} surface cells"
    spurious = ch & ~cb
    assert spurious.sum() == 0


@pytest.mark.slow
def test_hier_tube_finger_scale():
    """A finger: 8 mm-radius tube along y (≈3 voxels across) plus the
    body slab it attaches to; exact crossing parity required."""
    def field(p):
        d_tube = np.sqrt(p[:, 0] ** 2 + p[:, 2] ** 2) - 0.008
        d_body = p[:, 1] - 0.5        # half-space "palm" at y=0.5
        return np.minimum(d_tube, d_body).astype(np.float32)

    vol, brute, ovf = _run_case(field, FULL_RES, LO, HI, clip=0.05)
    assert not ovf
    ch = _crossing_cells(vol, FULL_RES)
    cb = _crossing_cells(brute, FULL_RES)
    assert (cb & ~ch).sum() == 0
    assert (ch & ~cb).sum() == 0


@pytest.mark.slow
def test_hier_one_voxel_ridge_is_the_documented_boundary():
    """A ridge ONE fine voxel wide, centered between coarse nodes, is
    invisible to the corner-range activation (documented in
    CaptureOptions.hierarchical_query); brute force sees it. If a future
    change makes the hierarchy capture it, or makes it miss >=2-voxel
    features, this test fails and the docs/defaults must move."""
    X = FULL_RES[0]
    vx = (HI[0] - LO[0]) / (X - 1)
    # odd fine index = midway between coarse nodes (coarse = even indices)
    x_ridge = LO[0] + 101 * vx

    def ridge(width_voxels):
        def field(p):
            # wall of thickness width*vx at x_ridge, tall in y, deep in z
            d = np.abs(p[:, 0] - x_ridge) - 0.5 * width_voxels * vx
            return np.maximum(d, np.abs(p[:, 1]) - 0.5).astype(np.float32)
        return field

    # 1-voxel ridge: hier misses it (both its fine nodes are odd-adjacent;
    # the surrounding coarse corners all read ~flat positive)
    vol1, brute1, _ = _run_case(ridge(1.2), FULL_RES, LO, HI, clip=0.05)
    cb1 = _crossing_cells(brute1, FULL_RES)
    ch1 = _crossing_cells(vol1, FULL_RES)
    assert cb1.sum() > 0
    missed_frac = (cb1 & ~ch1).sum() / cb1.sum()
    assert missed_frac > 0.5, (
        "1-voxel ridge unexpectedly captured — activation heuristic "
        "changed; update CaptureOptions docs + this boundary test")

    # 3-voxel ridge (>= one coarse cell): must be captured exactly
    vol3, brute3, _ = _run_case(ridge(3.0), FULL_RES, LO, HI, clip=0.05)
    cb3 = _crossing_cells(brute3, FULL_RES)
    ch3 = _crossing_cells(vol3, FULL_RES)
    assert (cb3 & ~ch3).sum() == 0
    assert (ch3 & ~cb3).sum() == 0


def test_hier_small_grid_smoke():
    """Non-slow variant: 64^3, smooth sphere — exact crossing parity."""
    res = (64, 64, 64)
    lo = np.full(3, -0.5, np.float32)
    hi = np.full(3, 0.5, np.float32)

    def field(p):
        return (np.linalg.norm(p, axis=-1) - 0.3).astype(np.float32)

    vol, brute, ovf = _run_case(field, res, lo, hi, clip=0.05)
    assert not ovf
    ch = _crossing_cells(vol, res)
    cb = _crossing_cells(brute, res)
    assert (cb ^ ch).sum() == 0
