"""Microbenchmark the rasterizer's sub-passes on the attached chip.

Synthesizes a marching-cubes-like soup (T small triangles spread over the
image) and times: full rasterize_index, the candidate coverage mask alone,
the mask compaction alone, and the two scatter-min z-resolve passes alone —
to direct optimization at the real bottleneck.

Usage: python -m avatarcap_tpu.tools.bench_raster [--tris 1048576]
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tris", type=int, default=1 << 20)
    ap.add_argument("--res", type=int, default=512)
    ap.add_argument("--window", type=int, default=4)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.utils.timers import enable_compile_cache
    enable_compile_cache()
    from avatarcap_tpu.render.raster import rasterize_index
    from avatarcap_tpu.ops.compaction import compact_mask_indices

    T, R, K = args.tris, args.res, args.window
    rng = np.random.RandomState(0)
    # MC-like soup: ~1.5 px triangles, uniform over the central image
    center = rng.uniform(-0.7, 0.7, (T, 1, 2)).astype(np.float32)
    offs = rng.uniform(0, 2.0 * 1.5 / R, (T, 3, 2)).astype(np.float32)
    xy = center + offs
    z = rng.uniform(-0.5, 0.5, (T, 1)).astype(np.float32)
    clip = np.concatenate(
        [xy, np.broadcast_to(z[:, :, None], (T, 3, 1)),
         np.ones((T, 3, 1), np.float32)], axis=-1)
    # wind half CCW-in-window (front), half gets culled
    clip_j = jnp.asarray(clip)
    valid = jnp.ones((T,), bool)

    from avatarcap_tpu.utils.timers import sync

    def timeit(name, fn, *a):
        out = fn(*a)
        sync(out)  # 1-element readback: the tunnel moves ~20-90 MB/s,
        # so materializing large outputs would swamp the timing
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fn(*a)
        sync(out)
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        print(f"  {name:34s} {dt:8.1f} ms")
        return out

    print(f"T={T:,}, res={R}, window={K}")

    full = jax.jit(lambda c, v: rasterize_index(c, v, R, R, window=K,
                                                big_tri_capacity=256))
    ri = timeit("rasterize_index (full)", full, clip_j, valid)
    print(f"  covered px: {int(ri.mask.sum()):,}, "
          f"overflow: {bool(ri.overflow)}")

    # -- sub-passes ----------------------------------------------------
    def mask_only(c, v):
        w = c[..., 3]
        ndc = c[..., :3] / w[..., None]
        px = (ndc[..., 0] + 1.0) * (0.5 * R) - 0.5
        py = (1.0 - ndc[..., 1]) * (0.5 * R) - 0.5
        min_x = jnp.ceil(jnp.min(px, axis=-1)).astype(jnp.int32)
        min_y = jnp.ceil(jnp.min(py, axis=-1)).astype(jnp.int32)
        dyx = jnp.stack(jnp.meshgrid(jnp.arange(K), jnp.arange(K),
                                     indexing="ij"), -1).reshape(-1, 2)
        cy_i = min_y[:, None] + dyx[None, :, 0]
        cx_i = min_x[:, None] + dyx[None, :, 1]
        ok = ((cx_i >= 0) & (cx_i < R) & (cy_i >= 0) & (cy_i < R)
              & v[:, None])
        return ok

    mask = timeit("coverage mask", jax.jit(mask_only), clip_j, valid)

    flat = mask.reshape(-1)
    comp = jax.jit(lambda m: compact_mask_indices(m, max(T, 1 << 16)))
    idx, n, live = timeit("compact_mask_indices", comp, flat)
    print(f"  covered candidates: {int(n):,} / {flat.shape[0]:,}")

    # z-resolve at the compacted count
    C = idx.shape[0]
    z_c = jnp.asarray(rng.uniform(-1, 1, (C,)).astype(np.float32))
    pix_c = jnp.asarray(rng.randint(0, R * R, (C,)).astype(np.int32))
    cand = jnp.arange(C, dtype=jnp.int32)

    def resolve(pix, zc, ids):
        npix = R * R
        zbuf = jnp.full((npix + 1,), jnp.inf, zc.dtype).at[pix].min(zc)
        is_w = (zc == zbuf[pix]) & (zc < jnp.inf)
        win = jnp.where(is_w, ids, jnp.iinfo(jnp.int32).max)
        winner = jnp.full((npix + 1,), jnp.iinfo(jnp.int32).max,
                          jnp.int32).at[pix].min(win)
        return zbuf, winner

    timeit(f"z-resolve (2 scatter-min @ {C / 1e6:.1f}M)",
           jax.jit(resolve), pix_c, z_c, cand)

    def scatter1(pix, zc):
        npix = R * R
        return jnp.full((npix + 1,), jnp.inf, zc.dtype).at[pix].min(zc)

    timeit("single scatter-min", jax.jit(scatter1), pix_c, z_c)

    def sort_resolve(pix, zc, ids):
        # sort-based alternative: one 2-key sort + segment-head pick
        sp, sz, si = jax.lax.sort((pix, zc, ids), num_keys=2)
        first = jnp.concatenate([jnp.ones((1,), bool), sp[1:] != sp[:-1]])
        npix = R * R
        zbuf = jnp.full((npix + 1,), jnp.inf, zc.dtype).at[
            jnp.where(first, sp, npix)].min(jnp.where(first, sz, jnp.inf),
                                            mode="drop")
        winner = jnp.full((npix + 1,), jnp.iinfo(jnp.int32).max,
                          jnp.int32).at[jnp.where(first, sp, npix)].min(
            jnp.where(first, si, jnp.iinfo(jnp.int32).max), mode="drop")
        return zbuf, winner

    timeit("sort-based resolve", jax.jit(sort_resolve), pix_c, z_c, cand)


if __name__ == "__main__":
    main()
