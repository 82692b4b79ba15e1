"""Microbenchmark marching tetrahedra sub-stages on the attached chip.

A 384x384x128 volume with a body-scale sphere (surface area comparable to
the capture workload) through marching_tets, with and without the
edge-normal volume, plus isolated sub-pass timings.

Usage: python -m avatarcap_tpu.tools.bench_mc
"""

from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--res", type=int, nargs=3, default=(384, 384, 128))
    ap.add_argument("--max-tris", type=int, default=1 << 20)
    ap.add_argument("--max-active", type=int, default=1 << 18)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.utils.timers import enable_compile_cache
    enable_compile_cache()
    from avatarcap_tpu.ops.marching_cubes import marching_tets
    from avatarcap_tpu.ops.sobel import extract_normal_volume

    X, Y, Z = args.res
    # ellipsoid occupying most of the volume; surface ~ a body's
    lin = [np.linspace(-1, 1, n, dtype=np.float32) for n in (X, Y, Z)]
    g = np.stack(np.meshgrid(*lin, indexing="ij"), -1)
    vol = 0.7 - np.linalg.norm(g / np.array([0.8, 0.95, 0.7]), axis=-1)
    vol = jnp.asarray(vol)
    bmin = jnp.zeros(3)
    voxel = jnp.asarray([2.0 / X, 2.0 / Y, 2.0 / Z])

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
        print(f"  {name:40s} {dt:8.1f} ms")
        return out

    mt = jax.jit(lambda v: marching_tets(v, 0.0, bmin, voxel,
                                         max_tris=args.max_tris,
                                         max_active=args.max_active))
    m = timeit("marching_tets (no normals)", mt, vol)
    print(f"  tris: {int(m.num_tris):,}, overflow: {bool(m.overflow)}")

    nv = jax.jit(lambda v: extract_normal_volume(v, voxel))
    nvol = timeit("extract_normal_volume (sobel)", nv, vol)

    mtn = jax.jit(lambda v, n: marching_tets(v, 0.0, bmin, voxel,
                                             max_tris=args.max_tris,
                                             max_active=args.max_active,
                                             normal_volume=n))
    timeit("marching_tets (+edge normals)", mtn, vol, nvol)

    # isolated: active-mask + compaction
    from avatarcap_tpu.ops.compaction import compact_mask_indices

    def active_part(v):
        mx = jax.lax.reduce_window(v, -jnp.inf, jax.lax.max,
                                   (2, 2, 2), (1, 1, 1), "valid")
        mn = -jax.lax.reduce_window(-v, -jnp.inf, jax.lax.max,
                                    (2, 2, 2), (1, 1, 1), "valid")
        act = ((mx > 0.0) & ~(mn > 0.0)).reshape(-1)
        return compact_mask_indices(act, args.max_active)

    ids, n_act, _ = timeit("active mask + compaction",
                           jax.jit(active_part), vol)
    print(f"  active cubes: {int(n_act):,}")


if __name__ == "__main__":
    main()
