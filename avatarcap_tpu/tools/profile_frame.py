"""Per-stage breakdown of one full capture frame (VERDICT r1 item #1).

Runs BASELINE config #4 (384x384x128 grid, 512^2 renders + fusion, full
ReconNet) on the default backend and prints where the milliseconds go.

Usage: python -m avatarcap_tpu.tools.profile_frame [--frames N] [--nerf]
"""

from __future__ import annotations

import argparse
import time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=3)
    ap.add_argument("--nerf", action="store_true")
    ap.add_argument("--no-recon", action="store_true")
    ap.add_argument("--vol-res", type=int, nargs=3, default=(384, 384, 128))
    ap.add_argument("--fusion-iters", type=int, default=100)
    ap.add_argument("--no-fused-query", action="store_true")
    ap.add_argument("--trace", metavar="DIR", default=None,
                    help="also capture a jax.profiler trace of the timed "
                         "frames into DIR (view with TensorBoard or xprof)")
    args = ap.parse_args()

    import jax
    from avatarcap_tpu.utils.timers import enable_compile_cache
    enable_compile_cache()
    from avatarcap_tpu.tools.bench_workloads import build_capture_env
    from avatarcap_tpu.utils.timers import StageTimer

    print(f"backend: {jax.default_backend()}, devices: {jax.devices()}")
    t0 = time.perf_counter()
    env = build_capture_env(
        vol_res=tuple(args.vol_res), fusion_iters=args.fusion_iters,
        use_fused_query=(False if args.no_fused_query else None))
    print(f"setup: {time.perf_counter() - t0:.1f} s, "
          f"n_valid={env['n_valid']:,} grid pts")

    capture, item = env["capture"], env["item"]
    kw = dict(w_recon=not args.no_recon, w_nerf=args.nerf,
              inferred_normal=env["inferred_normal"], neck_vertex_idx=0,
              camera=env["cam"])

    # warmup/compile frame — use a throwaway TIMER so the warmup compiles
    # the staged programs being measured (the production path runs a
    # separate fused whole-frame program)
    t0 = time.perf_counter()
    res = capture.process_frame(item, timer=StageTimer(), **kw)
    from avatarcap_tpu.utils.timers import sync
    sync(res)
    print(f"compile+first frame: {time.perf_counter() - t0:.1f} s, "
          f"avatar tris={int(res['cano_mesh'].num_tris):,}"
          + (f", recon tris={int(res['recon_mesh'].num_tris):,}"
             if "recon_mesh" in res else ""))

    import contextlib
    trace_cm = (jax.profiler.trace(args.trace) if args.trace
                else contextlib.nullcontext())
    timer = StageTimer()
    t0 = time.perf_counter()
    with trace_cm:
        for _ in range(args.frames):
            capture.process_frame(item, timer=timer, **kw)
    dt = (time.perf_counter() - t0) / args.frames
    for k in timer.times:
        timer.times[k] /= args.frames
    print(f"\nsteady-state frame: {dt * 1e3:.1f} ms "
          f"({1.0 / dt:.2f} fps) over {args.frames} frames")
    print(timer.report())

    if not args.nerf and not args.no_recon:
        # production path: the whole frame as one fused program (no
        # per-stage sync or dispatch round-trips)
        from avatarcap_tpu.utils.timers import sync as _sync
        res = capture.process_frame(item, **kw)   # compile
        _sync(res)
        t0 = time.perf_counter()
        for _ in range(args.frames):
            res = capture.process_frame(item, **kw)
        _sync(res)
        dt = (time.perf_counter() - t0) / args.frames
        print(f"\nfused single-program frame: {dt * 1e3:.1f} ms "
              f"({1.0 / dt:.2f} fps)")


if __name__ == "__main__":
    main()
