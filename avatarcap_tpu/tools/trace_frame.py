"""Op-level breakdown of the fused capture frame from a profiler trace.

`tools/profile_frame.py` attributes milliseconds to pipeline STAGES (the
staged path); this tool attributes them to HLO OPS inside the ONE fused
production program, via `jax.profiler.trace` (which works through the
tunneled axon runtime — device events carry durations, bytes_accessed
and python source stacks). This is how the hot-op list that drives
kernel work is produced; no reference counterpart (the reference has no
profiling at all, SURVEY §5).

Usage: python -m avatarcap_tpu.tools.trace_frame [--frames N] [--top K]
       [--vol-res X Y Z] [--keep DIR]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import shutil
import tempfile


def aggregate_trace(trace_dir: str, device_pid_hint: str = "TPU"):
    """Parse the newest trace under trace_dir; return (ops, total_ms).

    ops: list of dicts {name, category, ms, calls, bytes, source} sorted
    by total ms, one entry per (hlo fusion name base, source) pair.
    """
    runs = sorted(glob.glob(os.path.join(
        trace_dir, "plugins", "profile", "*")))
    assert runs, f"no profile runs under {trace_dir}"
    files = glob.glob(os.path.join(runs[-1], "*.trace.json.gz"))
    assert files, f"no trace.json.gz in {runs[-1]}"
    with gzip.open(files[0]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    dev_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and device_pid_hint in str(e.get("args", {}).get("name"))}
    agg = collections.defaultdict(lambda: [0.0, 0, 0])
    src_of = {}
    for e in ev:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        args = e.get("args", {})
        if "hlo_category" not in args:
            continue  # the jit_<fn> envelope rows double-count their ops
        cat = args["hlo_category"]
        src = (args.get("source_stack") or args.get("source")
               or "").strip().split("\n")[0]
        # strip the %fusion.NNN counter so repeated dispatches pool
        name = e.get("name", "").split("(")[0].rstrip("0123456789.")
        key = (name, cat, src)
        agg[key][0] += float(e.get("dur", 0.0)) / 1e3   # us -> ms
        agg[key][1] += 1
        agg[key][2] += int(args.get("bytes_accessed", 0))
        src_of[key] = src
    ops = [{"name": k[0], "category": k[1], "source": k[2],
            "ms": v[0], "calls": v[1], "mb": v[2] / 1e6}
           for k, v in agg.items()]
    ops.sort(key=lambda o: -o["ms"])
    total = sum(o["ms"] for o in ops)
    return ops, total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=2)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--vol-res", type=int, nargs=3, default=(384, 384, 128))
    ap.add_argument("--keep", default=None,
                    help="keep the raw trace in DIR (default: tmp, deleted)")
    ap.add_argument("--nerf", action="store_true")
    args = ap.parse_args()

    from avatarcap_tpu.utils.timers import enable_compile_cache, sync
    enable_compile_cache()
    import jax
    import time
    from avatarcap_tpu.tools.bench_workloads import build_capture_env

    t0 = time.perf_counter()
    env = build_capture_env(vol_res=tuple(args.vol_res))
    print(f"setup: {time.perf_counter() - t0:.1f} s", flush=True)
    capture, item = env["capture"], env["item"]
    kw = dict(w_recon=True, w_nerf=args.nerf,
              inferred_normal=env["inferred_normal"], neck_vertex_idx=0,
              camera=env["cam"])
    t0 = time.perf_counter()
    res = capture.process_frame(item, **kw)      # compile + warm
    sync(res)
    print(f"compile+warm: {time.perf_counter() - t0:.1f} s", flush=True)

    trace_dir = args.keep or tempfile.mkdtemp(prefix="avatarcap_trace_")
    t0 = time.perf_counter()
    with jax.profiler.trace(trace_dir):
        for _ in range(args.frames):
            res = capture.process_frame(item, **kw)
        sync(res)
    wall = (time.perf_counter() - t0) / args.frames
    print(f"fused frame wall: {wall * 1e3:.1f} ms over {args.frames} frames",
          flush=True)

    ops, total = aggregate_trace(trace_dir)
    print(f"device total: {total / args.frames:.1f} ms/frame over "
          f"{len(ops)} distinct ops\n")
    print(f"{'ms/frame':>9}  {'calls':>5}  {'GB/s':>6}  "
          f"{'category':<22} source")
    for o in ops[: args.top]:
        gbps = (o["mb"] / 1e3) / (o["ms"] / 1e3) if o["ms"] else 0.0
        print(f"{o['ms'] / args.frames:9.2f}  {o['calls']:5d}  {gbps:6.0f}"
              f"  {o['category']:<22} {o['source'][:70]}")
    if not args.keep:
        shutil.rmtree(trace_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
