"""On-chip AOT compile + HBM pre-flight for every bench program.

Round 3 shipped a streaming program that a CPU pre-flight could not
fault: the counts were fine (tools/capacity_stats.py) but the TPU
compiler's LAYOUT choice padded two per-vertex matrix tensors 30-64x and
the program needed 17.73 GB of 15.75 GB HBM — a failure class only
visible by compiling ON the target backend. This tool lowers + compiles
(never runs) each production program and reports XLA's own memory
analysis, failing loudly when the projected footprint exceeds the budget.

Usage:
    python -m avatarcap_tpu.tools.compile_preflight            # all three
    python -m avatarcap_tpu.tools.compile_preflight frame stream

Programs: `frame` (fused single-frame, w_recon), `nerf` (fused frame with
the texture tail), `stream` (the vmapped streaming batch at
BENCH_STREAM_BATCH frames, the round-3 OOM shape).

Exit code 0 iff every requested program compiles within HBM_BUDGET_GB.
"""

from __future__ import annotations

import json
import os
import sys

HBM_BUDGET_GB = 14.0   # v5e has 15.75 GB usable; leave runtime headroom


def _mem_report(name: str, compiled) -> dict:
    m = compiled.memory_analysis()
    if m is None:   # backend without memory analysis (e.g. CPU)
        return {"program": name, "memory_analysis": None, "ok": True}
    gb = 1024.0 ** 3
    args = getattr(m, "argument_size_in_bytes", 0)
    out = getattr(m, "output_size_in_bytes", 0)
    temp = getattr(m, "temp_size_in_bytes", 0)
    alias = getattr(m, "alias_size_in_bytes", 0)
    total = args + out + temp - alias
    return {
        "program": name,
        "argument_gb": round(args / gb, 3),
        "output_gb": round(out / gb, 3),
        "temp_gb": round(temp / gb, 3),
        "alias_gb": round(alias / gb, 3),
        "total_gb": round(total / gb, 3),
        "budget_gb": HBM_BUDGET_GB,
        "ok": total / gb < HBM_BUDGET_GB,
    }


def preflight(which=("frame", "nerf", "stream")) -> list:
    """Lower + compile the requested bench programs; one report per
    program. Never executes a frame — compile-time only."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from avatarcap_tpu.pipeline.avatar import FrameInputs
    from avatarcap_tpu.render.camera import gl_perspective_projection_matrix
    from avatarcap_tpu.tools.bench_workloads import build_capture_env

    env = build_capture_env()
    cap, item, cam = env["capture"], env["item"], env["cam"]
    inferred = env["inferred_normal"]
    img_h, img_w = inferred.shape[:2]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    proj = gl_perspective_projection_matrix(fx, fy, cx, cy, img_w, img_h,
                                            gl_space=False)
    frame = FrameInputs(
        live_smpl_v=jnp.asarray(item["live_smpl_v"])[None],
        cano2live_jnt_mats=jnp.asarray(item["cano2live_jnt_mats"])[None],
        smpl_pos_map=jnp.asarray(item["smpl_pos_map"])[None])
    fused_args = (cap.state, cap.avatar_vars, cap.recon_vars,
                  cap.avatar_tex_vars, frame,
                  jnp.asarray(item["cano2live_jnt_mats"]),
                  jnp.asarray(inferred), jnp.asarray(item["w2c_RT"]),
                  jnp.asarray(proj), fx, fy, cx, cy, cap._neck_xy(0))

    reports = []
    if "frame" in which:
        lowered = cap._frame_fused.lower(*fused_args, w_recon=True,
                                         w_nerf=False)
        reports.append(_mem_report("frame", lowered.compile()))
    if "nerf" in which:
        lowered = cap._frame_fused.lower(*fused_args, w_recon=True,
                                         w_nerf=True)
        reports.append(_mem_report("nerf", lowered.compile()))
    if "stream" in which:
        from avatarcap_tpu.parallel.mesh import make_mesh
        from avatarcap_tpu.pipeline.streaming import StreamingCapture
        fpd = int(os.environ.get("BENCH_STREAM_BATCH", "4"))
        mesh = make_mesh(jax.devices()[:1])
        stream = StreamingCapture(cap, mesh, camera=cam,
                                  image_size=(img_h, img_w), w_recon=True,
                                  frames_per_device=fpd)
        B = stream.batch
        pos_maps = jnp.asarray(np.stack([item["smpl_pos_map"]] * B))
        lsv = jnp.asarray(np.stack([item["live_smpl_v"]] * B))
        c2l = jnp.asarray(np.stack([item["cano2live_jnt_mats"]] * B))
        norms = jnp.asarray(np.stack([inferred] * B))
        w2cs = jnp.asarray(np.stack([item["w2c_RT"]] * B))
        lowered = stream._frames_batch.lower(
            stream._state, stream._avatar_vars, stream._recon_vars,
            stream._tex_vars, pos_maps, lsv, c2l, norms, w2cs)
        reports.append(_mem_report(f"stream_b{B}", lowered.compile()))
    return reports


def main():
    import datetime
    import jax
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    from avatarcap_tpu.utils.timers import enable_compile_cache
    enable_compile_cache()

    which = tuple(sys.argv[1:]) or ("frame", "nerf", "stream")
    ok = True
    reports = []
    for rep in preflight(which):
        print(json.dumps(rep), flush=True)
        reports.append(rep)
        ok = ok and rep["ok"]
    # persist for __graft_entry__.dryrun_multichip to echo: the layout-OOM
    # failure class is only visible on the TPU backend, so the CPU dryrun
    # reports the latest ON-CHIP evidence instead of a vacuous CPU compile
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "PREFLIGHT.json")
    record = {"when": datetime.datetime.now().isoformat(timespec="seconds"),
              "platform": jax.default_backend(), "reports": reports}
    try:
        if os.path.exists(path):
            with open(path) as f:
                old = json.load(f)
            by_name = {r["program"]: r
                       for r in old.get("reports", [])}
            by_name.update({r["program"]: r for r in reports})
            record["reports"] = list(by_name.values())
        with open(path, "w") as f:
            json.dump(record, f, indent=1)
    except OSError:
        pass
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
