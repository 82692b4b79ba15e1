"""Benchmarks for every BASELINE.md config, on the attached TPU chip.

Prints ONE JSON line per config; the LAST line is the headline metric
(BASELINE config #4: full AvatarCap frame seconds; north star < 1 s/frame
512^2 RGB -> mesh on one v5e chip, `vs_baseline` = fraction of the 1 s
budget achieved, > 1 beats the target).

Configs (BASELINE.md "Benchmark configs to implement"):
  1. GeoTexAvatar inference: 128^3 grid implicit query + marching tets.
  2. GeoTexAvatar training step: batch 4, 1024 rays x 64 samples,
     5312 geometry pts/item (the reference per-item load).
  3. ReconNet frame: HGFilter on 512^2 + pixel-aligned MLP over 256^3 pts.
  4. Full AvatarCap frame: 384x384x128 grid, 512^2 renders + 100-iter
     fusion + ReconNet + skinning (the reference test pipeline,
     main.py:275-504).
  5. Streaming capture: frames/s over a batch of frames through the
     per-frame pipeline on one chip (v5e-4 scaling is exercised by
     dryrun_multichip on the virtual mesh; no multi-chip hardware here).

NOTE (axon): jax.block_until_ready does not block on the tunneled TPU
platform; timings force a host readback (utils.timers.sync).
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def _emit(metric, value, unit, vs_baseline):
    print(json.dumps({"metric": metric, "value": round(value, 3),
                      "unit": unit, "vs_baseline": round(vs_baseline, 3)}),
          flush=True)


def _isolated(name, fn, *args):
    """Run one bench config; a failure emits a per-config error line and
    lets every other config (and the headline) still report.

    Round 3 lost ALL its measured numbers because config #5 raised after
    config #4 had already measured 0.58 s — the headline was printed
    last, so one late exception erased the round's evidence (VERDICT r3
    item 2). Failure isolation is the fix, not optional polish.
    """
    import traceback
    try:
        return fn(*args)
    except Exception as e:  # noqa: BLE001 - report, never abort the run
        traceback.print_exc(file=sys.stderr)
        print(json.dumps({"metric": f"{name}_error", "value": 0.0,
                          "unit": "error", "vs_baseline": 0.0,
                          "error": f"{type(e).__name__}: {e}"[:300]}),
              flush=True)
        return None


def bench_config1():
    """128^3 implicit query + marching tets (Mpts/s)."""
    import jax
    import jax.numpy as jnp
    from __graft_entry__ import _toy_setup
    from avatarcap_tpu.pipeline.avatar import (
        compute_pose_features, pack_fused_query_weights, grid_pose_features)
    from avatarcap_tpu.ops.pallas_query import warp_template_query_fused
    from avatarcap_tpu.ops.marching_cubes import marching_tets

    module, statics, frame, _ = _toy_setup()
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)), frame.smpl_pos_map,
        statics.cano_smpl_center[None])
    packed = pack_fused_query_weights(variables)

    res = 128
    lin = [jnp.linspace(0.0, 1.0, res) for _ in range(3)]
    grid = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    pts = grid * (statics.cano_bounds[1] - statics.cano_bounds[0]) \
        + statics.cano_bounds[0]
    n_pts = pts.shape[0]

    @jax.jit
    def query_fn(variables, packed, pts, pos_map):
        feat, _ = compute_pose_features(module, variables, pos_map)
        pf = grid_pose_features(feat, statics, (res, res, res),
                                dtype=jnp.bfloat16)
        out = warp_template_query_fused(packed["offset"],
                                        packed["template"], pts, pf)
        return out["occ"][:, 0].reshape(res, res, res)

    @jax.jit
    def mc_fn(vol):
        voxel = (statics.cano_bounds[1] - statics.cano_bounds[0]) / res
        mesh = marching_tets(vol, 0.0, statics.cano_bounds[0], voxel,
                             max_tris=1 << 19, max_active=1 << 17)
        return mesh.num_tris

    vol = query_fn(variables, packed, pts, frame.smpl_pos_map)
    nt = mc_fn(vol)
    _ = int(nt)
    iters = 10
    t0 = time.time()
    for _ in range(iters):
        vol = query_fn(variables, packed, pts, frame.smpl_pos_map)
        nt = mc_fn(vol)
    _ = int(nt)  # forced readback
    dt = (time.time() - t0) / iters
    _emit("geotexavatar_128grid_implicit_query_Mpts_per_s",
          n_pts / dt / 1e6, "Mpts/s", 1.0 / dt)


def bench_config2():
    """Training step throughput at the reference per-item load."""
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.tools.bench_workloads import build_train_env
    from avatarcap_tpu.utils.timers import sync

    env = build_train_env()
    trainer, state = env["trainer"], env["state"]
    batch = {k: jnp.asarray(v) for k, v in env["batch"].items()}
    lrs = jnp.asarray([1e-3, 1e-4])
    rng = jax.random.PRNGKey(0)

    state, metrics = trainer.train_step(state, batch, lrs, rng)
    sync(metrics)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        state, metrics = trainer.train_step(state, batch, lrs, rng)
    sync(metrics)
    dt = (time.time() - t0) / iters
    _emit("avatar_train_steps_per_s_batch4", 1.0 / dt, "steps/s", 1.0 / dt)


def bench_config2_e2e():
    """Config #2 INCLUDING the host data pipeline (VERDICT r2 item 4):
    a real on-disk synthetic subject at the reference per-item sizes
    (512^2 jpg decode + pos-map load + 1024-ray sampling + device FK per
    item), streamed through the prefetching loader (num_workers=3)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.utils.timers import sync
    from avatarcap_tpu.utils.toy_body import make_toy_smpl_params
    from avatarcap_tpu.body.smpl import canonical_pose
    from avatarcap_tpu.data.dataset import AvatarCapDataset
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.pipeline.avatar import AvatarStatics
    from avatarcap_tpu.train.trainer import AvatarTrainer

    out = "/tmp/avatarcap_bench_subject_v1"
    params = make_toy_smpl_params(n_lat=77, n_lon=90)
    if not os.path.exists(os.path.join(out, "dataConfig.yaml")):
        from avatarcap_tpu.tools.gen_synthetic import generate_subject
        rng = np.random.RandomState(0)
        poses = []
        for _ in range(3):
            p = canonical_pose().copy()
            p[6:] += rng.uniform(-0.2, 0.2, p.size - 6).astype(np.float32)
            poses.append(p)
        generate_subject(out, params, np.zeros(10, np.float32),
                         np.stack(poses), n_views=8, img_size=512,
                         pos_map_res=256, sur_pts_count=20000,
                         vol_pts_count=2000)

    ds = AvatarCapDataset(out, training=True, smpl_params=params)
    wv = np.load(f"{out}/cano_base_blend_weight_volume.npy")
    statics = AvatarStatics(
        weight_volume=jnp.asarray(wv),
        cano_smpl_vertices=jnp.asarray(ds.cano_smpl_v),
        smpl_skinning_weights=jnp.asarray(params.weights),
        cano_bounds=jnp.asarray(ds.cano_bounds),
        cano_smpl_center=jnp.asarray(ds.cano_smpl_center))
    module = GeoTexAvatar(if_type="sdf")
    item0 = ds[0]
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)),
        jnp.asarray(item0["smpl_pos_map"])[None],
        statics.cano_smpl_center[None])
    trainer = AvatarTrainer(module=module, statics=statics,
                            net_ckpt_dir="/tmp/bench_e2e_ckpt",
                            n_samples=64)
    state = trainer.init_state(variables)
    lrs = jnp.asarray([1e-3, 1e-4])
    rng = jax.random.PRNGKey(0)

    def run_epoch(state, rng, seed):
        # device_batches: per-pose constants cached on device, next
        # batch's ~1.4 MB uploaded while the current step runs (the
        # naive path re-ships ~7 MB/batch of constants through the
        # ~25 MB/s tunnel — measured 2.6 steps/s vs 7.5 device-only)
        metrics, n = None, 0
        # process workers: the thread loader is GIL-bound and halves
        # under concurrent host load (6.99 -> 3.27 steps/s, r4);
        # forked workers keep full decode throughput
        for batch in ds.device_batches(4, shuffle=True, seed=seed,
                                       num_workers=3,
                                       workers="process"):
            rng, r = jax.random.split(rng)
            state, metrics = trainer.train_step(state, batch, lrs, r)
            n += 1
        return state, rng, metrics, n

    state, rng, metrics, _ = run_epoch(state, rng, 0)   # compile + warm
    sync(metrics)
    t0 = time.time()
    total = 0
    for e in range(2):
        state, rng, metrics, n = run_epoch(state, rng, e + 1)
        total += n
    sync(metrics)
    dt = (time.time() - t0) / total
    _emit("avatar_train_steps_per_s_batch4_with_data", 1.0 / dt,
          "steps/s", 1.0 / dt)


def bench_kernel_mfu():
    """Kernel-only MFU for the two fused Pallas kernels (the MXU-bound
    core of configs #1/#3; see tools/bench_kernels.py for convention)."""
    from avatarcap_tpu.tools.bench_kernels import measure
    for r in measure(n=4 * 1024 * 1024, iters=10):
        _emit(f"{r['kernel']}_mfu_pct", r["mfu_pct_v5e_bf16"], "% of v5e bf16 peak",
              r["mfu_pct_v5e_bf16"] / 100.0)


def bench_config3(env):
    """ReconNet: HGFilter 512^2 + pixel-aligned decode over 256^3 pts."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from avatarcap_tpu.utils.timers import sync
    from avatarcap_tpu.models.recon import ReconNetwork

    cap = env["capture"]
    recon, recon_vars = cap.recon, cap.recon_vars
    statics = cap.statics

    res = 256
    lin = [jnp.linspace(0.0, 1.0, res) for _ in range(3)]
    g = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    pts = g * (statics.cano_bounds[1] - statics.cano_bounds[0]) \
        + statics.cano_bounds[0]
    rng = np.random.RandomState(0)
    img = jnp.asarray(rng.standard_normal((1, 512, 512, 6))
                      .astype(np.float32))

    if cap.opt.use_fused_query:
        from avatarcap_tpu.ops.pallas_query import recon_decode_fused
        from avatarcap_tpu.pipeline.avatar import grid_pose_features

        @jax.jit
        def recon_frame(recon_vars, img):
            feat_map = recon.apply(recon_vars, img,
                                   method=ReconNetwork.get_feat_maps)
            pf = grid_pose_features(feat_map, statics, (res, res, res))
            z = pts[:, 2] - statics.cano_smpl_center[2]
            feats = jnp.concatenate([pf, z[:, None]], axis=-1)
            return recon_decode_fused(cap._packed_recon, feats)
    else:
        @jax.jit
        def recon_frame(recon_vars, img):
            feat_map = recon.apply(recon_vars, img,
                                   method=ReconNetwork.get_feat_maps)
            return recon.apply(recon_vars, feat_map, pts[None],
                               statics.cano_smpl_center[None],
                               method=ReconNetwork.decode_points)[0]

    ov = recon_frame(recon_vars, img)
    sync(ov)
    iters = 5
    t0 = time.time()
    for _ in range(iters):
        ov = recon_frame(recon_vars, img)
    sync(ov)
    dt = (time.time() - t0) / iters
    _emit("reconnet_512img_256cube_seconds", dt, "s",
          (res ** 3) / dt / 1e6)  # Mpts/s as the comparison figure


def bench_config4(env):
    """Full frame (config #4): sequential fused single-frame seconds."""
    from avatarcap_tpu.utils.timers import sync

    cap, item = env["capture"], env["item"]
    kw = dict(w_recon=True, w_nerf=False,
              inferred_normal=env["inferred_normal"], neck_vertex_idx=0,
              camera=env["cam"])
    res = cap.process_frame(item, **kw)
    sync(res)

    frames = 5
    t0 = time.time()
    for _ in range(frames):
        res = cap.process_frame(item, **kw)
    sync(res)
    dt = (time.time() - t0) / frames
    # honesty check: the headline only counts if no static capacity was
    # hit anywhere in the fused program (query refine, MC, raster
    # candidates, big-tri slots) — overflow means dropped geometry
    ovf = bool(res["overflow"])
    _emit("full_frame_overflow", 1.0 if ovf else 0.0, "bool",
          0.0 if ovf else 1.0)
    return dt


def bench_w_nerf(env):
    """Complete per-frame output set (w_recon + w_nerf texture) as ONE
    fused program (VERDICT r2 item 5; reference main.py:460-489)."""
    from avatarcap_tpu.utils.timers import sync

    cap, item = env["capture"], env["item"]
    kw = dict(w_recon=True, w_nerf=True,
              inferred_normal=env["inferred_normal"], neck_vertex_idx=0,
              camera=env["cam"])
    res = cap.process_frame(item, **kw)
    sync(res)
    frames = 3
    t0 = time.time()
    for _ in range(frames):
        res = cap.process_frame(item, **kw)
    sync(res)
    dt = (time.time() - t0) / frames
    _emit("full_frame_w_nerf_seconds", dt, "s", 1.0 / dt)


def bench_config5(env):
    """Streaming capture (config #5): sustained frames/s on one chip.

    The official single-chip number is the PIPELINED sequential path
    (pipeline/streaming.py:run_pipelined) — the exact production fused
    frame program with donated inputs, dispatched back-to-back with the
    next frames' host uploads overlapped under device compute. The
    batched vmap path (which is what multi-chip frame sharding uses per
    device) is emitted as a secondary metric; on ONE chip vmap
    serializes its frames through every stage, so it amortizes nothing
    (measured 1.55 fps at batch 4 vs 1.80 sequential, r4). The v5e-4
    scaling axis is exercised by dryrun_multichip on the virtual mesh.
    """
    import jax
    from avatarcap_tpu.utils.timers import sync
    from avatarcap_tpu.parallel.mesh import make_mesh
    from avatarcap_tpu.pipeline.streaming import StreamingCapture

    cap, item = env["capture"], env["item"]
    mesh = make_mesh(jax.devices()[:1])
    stream = StreamingCapture(cap, mesh, camera=env["cam"],
                              image_size=(512, 512), w_recon=True,
                              frames_per_device=1)
    n_frames = 8
    items = [dict(item) for _ in range(n_frames)]
    norms = [env["inferred_normal"]] * n_frames
    res = stream.run_pipelined(items, inferred_normals=norms)  # compile
    sync(res[-1])
    reps = 2
    t0 = time.time()
    for _ in range(reps):
        res = stream.run_pipelined(items, inferred_normals=norms)
        sync(res[-1])
    dt = (time.time() - t0) / (reps * n_frames)
    _emit("streaming_capture_fps_1chip", 1.0 / dt, "frames/s", 1.0 / dt)


def bench_config5_batched(env):
    """Secondary: the batched vmap streaming program (the per-device
    program of multi-chip frame sharding) on one chip."""
    import jax
    from avatarcap_tpu.utils.timers import sync
    from avatarcap_tpu.parallel.mesh import make_mesh
    from avatarcap_tpu.pipeline.streaming import StreamingCapture

    cap, item = env["capture"], env["item"]
    # batch 4/chip: preflighted at 7.46 GB of 14 GB HBM (flat-mats
    # skinning rework, r4); batch 6 needs 16.3 GB and does not fit
    fpd = int(os.environ.get("BENCH_STREAM_BATCH", "4"))
    mesh = make_mesh(jax.devices()[:1])
    stream = StreamingCapture(cap, mesh, camera=env["cam"],
                              image_size=(512, 512), w_recon=True,
                              frames_per_device=fpd)
    items = [dict(item) for _ in range(stream.batch)]
    norms = [env["inferred_normal"]] * stream.batch
    res = stream.run(items, inferred_normals=norms)   # compile
    sync(res[-1])
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        res = stream.run(items, inferred_normals=norms)
    sync(res[-1])
    dt = (time.time() - t0) / (reps * stream.batch)
    _emit("streaming_capture_fps_1chip_batched", 1.0 / dt, "frames/s",
          1.0 / dt)


def _device_ready(timeout_s: int = 240) -> bool:
    """Probe device initialization in a subprocess with a hard timeout.

    The tunneled TPU platform HANGS inside jax.devices() when the tunnel
    is unreachable (rather than raising), which would stall the whole
    bench run; a bounded subprocess probe turns that into a fast,
    reportable failure.
    """
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, "-c",
             "import jax; d = jax.devices(); print(d[0].platform)"],
            timeout=timeout_s, capture_output=True, text=True)
        return out.returncode == 0
    except subprocess.TimeoutExpired:
        return False


def main():
    if not _device_ready():
        _emit("device_unavailable", 1.0, "bool", 0.0)
        sys.exit(1)

    from avatarcap_tpu.utils.timers import enable_compile_cache
    enable_compile_cache()

    _isolated("geotexavatar_128grid_implicit_query", bench_config1)
    _isolated("avatar_train_steps_per_s_batch4", bench_config2)
    _isolated("avatar_train_steps_per_s_batch4_with_data",
              bench_config2_e2e)
    _isolated("kernel_mfu", bench_kernel_mfu)

    def _build_env():
        from avatarcap_tpu.tools.bench_workloads import build_capture_env
        return build_capture_env()

    env = _isolated("capture_env", _build_env)
    dt = None
    if env is not None:
        _isolated("reconnet_512img_256cube", bench_config3, env)
        dt = _isolated("avatarcap_full_frame", bench_config4, env)
        if dt is not None:
            # headline EAGERLY, before anything that could still fail
            _emit("avatarcap_full_frame_seconds", dt, "s", 1.0 / dt)
        _isolated("full_frame_w_nerf", bench_w_nerf, env)
        _isolated("streaming_capture_fps_1chip", bench_config5, env)
        _isolated("streaming_capture_fps_1chip_batched",
                  bench_config5_batched, env)
    # headline LAST too: the driver reads the final line as the metric
    if dt is not None:
        _emit("avatarcap_full_frame_seconds", dt, "s", 1.0 / dt)
    else:
        _emit("avatarcap_full_frame_seconds_unmeasured", 0.0, "bool", 0.0)


if __name__ == "__main__":
    main()
