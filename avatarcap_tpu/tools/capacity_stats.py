"""Measured capacity workloads for a capture setup.

Every static capacity in the capture frame (CaptureOptions) is walked
even when empty, and overflowed work is dropped (reported via
``results["overflow"]``). The counts that size those capacities —
surface-crossing cubes, refined hierarchy nodes, covered raster
candidates, emitted triangles — are DATA properties of the subject +
options, not of the device, so they can be measured on the CPU platform
before committing (tunneled, slow-to-compile) TPU time.

Prints one JSON dict per capacity: measured count, configured capacity,
and headroom. Use it to (a) pre-flight a new subject/options combo for
overflow before an on-chip run and (b) tighten capacities to the
measured workload (VERDICT r3 direction: capacities sized by
measurement, guarded by the aggregate overflow bit).

Usage:
    python -m avatarcap_tpu.tools.capacity_stats          # bench body
    JAX_PLATFORMS=cpu python -m avatarcap_tpu.tools.capacity_stats
"""

from __future__ import annotations

import json

import numpy as np


def _active_cubes(vol_flat, vol_res, iso: float) -> int:
    """Surface-crossing cube count, marching_cubes' own definition
    (ops/marching_cubes.py: is_active = (max8 > iso) & ~(min8 > iso))."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def count(vol_flat):
        vol = vol_flat.reshape(vol_res)
        mx = jax.lax.reduce_window(vol, -jnp.inf, jax.lax.max,
                                   (2, 2, 2), (1, 1, 1), "valid")
        mn = -jax.lax.reduce_window(-vol, -jnp.inf, jax.lax.max,
                                    (2, 2, 2), (1, 1, 1), "valid")
        return jnp.sum((mx > iso) & ~(mn > iso))

    return int(count(vol_flat))


def capacity_stats(cap, item, inferred_normal=None, cam=None,
                   neck_vertex_idx: int = 0) -> dict:
    """Measure every data-dependent capacity workload of one frame.

    Args:
      cap: a fully-constructed AvatarCapture.
      item: dataset item (live_smpl_v, cano2live_jnt_mats, smpl_pos_map,
        w2c_RT).
      inferred_normal / cam: required for the recon-side stats (the live
        position pass and the ReconNet hierarchy); omit for avatar-only.

    Returns {name: {count, capacity, headroom}} plus mesh triangle rows.
    The implicit queries run through the XLA path (query_occupancy /
    decode_points) — counts only depend on the field values, which the
    Pallas path reproduces (tests/test_pallas_query.py).
    """
    import jax
    import jax.numpy as jnp
    from avatarcap_tpu.models.recon import ReconNetwork
    from avatarcap_tpu.pipeline.avatar import (FrameInputs,
                                               compute_pose_features,
                                               query_occupancy)
    from avatarcap_tpu.pipeline.capture import hierarchical_volume
    from avatarcap_tpu.render.camera import gl_perspective_projection_matrix

    o = cap.opt
    g = cap.grid
    statics = cap.statics
    use_hier = o.hierarchical_query and g.c_idx is not None
    frame = FrameInputs(
        live_smpl_v=jnp.asarray(item["live_smpl_v"])[None],
        cano2live_jnt_mats=jnp.asarray(item["cano2live_jnt_mats"])[None],
        smpl_pos_map=jnp.asarray(item["smpl_pos_map"])[None])

    stats = {}

    def row(name, count, capacity):
        stats[name] = {
            "count": int(count), "capacity": int(capacity),
            "headroom": round(1.0 - int(count) / max(int(capacity), 1), 3)}

    # --- avatar implicit query + hierarchy -------------------------------
    feat, _ = compute_pose_features(cap.avatar, cap.avatar_vars,
                                    frame.smpl_pos_map)

    def vf_avatar(pts, fidx):
        out, _ = query_occupancy(cap.avatar, cap.avatar_vars, pts[None],
                                 feat, statics)
        return out["cano_pts_ov"][0, :, 0]

    if use_hier:
        vol, _, n_r = hierarchical_volume(
            vf_avatar, g, statics.cano_bounds, g.c_prior, g.prior_volume,
            o.iso_value, o.hier_alpha, o.refine_capacity, with_stats=True)
        row("avatar_refine_nodes", n_r, o.refine_capacity)
    else:
        out, _ = query_occupancy(cap.avatar, cap.avatar_vars,
                                 g.valid_pts[None], feat, statics)
        vol = g.prior_volume.at[g.valid_idx].set(out["cano_pts_ov"][0, :, 0],
                                                 mode="drop")
    row("avatar_active_cubes", _active_cubes(vol, g.vol_res, o.iso_value),
        o.max_active)

    # --- avatar mesh + canonical index passes ----------------------------
    cano_mesh, _ = cap._avatar_geometry(cap.state, cap.avatar_vars, frame)
    row("avatar_tris", int(cano_mesh.num_tris), o.max_tris)
    fri, bri, *_ = cap._cano_layers(cano_mesh)
    # merged mirror-pair pass: one shared candidate buffer for both sides
    # (capacity defaults mirror render/raster.py:208,364)
    pair_cap = o.raster_max_candidates or max(2 * o.max_tris, 1 << 17)
    row("cano_pair_candidates", int(fri.n_candidates), pair_cap)
    # each side runs its own exact big-triangle pass at cano_big_tris
    row("cano_big_tris", max(int(fri.n_big), int(bri.n_big)),
        o.cano_big_tris)

    if inferred_normal is None or cap.recon is None:
        return stats

    # --- live position pass (fusion visibility) --------------------------
    from avatarcap_tpu.render.raster import rasterize_index
    img_h, img_w = np.asarray(inferred_normal).shape[:2]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    proj = gl_perspective_projection_matrix(fx, fy, cx, cy, img_w, img_h,
                                            gl_space=False)
    mvp = jnp.asarray(proj) @ jnp.asarray(item["w2c_RT"])
    live_mesh, pt_mats = cap._skinning(
        cap.state, cano_mesh, jnp.asarray(item["cano2live_jnt_mats"]))
    live_tris = live_mesh.vertices.reshape(-1, 3, 3)
    vh = jnp.concatenate([live_tris, jnp.ones_like(live_tris[..., :1])], -1)
    clip = jnp.einsum("ij,tvj->tvi", mvp, vh, precision="highest")
    pos_pass = rasterize_index(clip, cano_mesh.valid, img_h, img_w,
                               window=o.cano_window,
                               big_tri_capacity=o.live_big_tris,
                               max_candidates=o.raster_max_candidates)
    row("live_pos_candidates", int(pos_pass.n_candidates),
        o.raster_max_candidates or max(o.max_tris, 1 << 16))
    row("live_big_tris", int(pos_pass.n_big), o.live_big_tris)

    # --- recon hierarchy + mesh ------------------------------------------
    # staged path (timer) on purpose: per-stage programs compile in
    # minutes on the CPU platform where the one fused whole-frame
    # program would not
    from avatarcap_tpu.utils.timers import StageTimer
    res_full = cap.process_frame(item, w_recon=True, w_nerf=False,
                                 inferred_normal=np.asarray(inferred_normal),
                                 neck_vertex_idx=neck_vertex_idx, camera=cam,
                                 timer=StageTimer())
    recon_mesh = res_full["recon_mesh"]
    row("recon_tris", int(recon_mesh.num_tris),
        o.recon_max_tris or o.max_tris)
    if use_hier:
        img = jnp.concatenate(
            [res_full["front_merged_normal"],
             res_full["back_avatar_normal"]], axis=-1)[None]
        feat_map = cap.recon.apply(cap.recon_vars, img,
                                   method=ReconNetwork.get_feat_maps)

        def vf_recon(pts, fidx):
            return cap.recon.apply(
                cap.recon_vars, feat_map, pts[None],
                statics.cano_smpl_center[None],
                method=ReconNetwork.decode_points)[0]

        prior01 = 0.5 * (g.prior_volume + 1.0)
        rvol, _, rn_r = hierarchical_volume(
            vf_recon, g, statics.cano_bounds, 0.5 * (g.c_prior + 1.0),
            prior01, 0.5, o.hier_alpha,
            o.recon_refine_capacity or o.refine_capacity, with_stats=True)
        row("recon_refine_nodes", rn_r,
            o.recon_refine_capacity or o.refine_capacity)
        row("recon_active_cubes", _active_cubes(rvol, g.vol_res, 0.5),
            o.recon_max_active or o.max_active)
    stats["frame_overflow"] = bool(np.asarray(res_full["overflow"]))
    return stats


def main():
    import os

    import jax

    # The container sitecustomize force-registers the axon TPU platform
    # OVER the JAX_PLATFORMS env var; only the programmatic update
    # honors a requested CPU run (same dance as __graft_entry__) —
    # without it a tunnel outage hangs the pre-flight on device init.
    if os.environ.get("JAX_PLATFORMS"):
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

    from avatarcap_tpu.tools.bench_workloads import build_capture_env
    from avatarcap_tpu.utils.timers import enable_compile_cache

    enable_compile_cache()
    env = build_capture_env()
    stats = capacity_stats(env["capture"], env["item"],
                           inferred_normal=env["inferred_normal"],
                           cam=env["cam"])
    print(json.dumps(stats, indent=1))


if __name__ == "__main__":
    main()
