"""Capture pipeline smoke test: all 4 stages on the toy subject."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_toy_smpl_params


@pytest.fixture(scope="module")
def capture_env():
    from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.models.recon import ReconNetwork
    from avatarcap_tpu.pipeline.avatar import AvatarStatics
    from avatarcap_tpu.pipeline.capture import (
        AvatarCapture, CaptureGrid, CaptureOptions)
    from avatarcap_tpu.ops.knn import knn
    from avatarcap_tpu.ops.inside import points_inside_mesh

    params = make_toy_smpl_params()
    shape = np.zeros(10, np.float32)
    cano = smpl_forward(params, jnp.asarray(canonical_pose()),
                        jnp.asarray(shape))
    v = np.asarray(cano.vertices)
    lo = v.min(0) - np.array([0.05, 0.05, 0.15], np.float32)
    hi = v.max(0) + np.array([0.05, 0.05, 0.15], np.float32)
    bounds = np.stack([lo, hi])
    wv = np.zeros((16, 16, 16, params.num_joints), np.float32)
    wv[..., 0] = 1.0
    statics = AvatarStatics(
        weight_volume=jnp.asarray(wv),
        cano_smpl_vertices=cano.vertices,
        smpl_skinning_weights=jnp.asarray(params.weights),
        cano_bounds=jnp.asarray(bounds),
        cano_smpl_center=jnp.asarray(0.5 * (lo + hi)))

    # test grid (small): valid = near body, prior = inside sign
    vol_res = (48, 48, 32)
    lin = [np.linspace(0, 1, r, dtype=np.float32) for r in vol_res]
    g = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    pts = g * (hi - lo) + lo
    d2, _ = knn(jnp.asarray(pts), cano.vertices, k=1)
    valid_flag = np.asarray(d2[:, 0] < 0.1 ** 2)
    tris = v[params.faces]
    inside = np.asarray(points_inside_mesh(jnp.asarray(pts),
                                           jnp.asarray(tris)))
    prior = np.where(valid_flag, 0.0,
                     2.0 * inside.astype(np.float32) - 1.0)
    idx = np.where(valid_flag)[0].astype(np.int32)
    pad = (-len(idx)) % 4096
    valid_idx = np.pad(idx, (0, pad), constant_values=len(pts))
    valid_pts = np.concatenate([pts[idx], np.zeros((pad, 3), np.float32)])

    grid = CaptureGrid(jnp.asarray(valid_pts), jnp.asarray(valid_idx),
                       jnp.asarray(prior.astype(np.float32)), vol_res)

    module = GeoTexAvatar(if_type="sdf")
    pos_map = jnp.zeros((1, 128, 128, 6))
    avatar_vars = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)), pos_map,
        statics.cano_smpl_center[None])

    recon = ReconNetwork()
    recon_vars = jax.jit(recon.init)(
        jax.random.PRNGKey(1), jnp.zeros((1, 128, 128, 6)),
        jnp.zeros((1, 8, 3)), jnp.zeros((1, 3)))

    options = CaptureOptions(max_tris=1 << 15, max_active=1 << 13,
                             render_res=128, raster_window=6,
                             fusion_iters=4, n_samples=4)
    capture = AvatarCapture(module, avatar_vars, statics, grid,
                            recon=recon, recon_vars=recon_vars,
                            options=options)

    item = {
        "live_smpl_v": v.astype(np.float32),
        "cano2live_jnt_mats": np.tile(np.eye(4, dtype=np.float32),
                                      (params.num_joints, 1, 1)),
        "smpl_pos_map": np.zeros((128, 128, 6), np.float32),
        "w2c_RT": np.eye(4, dtype=np.float32)
        @ np.diag([1, 1, 1, 1.0]).astype(np.float32),
    }
    # camera in front of the body looking +z (real-camera convention)
    item["w2c_RT"][2, 3] = 2.0
    cam = {"fx": 200.0, "fy": 200.0, "cx": 64.0, "cy": 64.0}
    return capture, item, cam


class TestCapture:
    def test_avatar_only(self, capture_env):
        capture, item, cam = capture_env
        res = capture.process_frame(item, w_recon=False, w_nerf=False)
        assert int(res["cano_mesh"].num_tris) > 100
        # NOTE: this fixture's implicit field is an UNTRAINED random
        # network, so its iso-surface is noise that crosses far more
        # cells than any real body — the overflow bit is legitimately
        # set here. The no-overflow case is asserted on the TRAINED
        # golden subject (test_golden_capture) and on the bench body
        # (bench.py full_frame_overflow).
        assert "overflow" in res

    def test_overflow_bit_trips_on_tight_capacities(self, capture_env):
        """The per-frame aggregate overflow flag reports dropped work from
        ANY static capacity (MC triangle budget here), not just the mesh
        its own stage returns."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        capture, item, cam = capture_env
        opts = dataclasses.replace(capture.opt, max_tris=64, max_active=64)
        tight = AvatarCapture(capture.avatar, capture.avatar_vars,
                              capture.statics, capture.grid, options=opts)
        res = tight.process_frame(item, w_recon=False, w_nerf=False)
        assert bool(np.asarray(res["overflow"]))

    def test_recon_capacities_apply(self, capture_env):
        """recon_max_tris/active size the RECON mesh independently of the
        avatar mesh (both downstream walks are paid at static capacity)."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        capture, item, cam = capture_env
        opts = dataclasses.replace(capture.opt,
                                   recon_max_tris=1 << 14,
                                   recon_max_active=1 << 12)
        cap2 = AvatarCapture(capture.avatar, capture.avatar_vars,
                             capture.statics, capture.grid,
                             recon=capture.recon,
                             recon_vars=capture.recon_vars, options=opts)
        inferred = np.zeros((128, 128, 3), np.float32)
        inferred[32:96, 32:96] = [0.0, 0.0, -1.0]
        res = cap2.process_frame(item, w_recon=True, w_nerf=False,
                                 inferred_normal=inferred,
                                 neck_vertex_idx=0, camera=cam)
        assert res["recon_mesh"].vertices.shape[0] == 3 * (1 << 14)
        assert res["cano_mesh"].vertices.shape[0] == 3 * capture.opt.max_tris
        assert res["live_recon_mesh"].vertices.shape[0] == 3 * (1 << 14)
        assert not bool(np.asarray(res["recon_mesh"].overflow))

        # a sized-down recon refine capacity (still >= the refined node
        # count) must reproduce the recon mesh EXACTLY — the capacity
        # only bounds how many empty slots the refine kernel walks
        cap3 = AvatarCapture(capture.avatar, capture.avatar_vars,
                             capture.statics, capture.grid,
                             recon=capture.recon,
                             recon_vars=capture.recon_vars,
                             options=dataclasses.replace(
                                 opts, recon_refine_capacity=1 << 16))
        res3 = cap3.process_frame(item, w_recon=True, w_nerf=False,
                                  inferred_normal=inferred,
                                  neck_vertex_idx=0, camera=cam)
        assert not bool(np.asarray(res3["recon_mesh"].overflow))
        assert (int(res3["recon_mesh"].num_tris)
                == int(res["recon_mesh"].num_tris))
        np.testing.assert_array_equal(
            np.asarray(res3["recon_mesh"].vertices),
            np.asarray(res["recon_mesh"].vertices))
        front, back = res["cano_phong"]
        assert np.asarray(front).shape == (128, 128, 3)
        # live == cano here (identity pose): meshes coincide
        n = 3 * int(res["cano_mesh"].num_tris)
        np.testing.assert_allclose(
            np.asarray(res["live_mesh"].vertices[:n]),
            np.asarray(res["cano_mesh"].vertices[:n]), atol=1e-4)

    @pytest.mark.slow
    def test_full_recon_and_nerf(self, capture_env):
        capture, item, cam = capture_env
        normal_img = np.zeros((128, 128, 3), np.float32)
        normal_img[32:96, 32:96] = [0.0, 0.0, -1.0]  # facing camera
        res = capture.process_frame(item, w_recon=True, w_nerf=True,
                                    inferred_normal=normal_img,
                                    neck_vertex_idx=0, camera=cam)
        assert "recon_mesh" in res and "live_recon_mesh" in res
        assert int(res["recon_mesh"].num_tris) > 0
        assert np.isfinite(np.asarray(res["front_merged_normal"])).all()
        assert "avatar_colors" in res and "recon_colors" in res
        colors = np.asarray(res["avatar_colors"])
        assert np.all(colors >= 0) and np.all(colors <= 1)

    @pytest.mark.slow
    def test_nerf_dedup_matches_per_slot(self, capture_env):
        """nerf_unique_capacity: one ray per UNIQUE mesh vertex, colors
        scattered back to slots. Same queries as the per-slot path except
        the ray normal is one shared-vertex representative instead of
        each slot's per-cube normal (sub-degree apart) — colors must
        agree to that approximation, and slots sharing a vertex must get
        IDENTICAL colors."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        capture, item, cam = capture_env
        opts = dataclasses.replace(capture.opt,
                                   nerf_unique_capacity=1 << 15)
        cap2 = AvatarCapture(capture.avatar, capture.avatar_vars,
                             capture.statics, capture.grid, options=opts)
        res_d = cap2.process_frame(item, w_recon=False, w_nerf=True)
        res_s = capture.process_frame(item, w_recon=False, w_nerf=True)
        mesh = res_d["cano_mesh"]
        n3 = 3 * int(mesh.num_tris)
        cd = np.asarray(res_d["avatar_colors"])[:n3]
        cs = np.asarray(res_s["avatar_colors"])[:n3]
        ids = np.asarray(mesh.edge_ids)[:n3]
        # identical colors within a shared vertex
        order = np.argsort(ids, kind="stable")
        same = ids[order][1:] == ids[order][:-1]
        dvc = np.abs(cd[order][1:] - cd[order][:-1]).max(-1)
        assert dvc[same].max() == 0.0
        # agreement with the per-slot path up to the representative-
        # normal approximation
        dev = np.abs(cd - cs).max(-1)
        assert np.median(dev) < 5e-3, float(np.median(dev))
        assert dev.mean() < 2e-2, float(dev.mean())
        assert not bool(np.asarray(res_d["overflow"])) or \
            bool(np.asarray(res_s["overflow"]))  # dedup adds no overflow

    @pytest.mark.slow
    def test_recon_direct_colors(self, capture_env):
        """recon_color_mode='direct' integrates the color ray AT each
        unique recon vertex instead of NN-transferring from the avatar
        soup (CaptureOptions.recon_color_mode). Both sample the same
        smooth color field — on this toy body the recon surface sits
        within ~a voxel of the avatar surface, so the two modes must
        agree statistically (per-vertex they differ by the field's
        variation over the NN hop), and direct colors must be valid
        exactly on valid soup slots."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        capture, item, cam = capture_env
        normal_img = np.zeros((128, 128, 3), np.float32)
        normal_img[32:96, 32:96] = [0.0, 0.0, -1.0]
        base = dataclasses.replace(
            capture.opt, nerf_unique_capacity=1 << 15,
            recon_unique_capacity=1 << 15)
        kw = dict(w_recon=True, w_nerf=True, inferred_normal=normal_img,
                  neck_vertex_idx=0, camera=cam)
        caps = {}
        for mode in ("nn", "direct"):
            opts = dataclasses.replace(base, recon_color_mode=mode)
            cap = AvatarCapture(capture.avatar, capture.avatar_vars,
                                capture.statics, capture.grid,
                                recon=capture.recon,
                                recon_vars=capture.recon_vars,
                                options=opts)
            caps[mode] = cap.process_frame(dict(item), **kw)
        rm = caps["nn"]["recon_mesh"]
        n3 = 3 * int(rm.num_tris)
        assert n3 > 0
        c_nn = np.asarray(caps["nn"]["recon_colors"])[:n3]
        c_dir = np.asarray(caps["direct"]["recon_colors"])[:n3]
        assert np.isfinite(c_dir).all()
        assert np.all(c_dir >= 0) and np.all(c_dir <= 1)
        # same color field sampled ~an NN-hop apart: means agree
        assert abs(c_dir.mean() - c_nn.mean()) < 0.05, (
            c_dir.mean(), c_nn.mean())

    def test_render_live(self, capture_env):
        from avatarcap_tpu.render.camera import calc_front_mv, calc_back_mv
        capture, item, cam = capture_env
        res = capture.process_frame(item, w_recon=False)
        live = res["live_mesh"]
        n = 3 * int(live.num_tris)
        lv = np.asarray(live.vertices[:n])
        fmv = calc_front_mv(lv, rot_x_angle=-0.15)
        bmv = calc_back_mv(lv, rot_x_angle=-0.15)
        f, b = capture.render_live(live, jnp.asarray(fmv), jnp.asarray(bmv))
        f = np.asarray(f)
        assert f.shape == (128, 128, 3)
        # phong render has both body pixels and white background
        assert (f < 0.99).any() and (f > 0.99).any()


class TestCapacityStats:
    @pytest.mark.slow
    def test_counts_against_capacities(self, capture_env):
        """tools/capacity_stats measures the data-dependent workload of
        every static capacity; counts are positive and capacities echo
        the options (the off-chip pre-flight for on-chip runs)."""
        from avatarcap_tpu.tools.capacity_stats import capacity_stats
        capture, item, cam = capture_env
        inferred = np.zeros((128, 128, 3), np.float32)
        inferred[32:96, 32:96] = [0.0, 0.0, -1.0]
        stats = capacity_stats(capture, item, inferred_normal=inferred,
                               cam=cam)
        for key in ("avatar_refine_nodes", "avatar_active_cubes",
                    "avatar_tris", "cano_pair_candidates",
                    "live_pos_candidates", "recon_tris",
                    "recon_refine_nodes", "recon_active_cubes"):
            assert stats[key]["count"] > 0, key
            assert stats[key]["capacity"] > 0, key
        # big-tri counts may legitimately be 0 (sub-window MC triangles)
        for key in ("cano_big_tris", "live_big_tris"):
            assert stats[key]["count"] >= 0, key
            assert stats[key]["capacity"] > 0, key
        assert stats["avatar_tris"]["capacity"] == capture.opt.max_tris
        assert (stats["avatar_refine_nodes"]["capacity"]
                == capture.opt.refine_capacity)
        # the noise-field fixture overflows MC capacity (see
        # test_avatar_only): the measured count shows WHY the frame's
        # aggregate bit is set
        assert stats["frame_overflow"] is True
        assert (stats["avatar_active_cubes"]["count"]
                > stats["avatar_active_cubes"]["capacity"]
                or stats["avatar_tris"]["count"] >= capture.opt.max_tris)


class TestHierarchicalQuery:
    @pytest.mark.slow
    def test_hier_matches_flat(self, capture_env):
        """Coarse-to-fine query reproduces the brute-force surface:
        near-zero Chamfer between the two avatar meshes."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        from avatarcap_tpu.utils.metrics import chamfer_distance

        capture, item, cam = capture_env
        flat = AvatarCapture(
            capture.avatar, capture.avatar_vars, capture.statics,
            capture.grid, recon=capture.recon,
            recon_vars=capture.recon_vars,
            options=dataclasses.replace(capture.opt,
                                        hierarchical_query=False))
        r_h = capture.process_frame(item, w_recon=False, w_nerf=False)
        r_f = flat.process_frame(item, w_recon=False, w_nerf=False)
        mh, mf = r_h["cano_mesh"], r_f["cano_mesh"]
        nh, nf = int(mh.num_tris), int(mf.num_tris)
        assert nh > 100 and nf > 100
        vh = np.asarray(mh.vertices[: 3 * nh])
        vf = np.asarray(mf.vertices[: 3 * nf])
        d = float(chamfer_distance(jnp.asarray(vh), jnp.asarray(vf)))
        # voxel ~ 2-4 cm on this tiny grid; surfaces must agree to well
        # under a voxel (identical where the coarse level is refined)
        assert d < 0.01, d


class TestUniqueColorTransfer:
    @pytest.mark.slow
    def test_unique_transfer_matches_brute_nn(self, capture_env):
        """recon_unique_capacity: the deduped unique-vs-unique NN color
        transfer must give every valid recon soup slot the color of its
        nearest VALID avatar vertex — the same answer as a brute NN over
        the valid vertices (the padded-soup path additionally searches
        zero-filled padding slots, which is a superset; deduping fixes
        that too)."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        capture, item, cam = capture_env
        opts = dataclasses.replace(capture.opt,
                                   recon_max_tris=1 << 13,
                                   recon_max_active=1 << 11,
                                   nerf_unique_capacity=1 << 15,
                                   recon_unique_capacity=1 << 13)
        cap2 = AvatarCapture(capture.avatar, capture.avatar_vars,
                             capture.statics, capture.grid,
                             recon=capture.recon,
                             recon_vars=capture.recon_vars, options=opts)
        inferred = np.zeros((128, 128, 3), np.float32)
        inferred[32:96, 32:96] = [0.0, 0.0, -1.0]
        res = cap2.process_frame(item, w_recon=True, w_nerf=True,
                                 inferred_normal=inferred,
                                 neck_vertex_idx=0, camera=cam)
        amesh, rmesh = res["cano_mesh"], res["recon_mesh"]
        n_a = 3 * int(amesh.num_tris)
        n_r = 3 * int(rmesh.num_tris)
        assert n_r > 0
        av = np.asarray(amesh.vertices)[:n_a]
        ac = np.asarray(res["avatar_colors"])[:n_a]
        rv = np.asarray(rmesh.vertices)[:n_r]
        rc = np.asarray(res["recon_colors"])[:n_r]
        # subsampled brute NN over the VALID vertices only
        rng = np.random.RandomState(0)
        sel = rng.choice(n_r, size=min(256, n_r), replace=False)
        d2 = ((rv[sel][:, None, :] - av[None, :, :]) ** 2).sum(-1)
        # the deduped transfer searches with precision='high' (bf16x3,
        # ~1e-6 relative d2 error): near-tie NN picks between DISTINCT
        # avatar vertices can legitimately flip vs this float64 brute
        # force, so only compare queries whose best-vs-second margin
        # (among distinct positions) exceeds the tie band
        srt = np.sort(d2, axis=1)
        second = np.where((srt - srt[:, :1]) > 1e-9, srt,
                          np.inf).min(axis=1)
        decisive = (second - srt[:, 0]) > 1e-5
        expect = ac[d2.argmin(1)]
        got = rc[sel]
        # ties between coincident soup copies of one vertex carry the
        # SAME color, so colors (not indices) must match exactly
        np.testing.assert_allclose(got[decisive], expect[decisive],
                                   atol=1e-6)
        assert decisive.sum() > len(sel) // 2  # the comparison has teeth

    @pytest.mark.slow
    def test_recon_unique_overflow_reported(self, capture_env):
        """An undersized recon_unique_capacity must raise the frame
        overflow bit instead of silently mis-coloring."""
        import dataclasses
        from avatarcap_tpu.pipeline.capture import AvatarCapture
        capture, item, cam = capture_env
        opts = dataclasses.replace(capture.opt,
                                   nerf_unique_capacity=1 << 15,
                                   recon_unique_capacity=8)
        cap2 = AvatarCapture(capture.avatar, capture.avatar_vars,
                             capture.statics, capture.grid,
                             recon=capture.recon,
                             recon_vars=capture.recon_vars, options=opts)
        inferred = np.zeros((128, 128, 3), np.float32)
        inferred[32:96, 32:96] = [0.0, 0.0, -1.0]
        res = cap2.process_frame(item, w_recon=True, w_nerf=True,
                                 inferred_normal=inferred,
                                 neck_vertex_idx=0, camera=cam)
        assert bool(np.asarray(res["overflow"]))


class TestAnchoredNearFlags:
    def test_bounded_deviation_vs_exact(self):
        """near_flag_mode='ray': anchored-interp flags may differ from
        exact per-sample flags only where the true distance is within
        the interpolation error bound (half the anchor gap) of the 8 cm
        threshold."""
        from avatarcap_tpu.pipeline.capture import anchored_near_flags
        from avatarcap_tpu.ops.knn import knn
        rng = np.random.RandomState(0)
        verts = jnp.asarray(
            rng.standard_normal((800, 3)).astype(np.float32) * 0.3)
        # rays like the color integral: origin v + n, direction -n
        v = np.asarray(verts)[rng.choice(800, 256)] \
            + rng.standard_normal((256, 3)).astype(np.float32) * 0.02
        n = rng.standard_normal((256, 3)).astype(np.float32)
        n /= np.linalg.norm(n, axis=-1, keepdims=True)
        ro = jnp.asarray(v + n)
        rd = jnp.asarray(-n)
        near, far, S, A = 1.0 - 0.02, 1.0 + 0.05, 64, 4
        flags = np.asarray(anchored_near_flags(ro, rd, near, far, S,
                                               verts, n_anchors=A))
        z = np.linspace(near, far, S, dtype=np.float32)
        pts = np.asarray(ro)[:, None, :] \
            + np.asarray(rd)[:, None, :] * z[None, :, None]
        d2, _ = knn(jnp.asarray(pts.reshape(-1, 3)), verts, k=1)
        d = np.sqrt(np.asarray(d2)[:, 0]).reshape(256, S)
        exact = d < 0.08
        gap = (far - near) / (A - 1)
        boundary = np.abs(d - 0.08) <= 0.5 * gap + 1e-6
        mism = flags != exact
        assert not np.any(mism & ~boundary), (
            int(np.sum(mism & ~boundary)), float(np.abs(d[mism] - 0.08).max()))
        # and the anchored flags are not degenerate
        assert flags.any() and (~flags).any()
