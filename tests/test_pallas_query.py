"""Pallas fused-query kernels: interpret-mode parity on the CPU platform.

Numerical parity against the flax XLA path; on real TPU hardware the same
kernels are exercised (and benchmarked) by bench.py and the capture
pipeline's fast path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from jax.experimental.pallas import tpu as pltpu

from conftest import make_toy_smpl_params


@pytest.fixture(scope="module")
def env():
    from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.pipeline.avatar import AvatarStatics

    params = make_toy_smpl_params()
    cano = smpl_forward(params, jnp.asarray(canonical_pose()),
                        jnp.zeros(10))
    v = np.asarray(cano.vertices)
    lo = v.min(0) - 0.1
    hi = v.max(0) + 0.1
    statics = AvatarStatics(
        weight_volume=jnp.zeros((8, 8, 8, 24)),
        cano_smpl_vertices=cano.vertices,
        smpl_skinning_weights=jnp.asarray(params.weights),
        cano_bounds=jnp.asarray(np.stack([lo, hi])),
        cano_smpl_center=jnp.asarray(0.5 * (lo + hi)))
    module = GeoTexAvatar(if_type="sdf")
    pos_map = jax.random.normal(jax.random.PRNGKey(7), (1, 128, 128, 6))
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)), pos_map,
        statics.cano_smpl_center[None])
    return module, variables, statics, pos_map


class TestFusedQueryInterpret:
    def test_matches_xla_path(self, env):
        from avatarcap_tpu.pipeline.avatar import (
            compute_pose_features, query_occupancy,
            query_occupancy_fused, pack_fused_query_weights)

        module, variables, statics, pos_map = env
        feat, _ = jax.jit(
            lambda v, x: compute_pose_features(module, v, x))(variables,
                                                              pos_map)
        packed = pack_fused_query_weights(variables)
        pts = jax.random.uniform(jax.random.PRNGKey(1), (1, 512, 3),
                                 minval=-0.2, maxval=0.2)
        ref, _ = jax.jit(lambda v, p, f: query_occupancy(
            module, v, p, f, statics))(variables, pts, feat)
        with pltpu.force_tpu_interpret_mode():
            got = query_occupancy_fused(packed, pts, feat, statics)
        # bf16 kernel vs f32(highest) XLA path: bf16-level agreement
        np.testing.assert_allclose(np.asarray(got["cano_pts_ov"]),
                                   np.asarray(ref["cano_pts_ov"]), atol=2e-2)
        np.testing.assert_allclose(np.asarray(got["nonrigid_offset"]),
                                   np.asarray(ref["nonrigid_offset"]),
                                   atol=2e-2)

    def test_grid_pose_features_match_general(self, env):
        from avatarcap_tpu.pipeline.avatar import grid_pose_features
        from avatarcap_tpu.ops.grid_sample import (
            sample_feature_map_at_points)

        module, variables, statics, pos_map = env
        feat = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 16))
        gs = (6, 5, 4)
        pf = grid_pose_features(feat, statics, gs)
        # reference: per-point bilinear fetch over the full grid
        lin = [jnp.linspace(0.0, 1.0, r) for r in gs]
        g = jnp.stack(jnp.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
        pts = g * (statics.cano_bounds[1] - statics.cano_bounds[0]) \
            + statics.cano_bounds[0]
        pts_c = pts - statics.cano_smpl_center[None]
        ref = sample_feature_map_at_points(
            jnp.moveaxis(feat, -1, 1), pts_c[None])[0]
        np.testing.assert_allclose(np.asarray(pf), np.asarray(ref),
                                   atol=1e-5)

    def test_grid_pose_features_compacted(self, env):
        from avatarcap_tpu.pipeline.avatar import grid_pose_features
        module, variables, statics, pos_map = env
        feat = jax.random.normal(jax.random.PRNGKey(4), (1, 64, 64, 16))
        gs = (6, 5, 4)
        full = grid_pose_features(feat, statics, gs)
        idx = jnp.asarray([0, 7, 23, 119], jnp.int32)
        sub = grid_pose_features(feat, statics, gs, idx)
        np.testing.assert_allclose(np.asarray(sub),
                                   np.asarray(full[idx]), atol=1e-6)


class TestRayColorKernel:
    def test_matches_chunked_compositing(self, env):
        """ray_color_query_fused == the chunked XLA compositing path
        (pipeline/capture.py:_nerf_ray_colors_fused's map body) on the
        same per-sample kernel outputs: sample gen + feature lerp +
        anchored near/bounds masks + raw2outputs recurrence."""
        from avatarcap_tpu.pipeline.avatar import pack_fused_query_weights
        from avatarcap_tpu.pipeline.capture import (anchor_distances,
                                                    anchored_near_flags)
        from avatarcap_tpu.ops.pallas_query import (
            ray_color_query_fused, warp_template_query_fused)

        module, variables, statics, pos_map = env
        packed = pack_fused_query_weights(variables)
        # the toy template's geo head is tiny-init (U(+-1e-5)) so alpha
        # would be ~0 along every ray; randomize it for a non-trivial
        # compositing comparison (both paths consume the same tuple)
        tpl = list(packed["template"])
        kg = jax.random.PRNGKey(5)
        tpl[16] = jax.random.normal(kg, tpl[16].shape).astype(tpl[16].dtype)
        tpl[17] = jnp.ones_like(tpl[17]) * 0.5
        packed = {"offset": packed["offset"], "template": tuple(tpl)}
        R, S, A = 192, 8, 4
        near, far = 1.0 - 0.02, 1.0 + 0.05
        key = jax.random.PRNGKey(11)
        k1, k2 = jax.random.split(key)
        base = statics.cano_smpl_vertices[
            jax.random.randint(k1, (R,), 0,
                               statics.cano_smpl_vertices.shape[0])]
        n = jax.random.normal(k2, (R, 3))
        n = n / jnp.linalg.norm(n, axis=-1, keepdims=True)
        ro, rd = base + n, -n        # samples land within +-5 cm of base
        pf0 = jax.random.normal(k1, (R, 64)).astype(jnp.bfloat16)
        pf1 = jax.random.normal(k2, (R, 64)).astype(jnp.bfloat16)
        danch = anchor_distances(ro, rd, near, far,
                                 statics.cano_smpl_vertices, n_anchors=A)

        with pltpu.force_tpu_interpret_mode():
            got = ray_color_query_fused(
                packed["offset"], packed["template"], ro, rd, pf0, pf1,
                danch, statics.cano_bounds, n_samples=S, near=near,
                far=far, tile=256)

            # reference: per-sample kernel outputs + XLA compositing
            t = jnp.linspace(0.0, 1.0, S)
            z = near * (1.0 - t) + far * t
            dz = jnp.concatenate([z[1:] - z[:-1], (z[-1] - z[-2])[None]])
            pts = (ro[:, None, :] + rd[:, None, :]
                   * z[None, :, None]).reshape(-1, 3)
            w = ((z - near) / (far - near)).astype(pf0.dtype)
            pf = (pf0[:, None, :] * (1.0 - w)[None, :, None]
                  + pf1[:, None, :] * w[None, :, None]).reshape(-1, 64)
            out = warp_template_query_fused(
                packed["offset"], packed["template"], pts, pf, tile=256)
            near_ok = anchored_near_flags(
                ro, rd, near, far, S, statics.cano_smpl_vertices,
                n_anchors=A).reshape(-1)
            wpts = pts + out["offset"]
            inside = jnp.all((wpts > statics.cano_bounds[0])
                             & (wpts < statics.cano_bounds[1]), axis=-1)
            sigma = jnp.where(inside & near_ok, out["alpha"][:, 0], 0.0)
            alpha = 1.0 - jnp.exp(-sigma.reshape(-1, S) * dz[None, :])
            trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
            trans = jnp.concatenate(
                [jnp.ones_like(trans[:, :1]), trans[:, :-1]], axis=-1)
            wts = alpha * trans
            rgb = out["rgb"].reshape(-1, S, 3)
            ref = jnp.einsum("rs,rsc->rc", wts, rgb)

        assert bool(jnp.any(ref > 1e-3)), "degenerate case: all rays empty"
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-3)
