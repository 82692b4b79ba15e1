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
