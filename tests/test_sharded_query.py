"""Point-sharded grid query over the 8-device virtual mesh (SURVEY §2.3:
shard the compacted grid points, all-gather occupancy slabs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from conftest import make_toy_smpl_params


def _setup():
    from avatarcap_tpu.body.smpl import smpl_forward, canonical_pose
    from avatarcap_tpu.models.avatar import GeoTexAvatar
    from avatarcap_tpu.pipeline.avatar import AvatarStatics
    from avatarcap_tpu.pipeline.capture import CaptureGrid
    from avatarcap_tpu.ops.knn import knn

    params = make_toy_smpl_params()
    cano = smpl_forward(params, jnp.asarray(canonical_pose()), jnp.zeros(10))
    v = np.asarray(cano.vertices)
    lo = v.min(0) - 0.1
    hi = v.max(0) + 0.1
    wv = np.zeros((8, 8, 8, 24), np.float32)
    wv[..., 0] = 1.0
    statics = AvatarStatics(jnp.asarray(wv), cano.vertices,
                            jnp.asarray(params.weights),
                            jnp.asarray(np.stack([lo, hi])),
                            jnp.asarray(0.5 * (lo + hi)))
    vol_res = (16, 16, 16)
    lin = [np.linspace(0, 1, r, dtype=np.float32) for r in vol_res]
    g = np.stack(np.meshgrid(*lin, indexing="ij"), -1).reshape(-1, 3)
    pts = g * (hi - lo) + lo
    d2, _ = knn(jnp.asarray(pts), cano.vertices, k=1)
    flag = np.asarray(d2[:, 0] < 0.15 ** 2)
    idx = np.where(flag)[0].astype(np.int32)
    # deliberately NOT a multiple of 8: exercises the pad path
    grid = CaptureGrid(
        valid_pts=jnp.asarray(pts[idx]),
        valid_idx=jnp.asarray(idx),
        prior_volume=jnp.asarray(
            np.where(flag, 0.0, -1.0).astype(np.float32)),
        vol_res=vol_res)

    module = GeoTexAvatar(if_type="sdf")
    pos_map = jnp.zeros((1, 128, 128, 6), jnp.float32)
    variables = jax.jit(module.init)(
        jax.random.PRNGKey(0), jnp.zeros((1, 8, 3)), pos_map,
        statics.cano_smpl_center[None])
    return module, variables, statics, grid, pos_map


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_matches_single_device():
    from avatarcap_tpu.parallel.mesh import make_mesh
    from avatarcap_tpu.parallel.grid_query import ShardedGridQuery
    from avatarcap_tpu.pipeline.avatar import (compute_pose_features,
                                               query_occupancy)

    module, variables, statics, grid, pos_map = _setup()
    assert grid.valid_pts.shape[0] % 8 != 0  # pad path exercised

    mesh = make_mesh(jax.devices()[:8])
    sharded = ShardedGridQuery(module, variables, statics, grid, mesh)
    vol_sharded = np.asarray(sharded(pos_map))

    feat, _ = compute_pose_features(module, variables, pos_map)
    out, _ = query_occupancy(module, variables, grid.valid_pts[None], feat,
                             statics)
    vol_ref = np.asarray(grid.prior_volume.at[grid.valid_idx].set(
        out["cano_pts_ov"][0, :, 0], mode="drop"))

    assert vol_sharded.shape == vol_ref.shape
    np.testing.assert_allclose(vol_sharded, vol_ref, atol=1e-5)
    # the sharded result must actually differ from the prior inside the body
    assert not np.allclose(vol_sharded, np.asarray(grid.prior_volume))
