"""Headline benchmark: GeoTexAvatar inference (BASELINE config #1).

Single canonical pose: pose U-Net + warp field + implicit template over a
128^3 grid, then device marching cubes — end-to-end on one chip. Prints ONE
JSON line. `value` is implicit-query throughput in Mpts/s (the primary
speed metric from BASELINE.md); `vs_baseline` is the fraction of the 1 s
frame budget this stage leaves (north star: full 512^2-RGB->mesh < 1 s/frame),
i.e. 1.0 / (seconds for grid eval + marching cubes), >1 is better than
budget-parity for this stage.

NOTE (axon): jax.block_until_ready does not block on the tunneled TPU
platform; timings force a scalar readback.
"""

import json
import sys
import time
import os

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
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
        pf = grid_pose_features(feat, statics, (res, res, res))
        out = warp_template_query_fused(packed["offset"],
                                        packed["template"], pts, pf)
        return out["occ"][:, 0].reshape(res, res, res)

    @jax.jit
    def mc_fn(vol):
        voxel = (statics.cano_bounds[1] - statics.cano_bounds[0]) / res
        mesh = marching_tets(vol, 0.0, statics.cano_bounds[0], voxel,
                             max_tris=1 << 19, max_active=1 << 17)
        return mesh.num_tris

    # warm up (compile)
    vol = query_fn(variables, packed, pts, frame.smpl_pos_map)
    nt = mc_fn(vol)
    _ = int(nt)

    iters = 10
    t0 = time.time()
    for _ in range(iters):
        vol = query_fn(variables, packed, pts, frame.smpl_pos_map)
        nt = mc_fn(vol)
    _ = int(nt)  # forced readback (axon: block_until_ready lies)
    dt = (time.time() - t0) / iters

    mpts_per_s = n_pts / dt / 1e6
    out = {
        "metric": "geotexavatar_128grid_implicit_query_Mpts_per_s",
        "value": round(mpts_per_s, 3),
        "unit": "Mpts/s",
        "vs_baseline": round(1.0 / dt, 3),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
