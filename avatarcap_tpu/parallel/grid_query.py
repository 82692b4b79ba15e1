"""Point-sharded single-frame grid query over a device mesh.

The second TPU scaling axis from SURVEY §2.3 (the first is data-parallel
frames): the millions of compacted near-SMPL canonical grid points of ONE
frame shard across chips — the analogue of the reference's 262,144-point
host chunk loop (reference network/arch_avatar.py:366-377). Params, pose
feature map, and the prior volume are replicated; each device evaluates
the warp+template query for its point slab, and the scatter into the
replicated occupancy volume makes XLA emit the all-gather of per-shard
occupancy slabs over ICI. No hand-written collectives.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from avatarcap_tpu.models.avatar import GeoTexAvatar
from avatarcap_tpu.pipeline.avatar import (
    AvatarStatics, compute_pose_features, query_occupancy)
from avatarcap_tpu.pipeline.capture import CaptureGrid


class ShardedGridQuery:
    """One-frame occupancy volume with points sharded over the mesh.

    Args:
      avatar, avatar_vars, statics, grid: as in AvatarCapture.
      mesh: device mesh; points shard over ``axis``.
    """

    def __init__(self, avatar: GeoTexAvatar, avatar_vars,
                 statics: AvatarStatics, grid: CaptureGrid, mesh: Mesh,
                 axis: str = "data"):
        self.mesh = mesh
        n_dev = mesh.shape[axis]

        # Pad the compacted point set to a multiple of the mesh size; the
        # pad scatters to the dropped out-of-bounds index.
        n = grid.valid_pts.shape[0]
        pad = (-n) % n_dev
        n_cells = int(np.prod(grid.vol_res))
        valid_pts = jnp.concatenate(
            [grid.valid_pts, jnp.zeros((pad, 3), grid.valid_pts.dtype)])
        valid_idx = jnp.concatenate(
            [grid.valid_idx,
             jnp.full((pad,), n_cells, grid.valid_idx.dtype)])

        repl = NamedSharding(mesh, P())
        shard = NamedSharding(mesh, P(axis))
        self._vars = jax.device_put(avatar_vars, repl)
        self._statics = jax.device_put(statics, repl)
        self._prior = jax.device_put(grid.prior_volume, repl)
        self._pts = jax.device_put(valid_pts, shard)
        self._idx = jax.device_put(valid_idx, shard)
        self._repl = repl

        @functools.partial(
            jax.jit,
            in_shardings=(repl, repl, shard, shard, repl, repl),
            out_shardings=repl)
        def volume_fn(avatar_vars, statics, pts, idx, prior, pos_map):
            feat, _ = compute_pose_features(avatar, avatar_vars, pos_map)
            out, _ = query_occupancy(avatar, avatar_vars, pts[None], feat,
                                     statics)
            occ = out["cano_pts_ov"][0, :, 0]
            # scatter sharded slabs into the replicated volume -> XLA
            # all-gathers the per-device contributions over ICI
            return prior.at[idx].set(occ, mode="drop")

        self._volume_fn = volume_fn

    def __call__(self, pos_map) -> jnp.ndarray:
        """pos_map: (1, H, W, 6) -> flat occupancy volume (X*Y*Z,),
        replicated on every device."""
        pos_map = jax.device_put(jnp.asarray(pos_map), self._repl)
        return self._volume_fn(self._vars, self._statics, self._pts,
                               self._idx, self._prior, pos_map)
