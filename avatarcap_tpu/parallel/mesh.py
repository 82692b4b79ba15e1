"""Device mesh + sharding helpers.

The reference has no parallelism at all (single CUDA device, host chunk
loops — SURVEY §2.3). The TPU-native scaling axes are:

- **data**: training batches and video frames shard over devices; XLA
  inserts the gradient psum.
- **points**: the millions of canonical query points per frame shard over
  the same axis for inference (the analogue of the reference's 262,144-pt
  chunk loop, reference network/arch_avatar.py:366) — an all-gather
  reassembles per-shard occupancy slabs.

Everything rides jax.sharding + jit; no hand-written collectives needed
for this workload.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None, axis: str = "data") -> Mesh:
    """1-D mesh over all (or given) devices."""
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, tree, axis: str = "data", dim: int = 0):
    """Place a pytree with leading-dim sharding over the mesh axis."""
    def put(x):
        spec = [None] * x.ndim
        if x.ndim > dim and x.shape[dim] % mesh.shape[axis] == 0:
            spec[dim] = axis
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))
    return jax.tree.map(put, tree)


def shard_points(mesh: Mesh, pts, axis: str = "data"):
    """Shard (B, N, ...) point arrays over N (the big axis)."""
    return jax.tree.map(
        lambda x: jax.device_put(
            x, NamedSharding(mesh, P(None, axis))), pts)


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree (params, statics) over the mesh."""
    return jax.tree.map(
        lambda x: jax.device_put(x, NamedSharding(mesh, P())), tree)
