"""Device-mesh sharding utilities."""

from avatarcap_tpu.parallel.mesh import (  # noqa: F401
    make_mesh, shard_batch, replicate)
