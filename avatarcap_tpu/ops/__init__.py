"""Pure-JAX math ops shared across the framework."""

from avatarcap_tpu.ops.se3 import (  # noqa: F401
    axis_angle_to_matrix,
    rigid_inverse,
)
from avatarcap_tpu.ops.embed import positional_encoding, embed_dim  # noqa: F401
from avatarcap_tpu.ops.grid_sample import (  # noqa: F401
    grid_sample_2d,
    grid_sample_3d,
)
from avatarcap_tpu.ops.volume_render import raw2outputs  # noqa: F401
from avatarcap_tpu.ops.rays import get_rays, get_near_far  # noqa: F401
from avatarcap_tpu.ops.knn import knn, approx_lbs_weights  # noqa: F401
