"""Device-side software rasterization (no OpenGL, no host round-trips)."""

from avatarcap_tpu.render.camera import (  # noqa: F401
    gl_perspective_projection_matrix, gl_orthographic_projection_matrix,
    calc_front_mv, calc_back_mv)
from avatarcap_tpu.render.raster import rasterize  # noqa: F401
from avatarcap_tpu.render.visualize import (  # noqa: F401
    render_cano_mesh, render_live_mesh)
