"""Avatar-conditioned canonical normal fusion."""

from avatarcap_tpu.fusion.normal_fusion import (  # noqa: F401
    canonicalize_normal_map, merge_normal_images, merge_normal_images_cover)
