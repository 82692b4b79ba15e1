"""Neural network modules (flax.linen), NHWC layout, bfloat16-ready."""

from avatarcap_tpu.models.mlp import MLP, OffsetDecoder  # noqa: F401
from avatarcap_tpu.models.unets import (  # noqa: F401
    UnetNoCond5DS, UnetNoCond6DS, UnetNoCond7DS)
from avatarcap_tpu.models.avatar import (  # noqa: F401
    DoubleTNet, WarpingField, GeoTexAvatar, sample_weight_volume)
from avatarcap_tpu.models.hourglass import HGFilter  # noqa: F401
from avatarcap_tpu.models.recon import ReconNetwork  # noqa: F401
from avatarcap_tpu.models.pix2pix import GlobalGenerator  # noqa: F401
