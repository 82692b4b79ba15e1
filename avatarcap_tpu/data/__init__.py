"""Datasets and mesh/image I/O."""

from avatarcap_tpu.data.mesh_io import (  # noqa: F401
    load_obj, save_obj, save_ply, load_ply)
from avatarcap_tpu.data.dataset import AvatarCapDataset  # noqa: F401
