"""Jitted capture/training pipelines composed from models + ops."""

from avatarcap_tpu.pipeline.avatar import (  # noqa: F401
    AvatarStatics, FrameInputs, avatar_forward, render_rays,
    query_occupancy)
