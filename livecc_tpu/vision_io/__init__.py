from livecc_tpu.vision_io.budget import (
    VisionBudget,
    smart_resize,
    smart_nframes,
    strict_fps_sample,
    snap_timestamps_to_pts,
    linspace_sample,
    grid_thw_for,
    num_video_tokens,
    IMAGE_FACTOR,
    FRAME_FACTOR,
)
from livecc_tpu.vision_io.patchify import (
    patchify_video,
    device_preprocess,
    normalize_frames,
    IMAGE_MEAN,
    IMAGE_STD,
)

__all__ = [
    "VisionBudget", "smart_resize", "smart_nframes", "strict_fps_sample",
    "snap_timestamps_to_pts", "linspace_sample", "grid_thw_for", "num_video_tokens",
    "IMAGE_FACTOR", "FRAME_FACTOR",
    "patchify_video", "device_preprocess", "normalize_frames", "IMAGE_MEAN", "IMAGE_STD",
]
