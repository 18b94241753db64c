"""Host IO: frame bus, scenes, replay, QA tools."""

from leafgrasp_tpu.io.framebus import FrameBus, native_available
from leafgrasp_tpu.io.framelog import FrameLogWriter, FrameLogReader
from leafgrasp_tpu.io.scenes import make_leaf_scene, default_projection
from leafgrasp_tpu.io.replay import (decode_mask_buffer,
                                     decode_depth_buffer,
                                     color_keyed_to_ids, replay_directory)
from leafgrasp_tpu.io.tools import detect_midrib, angle_error, \
    quantify_angles

__all__ = ["FrameBus", "native_available",
           "FrameLogWriter", "FrameLogReader", "make_leaf_scene",
           "default_projection", "decode_mask_buffer",
           "decode_depth_buffer", "color_keyed_to_ids",
           "replay_directory", "detect_midrib", "angle_error",
           "quantify_angles"]
