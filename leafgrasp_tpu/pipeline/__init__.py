"""Frame pipeline + host shell."""

from leafgrasp_tpu.pipeline.frame import (select_grasp, make_frame_fn,
                                          FrameResult)
from leafgrasp_tpu.pipeline.fusion import fuse_candidates, FusionResult
from leafgrasp_tpu.pipeline.ingest import (GraspService,
                                           format_result_message,
                                           leaf_candidates)
from leafgrasp_tpu.pipeline.visualizer import LeafVisualizer, \
    generate_color

__all__ = ["select_grasp", "make_frame_fn", "FrameResult",
           "fuse_candidates", "FusionResult", "GraspService",
           "format_result_message", "leaf_candidates", "LeafVisualizer",
           "generate_color"]
