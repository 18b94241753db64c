"""TPU-native geometry kernel library.

Pure-JAX, jit-able replacements for the reference's native third-party
ops (skfmm, OpenCV, cuDNN -- see SURVEY.md section 2.9), plus Pallas
fused kernels for the hot paths.
"""

from leafgrasp_tpu.ops.edt import edt, squared_edt, signed_edt
from leafgrasp_tpu.ops.morphology import (elliptical_kernel, rect_kernel,
                                          dilate, erode,
                                          morphological_boundary)
from leafgrasp_tpu.ops.conv import (gaussian_kernel, smooth_depth,
                                    sobel_gradients, flatness_from_depth,
                                    reflect_conv2d, SOBEL_X, SOBEL_Y)
from leafgrasp_tpu.ops.pareto import pareto_mask
from leafgrasp_tpu.ops.pca import (mask_orientation, min_area_rect,
                                   Orientation)
from leafgrasp_tpu.ops.components import leaf_stats, LeafStats
from leafgrasp_tpu.ops.topk import topk_min_distance, Candidates

__all__ = [
    "edt", "squared_edt", "signed_edt",
    "elliptical_kernel", "rect_kernel", "dilate", "erode",
    "morphological_boundary",
    "gaussian_kernel", "smooth_depth", "sobel_gradients",
    "flatness_from_depth", "reflect_conv2d", "SOBEL_X", "SOBEL_Y",
    "pareto_mask",
    "mask_orientation", "min_area_rect", "Orientation",
    "leaf_stats", "LeafStats",
    "topk_min_distance", "Candidates",
]
