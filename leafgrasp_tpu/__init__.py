"""leafgrasp_tpu: TPU-native leaf grasp-point selection framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of
Srecharan/Leaf-Grasping-Vision-ML (see SURVEY.md): Pareto-optimal leaf
selection, fused per-pixel geometric grasp scoring, a self-supervised
attention CNN, confidence-weighted CV(+)ML fusion, and a VLA hybrid
re-ranking layer -- all designed for TPU (static shapes, device meshes,
fused kernels) rather than translated from the CUDA/OpenCV original.
"""

__version__ = "0.1.0"

from leafgrasp_tpu.config import (PipelineConfig, DEFAULT_CONFIG,
                                  CameraConfig, FrameConfig,
                                  load_config, save_config)

__all__ = ["PipelineConfig", "DEFAULT_CONFIG", "CameraConfig", "FrameConfig",
           "load_config", "save_config", "__version__"]
