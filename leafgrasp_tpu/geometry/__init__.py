"""Geometric perception core: leaf selection, grasp scoring, 3D."""

from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf, \
    LeafSelection
from leafgrasp_tpu.geometry.grasp_scorer import (compute_grasp_scores,
                                                 GraspScores,
                                                 tip_penalty_map,
                                                 SCORE_CHANNELS)
from leafgrasp_tpu.geometry.lift3d import (lift_to_3d, project_to_2d,
                                           pre_grasp_point, PreGrasp)
from leafgrasp_tpu.geometry.patches import (extract_patches,
                                            assemble_cnn_inputs)
from leafgrasp_tpu.geometry.sdf_helper import (global_sdf, leaf_sdf,
                                               approach_vector,
                                               isolation_metric)

__all__ = [
    "select_optimal_leaf", "LeafSelection", "compute_grasp_scores",
    "GraspScores", "tip_penalty_map", "SCORE_CHANNELS", "lift_to_3d",
    "project_to_2d", "pre_grasp_point", "PreGrasp", "extract_patches",
    "assemble_cnn_inputs", "global_sdf", "leaf_sdf", "approach_vector",
    "isolation_metric",
]
