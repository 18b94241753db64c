"""Neural models: GraspPointCNN + quality predictor facade."""

from leafgrasp_tpu.models.grasp_cnn import (GraspPointCNN, init_grasp_cnn,
                                            ml_scores_from_logits,
                                            ARCHITECTURES)
from leafgrasp_tpu.models.predictor import GraspQualityPredictor
from leafgrasp_tpu.models.attention_pallas import (fused_attention_gate,
                                                   attention_gate_reference)

__all__ = ["GraspPointCNN", "init_grasp_cnn", "ml_scores_from_logits",
           "ARCHITECTURES", "GraspQualityPredictor",
           "fused_attention_gate", "attention_gate_reference"]
