"""VLA subsystem: hybrid re-ranking with a JAX vision-language model.

Public API preserves the reference README's documented surface
(``HybridGraspSelector.select_grasp_point``) plus the reference-shaped
internals (VLAProcessor / ConfidenceManager / HybridSelector /
VLATrainer).
"""

from leafgrasp_tpu.vla.hybrid import (HybridGraspSelector, HybridSelector,
                                      confidence_weights,
                                      selection_strategy)
from leafgrasp_tpu.vla.confidence import ConfidenceManager, \
    calculate_confidence
from leafgrasp_tpu.vla.processor import (VLAProcessor, StubScorer,
                                         HeuristicScorer, TinyVLAScorer,
                                         build_prompt, parse_score)
from leafgrasp_tpu.vla.trainer import (VLATrainer,
                                       make_synthetic_vla_dataset,
                                       spearman_correlation)
from leafgrasp_tpu.vla.lm import (TinyVLA, VLAModelConfig, ByteTokenizer,
                                  greedy_generate, init_vla)
from leafgrasp_tpu.vla.llava_jax import (LlavaJax, LlavaJaxConfig,
                                         config_from_hf,
                                         convert_hf_llava_state_dict,
                                         greedy_generate_llava)
from leafgrasp_tpu.vla.llava_runtime import (LlavaJaxScorer,
                                             load_llava_from_hf,
                                             preprocess_image)
from leafgrasp_tpu.vla.checkpoint_io import (SentencePieceTokenizer,
                                             load_llava_checkpoint,
                                             read_safetensors,
                                             write_safetensors)
from leafgrasp_tpu.vla.quant import (QuantDense, QuantLoRADense,
                                     quantize_llava_variables)

__all__ = [
    "HybridGraspSelector", "HybridSelector", "confidence_weights",
    "selection_strategy", "ConfidenceManager", "calculate_confidence",
    "VLAProcessor", "StubScorer", "HeuristicScorer", "TinyVLAScorer",
    "build_prompt", "parse_score", "VLATrainer",
    "make_synthetic_vla_dataset", "spearman_correlation", "TinyVLA",
    "VLAModelConfig", "ByteTokenizer", "greedy_generate", "init_vla",
    "LlavaJax", "LlavaJaxConfig", "config_from_hf",
    "convert_hf_llava_state_dict", "greedy_generate_llava",
    "LlavaJaxScorer", "load_llava_from_hf", "preprocess_image",
    "SentencePieceTokenizer", "load_llava_checkpoint",
    "read_safetensors", "write_safetensors",
    "QuantDense", "QuantLoRADense", "quantize_llava_variables",
]
