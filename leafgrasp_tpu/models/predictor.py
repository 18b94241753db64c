"""GraspQualityPredictor: thin eval facade over GraspPointCNN.

Rebuild of the reference wrapper (ml_grasp_optimizer/model.py:130-162)
used by the teacher-loop selector: concatenates patch channels and
returns a scalar quality score. Batched by construction.
"""

from __future__ import annotations

from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.config import ModelConfig
from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn

__all__ = ["GraspQualityPredictor"]


class GraspQualityPredictor:
    def __init__(self, cfg: ModelConfig = ModelConfig(),
                 variables=None, seed: int = 0):
        self.model, default_vars = init_grasp_cnn(
            jax.random.PRNGKey(seed), cfg)
        self.variables = variables if variables is not None else \
            default_vars
        self._apply = jax.jit(
            lambda v, x: self.model.apply(v, x, train=False))

    def load(self, checkpoint_path: str):
        from leafgrasp_tpu.training.checkpoint import load_checkpoint
        restored = load_checkpoint(checkpoint_path)
        self.variables = {"params": restored["params"],
                          "batch_stats": restored["batch_stats"]}
        return self

    def predict(self, patch_data: Dict) -> float:
        """patch_data: depth_patch (P,P), mask_patch (P,P),
        score_patches (7,P,P) -> sigmoid score in [0,1]."""
        feats = jnp.concatenate([
            jnp.asarray(patch_data["depth_patch"],
                        jnp.float32)[None, :, :, None],
            jnp.asarray(patch_data["mask_patch"],
                        jnp.float32)[None, :, :, None],
            jnp.moveaxis(jnp.asarray(patch_data["score_patches"],
                                     jnp.float32), 0, -1)[None],
        ], axis=-1)
        logit = self._apply(self.variables, feats)
        return float(jax.nn.sigmoid(logit.reshape(()) if logit.size == 1
                                    else logit.reshape(-1)[0]))

    def predict_batch(self, feats: np.ndarray) -> np.ndarray:
        """(N, P, P, 9) NHWC -> (N,) sigmoid scores."""
        logits = self._apply(self.variables, jnp.asarray(feats))
        return np.asarray(jax.nn.sigmoid(logits.reshape(-1)))
