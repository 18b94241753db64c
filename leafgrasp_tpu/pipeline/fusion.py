"""Confidence-weighted CV (+) ML score fusion, as a pure function.

Rebuild of the reference candidate-fusion loop
(grasp_point_selector.py:205-237): per candidate,
ml_conf = 1 - |ml - 0.5| * 2, ml_weight = min(cap, ml_conf * scale),
combined = (1 - w) * trad + w * ml; the winner replaces the default
(candidate 0, judged by its *traditional* score) only on strict
improvement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from leafgrasp_tpu.config import MLFusionConfig

__all__ = ["FusionResult", "fuse_candidates"]


class FusionResult(NamedTuple):
    best_index: jnp.ndarray      # int32 index into the candidate arrays
    best_score: jnp.ndarray      # float32 winning (combined or trad) score
    ml_used: jnp.ndarray         # bool: an ML-fused candidate won
    combined: jnp.ndarray        # (K,) combined scores
    ml_weight: jnp.ndarray       # (K,) per-candidate ML weights


def fuse_candidates(trad_scores: jnp.ndarray, ml_scores: jnp.ndarray,
                    accepted: jnp.ndarray, use_ml: jnp.ndarray | bool,
                    cfg: MLFusionConfig = MLFusionConfig()) -> FusionResult:
    """trad_scores/ml_scores: (K,) float32; accepted: (K,) bool.

    ``use_ml`` mirrors ``self.ml_predictor is not None and
    len(candidate_points) > 1`` (grasp_point_selector.py:210).
    """
    trad = jnp.asarray(trad_scores, jnp.float32)
    ml = jnp.asarray(ml_scores, jnp.float32)
    accepted = jnp.asarray(accepted, bool)

    ml_conf = 1.0 - jnp.abs(ml - 0.5) * 2.0
    ml_weight = jnp.minimum(cfg.ml_weight_cap, ml_conf * cfg.ml_conf_scale)
    combined = (1.0 - ml_weight) * trad + ml_weight * ml

    n_accepted = jnp.sum(accepted)
    do_ml = jnp.asarray(use_ml, bool) & (n_accepted > 1)

    masked = jnp.where(accepted, combined, -jnp.inf)
    best_idx = jnp.argmax(masked).astype(jnp.int32)
    baseline = trad[0]
    improves = masked[best_idx] > baseline

    use_fused = do_ml & improves
    index = jnp.where(use_fused, best_idx, 0)
    score = jnp.where(use_fused, masked[best_idx], baseline)
    return FusionResult(best_index=index, best_score=score,
                        ml_used=use_fused, combined=combined,
                        ml_weight=ml_weight)
