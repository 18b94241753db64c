"""Self-supervised teacher loop: CV pipeline labels -> training set.

Rebuild of the reference's data-collection selector
(grasp_point_selector_bkp.py:63-160, SURVEY.md 3.5): erode the leaf mask
into a safe zone (21x21 ellipse, 2 iterations), score with the
8-map teacher blend (0.4 approach + 0.3 sdf + 0.2 flatness +
0.1*(1 - tip_penalty)) gated by (1 - stem), take the argmax as the
positive label, and hand every selection to the data collector (which
adds rotations and tip/stem/edge negatives).
"""

from __future__ import annotations

from typing import Iterable, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from leafgrasp_tpu.config import PipelineConfig, DEFAULT_CONFIG
from leafgrasp_tpu.geometry.grasp_scorer import (compute_grasp_scores,
                                                 tip_penalty_map)
from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf
from leafgrasp_tpu.ops.morphology import elliptical_kernel, erode
from leafgrasp_tpu.training.data_collector import GraspDataCollector

__all__ = ["teacher_select", "collect_from_frames"]


def teacher_select(leaf_mask, all_mask, depth, camera_cx, camera_cy,
                   f_norm, cfg: PipelineConfig = DEFAULT_CONFIG
                   ) -> Tuple[Optional[Tuple[int, int]], float, object]:
    """Teacher grasp point for one leaf.

    Returns ((x, y), total_score, scores) or (None, 0.0, scores) when the
    eroded safe zone is empty (bkp:160-170 falls back to the centroid;
    we report None and let the caller decide).
    """
    m = jnp.asarray(leaf_mask, bool)
    scores = compute_grasp_scores(m, all_mask, depth, camera_cx,
                                  camera_cy, f_norm, cfg=cfg.grasp)
    tip = tip_penalty_map(m)

    k = elliptical_kernel(21)
    safe = erode(erode(m, k), k)

    teacher_score = (0.4 * scores.approach_score
                     + 0.3 * scores.sdf_score
                     + 0.2 * scores.flatness_map
                     + 0.1 * (1.0 - tip)) * (1.0 - scores.stem_penalty)
    masked = jnp.where(safe, teacher_score, -jnp.inf)
    idx = int(jnp.argmax(masked))
    h, w = np.asarray(m).shape
    y, x = divmod(idx, w)
    if not bool(np.asarray(safe)[y, x]):
        return None, 0.0, scores
    return (int(x), int(y)), float(np.asarray(masked).ravel()[idx]), scores


def collect_from_frames(frames: Iterable[Tuple[np.ndarray, np.ndarray]],
                        collector: GraspDataCollector,
                        camera_cx: float, camera_cy: float, f_norm: float,
                        cfg: PipelineConfig = DEFAULT_CONFIG) -> int:
    """Run leaf selection + teacher labeling over (mask, depth) frames,
    feeding every positive into the collector. Returns #frames used."""
    used = 0
    for mask, depth in frames:
        sel = select_optimal_leaf(np.asarray(mask, np.int32), depth,
                                  camera_cx, camera_cy, f_norm,
                                  cfg=cfg.leaf, frame=cfg.frame)
        if not bool(sel.found):
            continue
        leaf = np.asarray(mask) == int(sel.best_leaf_id)
        point, total, scores = teacher_select(
            leaf, np.asarray(mask) > 0, depth, camera_cx, camera_cy,
            f_norm, cfg)
        if point is None:
            continue
        if collector.collect_sample(leaf, depth, scores, point, total):
            used += 1
    collector.save()
    return used
