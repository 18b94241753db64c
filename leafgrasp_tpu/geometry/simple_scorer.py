"""Legacy v2-generation leaf selection (reference leaf_grasp_node_v2.py).

The reference's first live GPU node scored leaves with three simple
metrics before the Pareto pipeline existed: height = 1/mean_depth,
isolation = 1/mean(21x21-box count of other-leaf pixels over the leaf),
flatness = 1/var(surface normal angles from Sobel depth gradients), each
clamp-normalized, blended 0.35/0.35/0.30 with a 3500 px area gate and a
0.7 m depth gate; the published grasp point was the winning leaf's
centroid (leaf_grasp_node_v2.py:38-91,198-313,474-481).

Kept for capability parity with the reference's node lineage; the
production path is geometry.leaf_scorer + geometry.grasp_scorer.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from leafgrasp_tpu.ops.components import leaf_stats
from leafgrasp_tpu.ops.conv import sobel_gradients, reflect_conv2d

__all__ = ["SimpleSelection", "select_leaf_simple"]

import numpy as np


class SimpleSelection(NamedTuple):
    best_leaf_id: jnp.ndarray     # int32, 0 if none
    found: jnp.ndarray
    centroid_uv: jnp.ndarray      # (2,) int32: the v2 "grasp point"
    scores: jnp.ndarray           # (L, 3) [height, isolation, flatness]
    total: jnp.ndarray            # (L,)
    valid: jnp.ndarray            # (L,)


def _per_leaf_mean(field, mask_ids, max_leaves):
    """Mean of `field` over each leaf id's pixels."""
    num = max_leaves + 2
    ids = jnp.clip(jnp.asarray(mask_ids, jnp.int32), 0, max_leaves + 1)
    seg = jnp.arange(num, dtype=jnp.int32)[:, None]
    onehot = ids.ravel()[None, :] == seg
    f = field.ravel()[None, :]
    sums = jnp.sum(jnp.where(onehot, f, 0.0), axis=-1)
    counts = jnp.sum(onehot, axis=-1)
    return sums[1:max_leaves + 1] / jnp.maximum(counts[1:max_leaves + 1],
                                                1)


@functools.partial(jax.jit, static_argnames=("max_leaves", "min_area"))
def select_leaf_simple(mask_ids: jnp.ndarray, depth: jnp.ndarray,
                       max_leaves: int = 16, min_area: int = 3500,
                       depth_threshold: float = 0.7,
                       kernel_size: int = 21) -> SimpleSelection:
    mask_ids = jnp.asarray(mask_ids, jnp.int32)
    depth = jnp.asarray(depth, jnp.float32)
    h, w = mask_ids.shape

    stats = leaf_stats(mask_ids, depth, max_leaves, w / 2.0, h / 2.0, 1.0)
    valid = stats.present & (stats.area >= min_area) \
        & (stats.mean_depth < depth_threshold)

    # height score: closer leaves win (leaf_grasp_node_v2.py:200-214)
    height = 1.0 / jnp.maximum(stats.mean_depth, 1e-6)
    height = jnp.clip(height / jnp.maximum(jnp.max(
        jnp.where(valid, height, 0.0)), 1e-6), 0.0, 1.0)

    # isolation: inverse mean count of OTHER-leaf pixels in a 21x21 box
    all_leaves = (mask_ids > 0).astype(jnp.float32)
    box = np.ones((kernel_size, kernel_size), np.float32)
    crowd = reflect_conv2d(all_leaves, box)
    own = reflect_conv2d(jnp.ones_like(all_leaves), box)  # normalization
    per_leaf_crowd = _per_leaf_mean(crowd / own, mask_ids, max_leaves)
    isolation = 1.0 / jnp.maximum(per_leaf_crowd, 1e-3)
    isolation = jnp.clip(isolation / jnp.maximum(jnp.max(
        jnp.where(valid, isolation, 0.0)), 1e-6), 0.0, 1.0)

    # flatness: inverse variance of surface-normal angle
    dx, dy = sobel_gradients(depth)
    angle = jnp.arctan2(jnp.sqrt(dx * dx + dy * dy), 1.0)
    mean_a = _per_leaf_mean(angle, mask_ids, max_leaves)
    mean_a2 = _per_leaf_mean(angle * angle, mask_ids, max_leaves)
    var = jnp.maximum(mean_a2 - mean_a ** 2, 1e-9)
    flatness = 1.0 / var
    flatness = jnp.clip(flatness / jnp.maximum(jnp.max(
        jnp.where(valid, flatness, 0.0)), 1e-6), 0.0, 1.0)

    scores = jnp.stack([height, isolation, flatness], axis=-1)
    total = 0.35 * height + 0.35 * isolation + 0.30 * flatness
    masked = jnp.where(valid, total, -jnp.inf)
    best = jnp.argmax(masked)
    found = jnp.any(valid)
    best_id = jnp.where(found, best.astype(jnp.int32) + 1, 0)
    u = stats.centroid_x[best].astype(jnp.int32)
    v = stats.centroid_y[best].astype(jnp.int32)
    return SimpleSelection(best_leaf_id=best_id, found=found,
                           centroid_uv=jnp.stack([u, v]), scores=scores,
                           total=total, valid=valid)
