"""Batched 9-channel 32x32 patch assembly for CNN scoring.

The reference extracts patches one candidate at a time with host-side
padding logic and runs 20 sequential CNN forwards
(grasp_point_selector.py:59-143,392-445; see SURVEY.md section 3.1 "hot:
20 sequential 9x32x32 CNN invocations").  Here the whole candidate set is
gathered in one clipped-index gather (clipping == the reference's
edge-replicate padding) and normalized per patch, producing a single
(K, 32, 32, 9) batch for ONE CNN forward.

Channel order (grasp_point_selector.py:94-127):
  0: depth (per-patch min-max), 1: leaf mask (raw 0/1),
  2..8: [sdf, approach, flatness, isolation, distance, accessibility,
         stem] (each per-patch min-max).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from leafgrasp_tpu.geometry.grasp_scorer import GraspScores

__all__ = ["extract_patches", "assemble_cnn_inputs",
           "normalize_patch_batch", "normalize_patch_batch_train_stats"]


def _minmax(patch: jnp.ndarray) -> jnp.ndarray:
    """Per-patch min-max normalization; identity for constant patches
    (grasp_point_selector.py:84-121)."""
    lo = jnp.min(patch)
    hi = jnp.max(patch)
    return jnp.where(hi > lo, (patch - lo) / jnp.maximum(hi - lo, 1e-30),
                     patch)


@functools.partial(jax.jit, static_argnames=("patch_size",))
def extract_patches(maps: jnp.ndarray, xs: jnp.ndarray, ys: jnp.ndarray,
                    patch_size: int = 32) -> jnp.ndarray:
    """Gather (C, H, W) maps at K centers -> (K, C, P, P).

    Clipped indices implement the reference's replicate/edge padding
    (grasp_point_selector.py:392-445): window rows y-P/2 .. y+P/2-1.
    """
    c, h, w = maps.shape
    half = patch_size // 2
    offs = jnp.arange(patch_size, dtype=jnp.int32) - half

    rows = jnp.clip(ys[:, None] + offs[None, :], 0, h - 1)   # (K, P)
    cols = jnp.clip(xs[:, None] + offs[None, :], 0, w - 1)   # (K, P)

    # (K, P, P) index grids -> gather each channel
    r = rows[:, :, None]
    cl = cols[:, None, :]
    return maps[:, r, cl].transpose(1, 0, 2, 3)


def normalize_patch_batch(patches: jnp.ndarray) -> jnp.ndarray:
    """(K, 9, P, P) raw channel patches -> (K, P, P, 9) NHWC normalized
    batch: depth + the 7 score channels per-patch min-maxed, mask raw
    (grasp_point_selector.py:84-121)."""
    def norm_one(p):  # p: (9, P, P)
        depth_n = _minmax(p[0])
        mask_raw = p[1]
        score_n = jax.vmap(_minmax)(p[2:])
        return jnp.concatenate([depth_n[None], mask_raw[None], score_n])

    normed = jax.vmap(norm_one)(patches)                    # (K, 9, P, P)
    return normed.transpose(0, 2, 3, 1)                     # NHWC


def normalize_patch_batch_train_stats(patches: jnp.ndarray,
                                      norm_stats) -> jnp.ndarray:
    """(K, 9, P, P) raw patches -> NHWC z-scored with TRAINING stats.

    The reference trains its CNN on globally z-scored patches
    (train_model.py:41-62) but serves it per-patch MIN-MAXED inputs
    (grasp_point_selector.py:84-121): a train/serve normalization
    mismatch that leaves the production CNN out-of-distribution at
    inference -- measured here, the served sigmoids collapse to < 0.2
    on every candidate, so the fusion's ``combined > best_score`` gate
    (grasp_point_selector.py:232-237) can never fire and the hybrid
    degenerates to the classical choice.  ``normalize_patch_batch``
    transcribes that faithful serving path; THIS variant is the
    corrected mode: the checkpoint's stored ``NormStats``
    (training/checkpoint.py) applied at serve time exactly as during
    training -- scalar depth z-score + per-channel score z-score, mask
    raw.  Selected via ``MLFusionConfig.patch_normalization``.
    """
    # a degenerate corpus (constant depth or a constant score channel)
    # stores std=0; clamp like the min-max path guards max>min
    eps = jnp.float32(1e-6)
    depth_n = (patches[:, 0] - norm_stats["depth_mean"]) \
        / jnp.maximum(norm_stats["depth_std"], eps)
    mask_raw = patches[:, 1]
    sm = jnp.reshape(norm_stats["score_mean"], (1, 7, 1, 1))
    ss = jnp.maximum(jnp.reshape(norm_stats["score_std"], (1, 7, 1, 1)),
                     eps)
    score_n = (patches[:, 2:] - sm) / ss
    normed = jnp.concatenate([depth_n[:, None], mask_raw[:, None],
                              score_n], axis=1)             # (K, 9, P, P)
    return normed.transpose(0, 2, 3, 1)                     # NHWC


def assemble_cnn_inputs(depth: jnp.ndarray, leaf_mask: jnp.ndarray,
                        scores: GraspScores, xs: jnp.ndarray,
                        ys: jnp.ndarray, patch_size: int = 32,
                        norm_stats=None) -> jnp.ndarray:
    """(K, P, P, 9) NHWC feature batch for GraspPointCNN.

    ``norm_stats`` None -> the reference-faithful per-patch min-max
    serving normalization; a stats dict (depth_mean/depth_std/
    score_mean/score_std, as stored by checkpoint.py) -> the corrected
    train-consistent z-score (see normalize_patch_batch_train_stats).
    """
    stack = jnp.concatenate([
        depth[None].astype(jnp.float32),
        jnp.asarray(leaf_mask, jnp.float32)[None],
        scores.stacked_channels(),
    ], axis=0)                                              # (9, H, W)
    patches = extract_patches(stack, xs, ys, patch_size)    # (K, 9, P, P)
    if norm_stats is not None:
        return normalize_patch_batch_train_stats(patches, norm_stats)
    return normalize_patch_batch(patches)
