"""Per-leaf reductions over an instance-id map, as segment ops.

The reference loops over leaves in Python, materializing one boolean mask
per leaf (leaf_scorer.py:41-64,74-138).  On TPU the leaf axis must be a
*padded, static* dimension, so all per-leaf statistics are computed with
one-hot segment sums / a single two-key sort -- no data-dependent shapes.

Leaf ids are assumed to lie in [1, max_leaves]; id 0 is background
(matches the YOLOv8 instance maps consumed by the reference,
leaf_grasp_node_v3.py:185-194).  Ids above max_leaves are clipped into an
overflow bucket and reported invalid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["LeafStats", "leaf_stats"]


class LeafStats(NamedTuple):
    """Per-leaf statistics, index 0 <-> leaf id 1. All arrays (L,)."""

    area: jnp.ndarray           # int32 pixel counts
    centroid_x: jnp.ndarray     # float32
    centroid_y: jnp.ndarray     # float32
    mean_depth: jnp.ndarray     # float32
    median_depth: jnp.ndarray   # float32 (np.median semantics: midpoint
                                # average for even counts)
    mean_ray_norm: jnp.ndarray  # float32 mean of sqrt((x-cx)^2+(y-cy)^2+f^2)
    border_contact: jnp.ndarray  # bool: any pixel on the image border
    present: jnp.ndarray        # bool: area > 0


def _segment_sum(data: jnp.ndarray, seg: jnp.ndarray, num: int) -> jnp.ndarray:
    return jax.ops.segment_sum(data, seg, num_segments=num)


def leaf_stats(mask_ids: jnp.ndarray, depth: jnp.ndarray,
               max_leaves: int, camera_cx: float, camera_cy: float,
               f_norm: float) -> LeafStats:
    """Compute all per-leaf statistics in one pass.

    mask_ids : (H, W) integer instance map (0 = background)
    depth    : (H, W) float32 metric depth
    """
    h, w = mask_ids.shape
    num_seg = max_leaves + 2  # 0 = background, 1..L = leaves, L+1 = overflow

    ids = jnp.asarray(mask_ids, jnp.int32)
    ids = jnp.where(ids > max_leaves, max_leaves + 1, jnp.maximum(ids, 0))
    flat_ids = ids.ravel()
    flat_depth = jnp.asarray(depth, jnp.float32).ravel()

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ray_norm = jnp.sqrt((xs - camera_cx) ** 2 + (ys - camera_cy) ** 2
                        + jnp.float32(f_norm) ** 2)

    ones = jnp.ones_like(flat_depth)
    area_all = _segment_sum(ones, flat_ids, num_seg)
    sum_x = _segment_sum(jnp.broadcast_to(xs, (h, w)).ravel(), flat_ids,
                         num_seg)
    sum_y = _segment_sum(jnp.broadcast_to(ys, (h, w)).ravel(), flat_ids,
                         num_seg)
    sum_depth = _segment_sum(flat_depth, flat_ids, num_seg)
    sum_ray = _segment_sum(ray_norm.ravel(), flat_ids, num_seg)

    safe_area = jnp.maximum(area_all, 1.0)

    # --- median depth per leaf via one two-key sort -----------------------
    # Sort lexicographically by (leaf id, depth); then the k-th leaf's
    # pixels occupy a contiguous run starting at cumsum of areas.
    sorted_ids, sorted_depth = jax.lax.sort((flat_ids, flat_depth),
                                            num_keys=2)
    del sorted_ids
    starts = jnp.cumsum(area_all.astype(jnp.int32)) - area_all.astype(
        jnp.int32)
    cnt = area_all.astype(jnp.int32)
    lo = starts + jnp.maximum(cnt - 1, 0) // 2
    hi = starts + cnt // 2
    lo = jnp.clip(lo, 0, h * w - 1)
    hi = jnp.clip(hi, 0, h * w - 1)
    median_all = 0.5 * (sorted_depth[lo] + sorted_depth[hi])

    # --- border contact ----------------------------------------------------
    border = jnp.zeros((h, w), bool)
    border = border.at[0, :].set(True).at[-1, :].set(True)
    border = border.at[:, 0].set(True).at[:, -1].set(True)
    border_counts = _segment_sum(border.ravel().astype(jnp.float32),
                                 flat_ids, num_seg)

    sl = slice(1, max_leaves + 1)
    area = area_all[sl].astype(jnp.int32)
    return LeafStats(
        area=area,
        centroid_x=sum_x[sl] / safe_area[sl],
        centroid_y=sum_y[sl] / safe_area[sl],
        mean_depth=sum_depth[sl] / safe_area[sl],
        median_depth=median_all[sl],
        mean_ray_norm=sum_ray[sl] / safe_area[sl],
        border_contact=border_counts[sl] > 0,
        present=area > 0,
    )
