"""Per-leaf reductions over an instance-id map, without scatters.

The reference loops over leaves in Python, materializing one boolean mask
per leaf (leaf_scorer.py:41-64,74-138).  On TPU the leaf axis must be a
*padded, static* dimension; and XLA's scatter (jax.ops.segment_sum)
measured ~26 ms per call at 1080x1440, so every statistic here is
computed scatter-free:

* sums/areas/centroids: a broadcast compare-and-reduce over the (L, n)
  virtual one-hot (XLA fuses it into an n-pass with L accumulators);
* medians: 18 rounds of vectorized bisection over the depth range --
  exact to (range * 2^-18) < 1e-5 m, far below any decision scale
  (documented divergence from numpy's exact midpoint median).

Leaf ids are assumed to lie in [1, max_leaves]; id 0 is background
(matches the YOLOv8 instance maps consumed by the reference,
leaf_grasp_node_v3.py:185-194).  Ids above max_leaves are clipped into an
overflow bucket and reported invalid.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["LeafStats", "leaf_stats", "masked_median",
           "masked_median_range"]


class LeafStats(NamedTuple):
    """Per-leaf statistics, index 0 <-> leaf id 1. All arrays (L,)."""

    area: jnp.ndarray           # int32 pixel counts
    centroid_x: jnp.ndarray     # float32
    centroid_y: jnp.ndarray     # float32
    mean_depth: jnp.ndarray     # float32
    median_depth: jnp.ndarray   # float32 (midpoint average for even
                                # counts, bisected to ~1e-7 precision)
    mean_ray_norm: jnp.ndarray  # float32 mean of sqrt((x-cx)^2+(y-cy)^2+f^2)
    border_contact: jnp.ndarray  # bool: any pixel on the image border
    present: jnp.ndarray        # bool: area > 0


def _per_leaf_sums(values: jnp.ndarray, ids: jnp.ndarray,
                   num: int, reduce_fn=None) -> jnp.ndarray:
    """values: (C, H, W), ids: (H, W) -> (C, num) scatter-free segment
    sums. The 2D layout matters: reducing over both spatial axes of the
    native (H, W) tiling measured ~2.7x faster than reducing a
    flattened minor axis.

    reduce_fn: optional cross-shard sum hook (e.g. ``lax.psum`` inside a
    row-sharded ``shard_map`` body); identity when None.
    """
    seg = jnp.arange(num, dtype=ids.dtype)[:, None, None]    # (num, 1, 1)
    onehot = ids[None] == seg                                # (num, H, W)
    out = jnp.sum(jnp.where(onehot[None], values[:, None], 0.0),
                  axis=(2, 3))
    return out if reduce_fn is None else reduce_fn(out)


def masked_median(depth: jnp.ndarray, ids: jnp.ndarray, counts: jnp.ndarray,
                  num: int, iters: int = 18) -> jnp.ndarray:
    """Per-segment median of `depth` grouped by `ids`, via vectorized
    bisection on the value range (no sort, no scatter).

    Returns (num,) medians with numpy semantics (average of the two
    middle order statistics for even counts), to ~range*2^-iters.
    depth/ids keep their native (H, W) layout (2D-axis reductions are
    ~2.7x faster than flattened minor-axis reductions on TPU).

    Row-sharded callers must use ``masked_median_range`` instead (the
    bisection range has to be frame-global).
    """
    return masked_median_range(depth, ids, counts, num,
                               jnp.min(depth), jnp.max(depth),
                               iters=iters)


def masked_median_range(depth: jnp.ndarray, ids: jnp.ndarray,
                        counts: jnp.ndarray, num: int, dmin, dmax,
                        iters: int = 18, reduce_fn=None) -> jnp.ndarray:
    """`masked_median` with an explicit bisection range [dmin, dmax]
    (callers in sharded bodies supply globally-reduced extrema)."""

    cnt = counts.astype(jnp.int32)
    # 0-based order statistics to extract, stacked (2, num)
    ks = jnp.stack([jnp.maximum(cnt - 1, 0) // 2, cnt // 2])

    lo0 = jnp.full((2, num), dmin, jnp.float32)
    hi0 = jnp.full((2, num), dmax, jnp.float32)

    seg = jnp.arange(num, dtype=ids.dtype)[None, :, None, None]
    onehot = ids[None, None] == seg                  # (1, num, H, W)

    def body(_, carry):
        lo, hi = carry
        mid = 0.5 * (lo + hi)                        # (2, num)
        le = depth[None, None] <= mid[:, :, None, None]  # (2, num, H, W)
        cnt_le = jnp.sum(jnp.where(onehot, le, 0), axis=(2, 3))
        if reduce_fn is not None:
            cnt_le = reduce_fn(cnt_le)
        # k-th order stat x_k satisfies: count(<= x_k) >= k+1
        go_left = cnt_le >= (ks + 1)
        hi = jnp.where(go_left, mid, hi)
        lo = jnp.where(go_left, lo, mid)
        return lo, hi

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo0, hi0))
    stats = hi                                               # (2, num)
    return 0.5 * (stats[0] + stats[1])


def leaf_stats(mask_ids: jnp.ndarray, depth: jnp.ndarray,
               max_leaves: int, camera_cx: float, camera_cy: float,
               f_norm: float, use_pallas: bool = False,
               reduce_fn=None, row0=0, frame_height: int | None = None,
               depth_range=None) -> LeafStats:
    """Compute all per-leaf statistics in one scatter-free pass.

    mask_ids : (H, W) integer instance map (0 = background)
    depth    : (H, W) float32 metric depth
    use_pallas : accepted for signature uniformity with the scoring
        path; currently a no-op here (see the note above the median
        call -- the bisection beat the Pallas histogram on-chip).

    Sharded-caller hooks (identity semantics when left at defaults):
    reduce_fn -- cross-shard SUM applied to every per-leaf partial sum
    (e.g. ``lax.psum`` inside a row-sharded shard_map body); row0 --
    global row index of this shard's first local row (centroids/border
    use frame coordinates); frame_height -- full frame height for the
    bottom-border row; depth_range -- globally-reduced (dmin, dmax) for
    the median bisection (required with reduce_fn).
    """
    h, w = mask_ids.shape
    fh = h if frame_height is None else frame_height
    num_seg = max_leaves + 2  # 0 = background, 1..L = leaves, L+1 overflow

    ids = jnp.asarray(mask_ids, jnp.int32)
    ids = jnp.where(ids > max_leaves, max_leaves + 1, jnp.maximum(ids, 0))
    depth2d = jnp.asarray(depth, jnp.float32)

    ys = row0 + jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]
    ray_norm = jnp.sqrt((xs - camera_cx) ** 2 + (ys - camera_cy) ** 2
                        + jnp.float32(f_norm) ** 2)

    ys_i = row0 + jnp.arange(h, dtype=jnp.int32)[:, None]
    border = jnp.broadcast_to((ys_i == 0) | (ys_i == fh - 1), (h, w))
    border = border.at[:, 0].set(True).at[:, -1].set(True)

    channels = jnp.stack([
        jnp.ones_like(depth2d),
        jnp.broadcast_to(xs, (h, w)),
        jnp.broadcast_to(ys, (h, w)),
        depth2d,
        ray_norm,
        border.astype(jnp.float32),
    ])
    sums = _per_leaf_sums(channels, ids, num_seg, reduce_fn)  # (6, num_seg)
    area_all, sum_x, sum_y, sum_depth, sum_ray, border_counts = sums
    safe_area = jnp.maximum(area_all, 1.0)

    # use_pallas currently routes nothing here: the Pallas histogram
    # median (ops/pallas_median.py) measured 4.9 ms on-chip vs ~2.5 ms
    # for this fused bisection (the one-hot MXU counting runs at M=16 on
    # a 128-row systolic array) -- kept as a verified component, not the
    # default. The flag stays so callers compile one signature.
    del use_pallas
    if reduce_fn is None:
        median_all = masked_median(depth2d, ids, area_all, num_seg)
    else:
        if depth_range is None:
            raise ValueError("depth_range required with reduce_fn")
        median_all = masked_median_range(depth2d, ids, area_all, num_seg,
                                         depth_range[0], depth_range[1],
                                         reduce_fn=reduce_fn)

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
