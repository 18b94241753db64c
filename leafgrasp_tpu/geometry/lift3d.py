"""2D -> 3D lifting and pre-grasp ray march.

Rebuild of reference grasp_point_selector.py:152-180 (3D lifting) and
:754-826 (pre-grasp point search, vectorized over the 5 ray steps with
``lax``-friendly first-accept semantics).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from leafgrasp_tpu.config import PreGraspConfig
from leafgrasp_tpu.ops.morphology import elliptical_kernel

__all__ = ["lift_to_3d", "lift_to_3d_with_cloud", "project_to_2d",
           "pre_grasp_point", "PreGrasp"]


def lift_to_3d(u, v, depth_value, camera_cx, camera_cy, f_norm):
    """Pinhole back-projection (grasp_point_selector.py:152-162)."""
    d = jnp.asarray(depth_value, jnp.float32)
    x = d * (u - camera_cx) / f_norm
    y = d * (v - camera_cy) / f_norm
    return jnp.stack([x, y, d])


def lift_to_3d_with_cloud(u, v, depth_value, points, camera_cx, camera_cy,
                          f_norm, threshold_m: float = 0.01):
    """Depth back-projection cross-checked against an organized point
    cloud (grasp_point_selector.py:163-180): when the row-major cloud
    point at (v, u) disagrees with the depth-lifted point by more than
    ``threshold_m`` (reference: 1 cm), the cloud point wins.

    points : (H, W, 3) float32 organized cloud (row v, col u -> the
        reference's flat index ``v * width + u``). NaN cloud entries
        (invalid stereo returns) never trigger the swap -- a NaN
        distance fails the ``> threshold`` comparison, matching the
        reference's numpy semantics.
    """
    depth_pt = lift_to_3d(u, v, depth_value, camera_cx, camera_cy, f_norm)
    pts = jnp.asarray(points, jnp.float32)
    h, w = pts.shape[0], pts.shape[1]
    ui = jnp.asarray(u, jnp.int32)
    vi = jnp.asarray(v, jnp.int32)
    in_cloud = (ui >= 0) & (ui < w) & (vi >= 0) & (vi < h)
    cloud_pt = pts[jnp.clip(vi, 0, h - 1), jnp.clip(ui, 0, w - 1)]
    diff = jnp.linalg.norm(depth_pt - cloud_pt)
    use_cloud = in_cloud & (diff > jnp.float32(threshold_m))
    return jnp.where(use_cloud, cloud_pt, depth_pt)


def project_to_2d(point_3d, camera_cx, camera_cy, f_norm):
    """3D -> integer pixel coords with C-style truncation toward zero
    (reference uses ``int(...)``, grasp_point_selector.py:821-826)."""
    x, y, z = point_3d[0], point_3d[1], point_3d[2]
    u = jnp.trunc(x * f_norm / z + camera_cx).astype(jnp.int32)
    v = jnp.trunc(y * f_norm / z + camera_cy).astype(jnp.int32)
    return u, v


class PreGrasp(NamedTuple):
    point: jnp.ndarray   # (3,) float32
    # True if a ray step satisfied every reference condition; otherwise the
    # point is the max-distance fallback (grasp_point_selector.py:810-815).
    from_search: jnp.ndarray


@functools.partial(jax.jit, static_argnames=("cfg", "frame_height",
                                             "any_reduce"))
def pre_grasp_point(grasp_point_3d: jnp.ndarray, leaf_mask: jnp.ndarray,
                    camera_cx, camera_cy, f_norm,
                    cfg: PreGraspConfig = PreGraspConfig(),
                    row0=0, frame_height: int | None = None,
                    any_reduce=None) -> PreGrasp:
    """March 5..10cm back along the camera ray at constant Z; accept the
    first test point that projects inside the image, clears the 15px-dilated
    leaf mask, and sits >= min_distance from the grasp point.

    Faithfulness note: the reference's distance check uses
    ||test - grasp|| = dist * sqrt(dir_x^2 + dir_y^2) (Z is held constant),
    which for typical viewing geometry is < min_distance, so the fallback
    max-distance point is the common outcome -- reproduced exactly.

    Row-sharded callers pass their local mask block + row0/frame_height
    and an ``any_reduce`` hook (cross-shard OR via summed int); every
    window cell is owned by exactly one shard, so the OR over owned
    cells reproduces the full-frame window check.
    """
    g = jnp.asarray(grasp_point_3d, jnp.float32)
    m = jnp.asarray(leaf_mask, bool)
    h, w = m.shape
    fh = h if frame_height is None else frame_height

    direction = g / jnp.maximum(jnp.linalg.norm(g), 1e-30)

    k = 2 * cfg.clearance_px + 1

    # np.arange(min, max, step) -> excludes max (reference line 787)
    n_steps = int(round((cfg.max_distance_m - cfg.min_distance_m)
                        / cfg.step_m))
    dists = cfg.min_distance_m + cfg.step_m * jnp.arange(
        n_steps, dtype=jnp.float32)

    def test_point(dist):
        return jnp.stack([g[0] - direction[0] * dist,
                          g[1] - direction[1] * dist,
                          g[2]])

    pts = jax.vmap(test_point)(dists)                       # (S, 3)
    us, vs = jax.vmap(project_to_2d, in_axes=(0, None, None, None))(
        pts, camera_cx, camera_cy, f_norm)
    in_bounds = (us >= 0) & (us < w) & (vs >= 0) & (vs < fh)
    uc = jnp.clip(us, 0, w - 1)
    vc = jnp.clip(vs, 0, fh - 1)

    # dilated_mask[p] == any leaf pixel within the SE window around p;
    # only the S test pixels are queried, so test each against its own
    # window instead of dilating the full frame (identical semantics,
    # measured ~5 ms cheaper; OOB window cells read as background, which
    # matches cv2.dilate's zero border).
    se = jnp.asarray(elliptical_kernel(k, k), bool)
    offs = jnp.arange(k, dtype=jnp.int32) - k // 2

    def covered(u, v):
        grows = v + offs                       # global frame rows
        cols = jnp.clip(u + offs, 0, w - 1)
        rows_ok = (grows >= 0) & (grows < fh) \
            & (grows >= row0) & (grows < row0 + h)
        cols_ok = (u + offs >= 0) & (u + offs < w)
        lrows = jnp.clip(grows - row0, 0, h - 1)
        window = m[lrows[:, None], cols[None, :]]
        valid = rows_ok[:, None] & cols_ok[None, :]
        # window cell at SE-relative offset (i - ay, j - ax) pairs with
        # SE[i, j] (cv2 dilation reads src at p + offset - anchor)
        return jnp.any(window & valid & se)

    cover = jax.vmap(covered)(uc, vc)
    if any_reduce is not None:
        cover = any_reduce(cover.astype(jnp.int32)) > 0
    clear = ~cover
    far_enough = jnp.linalg.norm(pts - g[None, :], axis=1) \
        >= cfg.min_distance_m
    ok = in_bounds & clear & far_enough

    first = jnp.argmax(ok)     # first True (or 0 if none)
    found = jnp.any(ok)
    fallback = jnp.stack([g[0] - direction[0] * cfg.max_distance_m,
                          g[1] - direction[1] * cfg.max_distance_m,
                          g[2]])
    point = jnp.where(found, pts[first], fallback)
    return PreGrasp(point=point, from_search=found)
