"""PCA-based leaf orientation estimation, in pure JAX.

Replaces ``cv2.findContours`` + ``cv2.minAreaRect``
(reference grasp_point_selector.py:718-752) and ``cv2.fitEllipse``
(leaf_grasp_node_2.py:158-265).  Instead of contour geometry -- which is
sequential and shape-dynamic -- we use the mask's second image moments:
for the elongated, convex-ish leaf blobs both estimators agree on the
major-axis direction, and the downstream consumer only uses the axis
*direction* (|cross| alignment term, grasp_point_selector.py:556-558),
for which PCA is the natural TPU-native formulation.  Documented
divergence: exact angle can differ from minAreaRect by a few degrees on
non-elliptical blobs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

__all__ = ["Orientation", "mask_orientation"]


class Orientation(NamedTuple):
    angle: jnp.ndarray        # radians, direction of the major axis
    major_axis: jnp.ndarray   # full extent (4 sigma) along major axis, px
    minor_axis: jnp.ndarray   # full extent (4 sigma) along minor axis, px
    center: jnp.ndarray       # (2,) = (x, y) centroid
    valid: jnp.ndarray        # bool: mask had any pixels


def mask_orientation(mask: jnp.ndarray, reduce_fn=None,
                     row0=0) -> Orientation:
    """Major-axis angle / extents / centroid of a binary mask via PCA.

    reduce_fn/row0: cross-shard SUM hook + global first-row offset for
    row-sharded callers (identity semantics at the defaults). Second
    moments stay CENTERED (two reduction rounds) -- raw moments about
    the origin cancel catastrophically in f32 at 1440-px scale.
    """
    m = jnp.asarray(mask, jnp.float32)
    h, w = m.shape
    reduce_fn = reduce_fn or (lambda x: x)

    ys = row0 + jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    first = reduce_fn(jnp.stack([jnp.sum(m), jnp.sum(m * xs),
                                 jnp.sum(m * ys)]))
    total, sx, sy = first
    valid = total > 0
    safe_total = jnp.maximum(total, 1.0)

    mx = sx / safe_total
    my = sy / safe_total

    second = reduce_fn(jnp.stack([
        jnp.sum(m * (xs - mx) ** 2),
        jnp.sum(m * (ys - my) ** 2),
        jnp.sum(m * (xs - mx) * (ys - my))]))
    dx2 = second[0] / safe_total
    dy2 = second[1] / safe_total
    dxy = second[2] / safe_total

    # Principal eigen-direction of [[dx2, dxy], [dxy, dy2]].
    angle = 0.5 * jnp.arctan2(2.0 * dxy, dx2 - dy2)

    common = jnp.sqrt(jnp.maximum((dx2 - dy2) ** 2 / 4.0 + dxy ** 2, 0.0))
    lam1 = (dx2 + dy2) / 2.0 + common
    lam2 = (dx2 + dy2) / 2.0 - common

    major = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    minor = 4.0 * jnp.sqrt(jnp.maximum(lam2, 0.0))

    return Orientation(
        angle=angle,
        major_axis=major,
        minor_axis=minor,
        center=jnp.stack([mx, my]),
        valid=valid,
    )
