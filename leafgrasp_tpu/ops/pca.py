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


def mask_orientation(mask: jnp.ndarray) -> Orientation:
    """Major-axis angle / extents / centroid of a binary mask via PCA."""
    m = jnp.asarray(mask, jnp.float32)
    h, w = m.shape
    total = jnp.sum(m)
    valid = total > 0
    safe_total = jnp.maximum(total, 1.0)

    ys = jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    mx = jnp.sum(m * xs) / safe_total
    my = jnp.sum(m * ys) / safe_total

    dx2 = jnp.sum(m * (xs - mx) ** 2) / safe_total
    dy2 = jnp.sum(m * (ys - my) ** 2) / safe_total
    dxy = jnp.sum(m * (xs - mx) * (ys - my)) / safe_total

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
