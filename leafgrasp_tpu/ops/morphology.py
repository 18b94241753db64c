"""Binary morphology with OpenCV-parity structuring elements, in pure JAX.

Replaces ``cv2.dilate`` / ``cv2.erode`` with elliptical kernels
(reference grasp_point_selector.py:601-616,696-699,705-711,778-779 and
data_collector.py:428-452).

Dilation/erosion of a binary mask by a 0/1 structuring element (SE) is
expressed as a single 2D correlation (one fused XLA/MXU op) followed by a
threshold -- no scalar loops, static shapes, jit-friendly.

Border semantics match OpenCV's defaults exactly:
* dilate: out-of-bounds treated as 0 (``BORDER_CONSTANT`` with -inf),
* erode:  out-of-bounds treated as 1 (``BORDER_CONSTANT`` with +inf),
implemented via the duality ``erode(m) = ~dilate(~m)`` (the elliptical SEs
used here are symmetric, so no kernel flip is needed).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["elliptical_kernel", "rect_kernel", "dilate", "erode",
           "morphological_boundary"]


@functools.lru_cache(maxsize=64)
def elliptical_kernel(width: int, height: int | None = None) -> np.ndarray:
    """Reproduce ``cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (w, h))``.

    Follows OpenCV's rasterization rule bit-for-bit: for each row i with
    dy = i - r (r = h//2), the run of ones spans
    [max(c - dx, 0), min(c + dx + 1, w)) where
    dx = round-half-away(c * sqrt((r*r - dy*dy) / (r*r))).
    (OpenCV ``getStructuringElement``, modules/imgproc/src/morph.cpp.)
    """
    if height is None:
        height = width
    r = height // 2
    c = width // 2
    inv_r2 = 1.0 / (r * r) if r else 0.0
    kernel = np.zeros((height, width), dtype=np.uint8)
    for i in range(height):
        dy = i - r
        if abs(dy) > r:
            continue
        dx = int(np.floor(c * np.sqrt(max(r * r - dy * dy, 0) * inv_r2) + 0.5))
        j1 = max(c - dx, 0)
        j2 = min(c + dx + 1, width)
        kernel[i, j1:j2] = 1
    return kernel


@functools.lru_cache(maxsize=16)
def rect_kernel(width: int, height: int | None = None) -> np.ndarray:
    if height is None:
        height = width
    return np.ones((height, width), dtype=np.uint8)


def _binary_correlate(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """SAME-padded 2D correlation of a 0/1 mask with a 0/1 kernel.

    Padding offsets match OpenCV's anchor convention (anchor at
    (kw//2, kh//2)): for even kernel sizes the extra pad goes *before*,
    because correlation at pixel p reads p + (offset - anchor) for
    offset in [0, k).
    """
    kh, kw = kernel.shape
    x = jnp.asarray(mask, jnp.float32)[None, None]       # NCHW
    k = jnp.asarray(kernel, jnp.float32)[None, None]     # OIHW
    out = jax.lax.conv_general_dilated(
        x, k,
        window_strides=(1, 1),
        padding=((kh // 2, kh - 1 - kh // 2), (kw // 2, kw - 1 - kw // 2)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out[0, 0]


def dilate(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Binary dilation; returns bool (H, W). OOB pixels are background."""
    counts = _binary_correlate(jnp.asarray(mask, bool), kernel)
    return counts > 0.5


def erode(mask: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Binary erosion with OpenCV border semantics (OOB = foreground)."""
    return ~dilate(~jnp.asarray(mask, bool), kernel)


def morphological_boundary(mask: jnp.ndarray,
                           kernel: np.ndarray | None = None) -> jnp.ndarray:
    """mask minus its erosion: the reference's tip/contour band
    (grasp_point_selector.py:705-708)."""
    if kernel is None:
        kernel = elliptical_kernel(3, 3)
    m = jnp.asarray(mask, bool)
    return m & ~erode(m, kernel)
