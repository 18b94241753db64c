"""Small separable convolutions: Gaussian smoothing and Sobel gradients.

Replaces the reference's torch conv kernels (image_processor.py:15-32,
56-64 and grasp_point_selector.py:635-657).  JAX's
``lax.conv_general_dilated`` is a correlation (same convention as
``torch.nn.functional.conv2d``), so kernels are used unflipped.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

__all__ = ["gaussian_kernel", "SOBEL_X", "SOBEL_Y", "reflect_conv2d",
           "smooth_depth", "sobel_gradients", "flatness_from_depth"]


@functools.lru_cache(maxsize=8)
def gaussian_kernel(size: int) -> np.ndarray:
    """Normalized 2D Gaussian with sigma = size/6
    (reference image_processor.py:25-32)."""
    sigma = size / 6.0
    center = size // 2
    x, y = np.meshgrid(np.arange(size), np.arange(size))
    kernel = np.exp(-((x - center) ** 2 + (y - center) ** 2)
                    / (2.0 * sigma ** 2))
    return (kernel / kernel.sum()).astype(np.float32)


SOBEL_X = np.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], dtype=np.float32)
SOBEL_Y = SOBEL_X.T.copy()


def reflect_conv2d(img: jnp.ndarray, kernel: np.ndarray) -> jnp.ndarray:
    """Correlate (H, W) with a small kernel under reflect padding.

    Matches torch ``F.pad(mode='reflect')`` + ``F.conv2d``
    (image_processor.py:60-64, grasp_point_selector.py:648-651).
    """
    kh, kw = kernel.shape
    ph, pw = kh // 2, kw // 2
    padded = jnp.pad(img, ((ph, ph), (pw, pw)), mode="reflect")
    x = padded[None, None].astype(jnp.float32)
    k = jnp.asarray(kernel, jnp.float32)[None, None]
    out = jax.lax.conv_general_dilated(
        x, k, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)
    return out[0, 0]


def _conv1d_reflect(img: jnp.ndarray, taps, axis: int) -> jnp.ndarray:
    """1D correlation along `axis` under reflect padding, as shifted
    multiply-adds (TPU-native: XLA on TPU lowers single-channel spatial
    convs catastrophically -- measured ~90 ms for a 5x5 at 1080x1440 --
    while k fused shift-adds run in microseconds)."""
    taps = np.asarray(taps, np.float32).ravel()
    k = len(taps)
    p = k // 2
    pad = [(0, 0), (0, 0)]
    pad[axis] = (p, p)
    padded = jnp.pad(img.astype(jnp.float32), pad, mode="reflect")
    n = img.shape[axis]
    out = None
    for i, t in enumerate(taps):
        if t == 0.0:
            continue
        sl = [slice(None), slice(None)]
        sl[axis] = slice(i, i + n)
        term = padded[tuple(sl)] * jnp.float32(t)
        out = term if out is None else out + term
    return out


def separable_conv2d_reflect(img: jnp.ndarray, col_taps,
                             row_taps) -> jnp.ndarray:
    """2D correlation with kernel = outer(col_taps, row_taps), reflect
    padded. Exactly equals ``reflect_conv2d`` for separable kernels
    (per-axis reflection commutes with per-axis convolution)."""
    return _conv1d_reflect(_conv1d_reflect(img, col_taps, 0), row_taps, 1)


@functools.lru_cache(maxsize=8)
def gaussian_taps_1d(size: int):
    """1D factor of the isotropic Gaussian (normalized)."""
    sigma = size / 6.0
    x = np.arange(size) - size // 2
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return tuple((g / g.sum()).astype(np.float32))


def smooth_depth(depth: jnp.ndarray, size: int = 5) -> jnp.ndarray:
    """Gaussian depth smoothing (reference image_processor.py:56-64),
    as an exact separable factorization."""
    taps = gaussian_taps_1d(size)
    return separable_conv2d_reflect(depth, taps, taps)


def sobel_gradients(img: jnp.ndarray):
    """(dx, dy) Sobel gradients with reflect padding
    (grasp_point_selector.py:646-651): sobel_x = [1,2,1]^T (x) [-1,0,1]."""
    smooth_taps = (1.0, 2.0, 1.0)
    diff_taps = (-1.0, 0.0, 1.0)
    dx = separable_conv2d_reflect(img, smooth_taps, diff_taps)
    dy = separable_conv2d_reflect(img, diff_taps, smooth_taps)
    return dx, dy


def flatness_from_depth(masked_depth: jnp.ndarray, scale: float = 5.0,
                        gaussian_size: int = 5) -> jnp.ndarray:
    """exp(-|grad(smooth(depth))| * scale)
    (reference grasp_point_selector.py:635-657)."""
    smoothed = smooth_depth(masked_depth, gaussian_size)
    dx, dy = sobel_gradients(smoothed)
    grad_mag = jnp.sqrt(dx * dx + dy * dy)
    return jnp.exp(-grad_mag * scale)
