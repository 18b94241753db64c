"""Synthetic leaf-scene generation for tests, benchmarks and VLA training.

The reference QA strategy is built on synthetic ellipse-leaf scenes
(reference vla_system/demos/test_vla_simple.py:23-50 and
vla_system/training/aws_vla_training.py:36-101).  This module is the
deterministic, numpy-based equivalent used as golden-frame fixtures for
every parity test in ``tests/``.
"""

from __future__ import annotations

import numpy as np


def make_leaf_scene(
    height: int = 1080,
    width: int = 1440,
    num_leaves: int = 5,
    seed: int = 0,
    depth_near: float = 0.35,
    depth_far: float = 0.75,
    margin: int = 120,
):
    """Generate an instance-id mask map and a depth map with elliptical leaves.

    Returns
    -------
    mask : int16 (H, W) instance ids, 0 = background, ids 1..num_leaves
        (later leaves overwrite earlier ones where they overlap, like a
        painter's algorithm -- matches how YOLO instance maps rasterize).
    depth : float32 (H, W) metric depth; background is a far plane with a
        gentle gradient, each leaf is a smooth bump at its own depth.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:height, 0:width].astype(np.float32)

    mask = np.zeros((height, width), dtype=np.int16)
    # Background: far plane with slight tilt + low-frequency ripple.
    depth = (
        depth_far
        + 0.05 * (yy / height)
        + 0.01 * np.sin(xx / width * 3.1)
    ).astype(np.float32)

    for leaf_id in range(1, num_leaves + 1):
        cx = rng.uniform(margin, width - margin)
        cy = rng.uniform(margin, height - margin)
        a = rng.uniform(90, 170)    # semi-major (px)
        b = rng.uniform(55, 110)    # semi-minor (px)
        theta = rng.uniform(0, np.pi)
        z = rng.uniform(depth_near, depth_far - 0.05)

        ct, st = np.cos(theta), np.sin(theta)
        xr = (xx - cx) * ct + (yy - cy) * st
        yr = -(xx - cx) * st + (yy - cy) * ct
        r2 = (xr / a) ** 2 + (yr / b) ** 2
        inside = r2 <= 1.0

        mask[inside] = leaf_id
        # Leaf surface: gentle paraboloid bulge toward the camera.
        leaf_depth = z + 0.015 * r2
        depth[inside] = leaf_depth[inside].astype(np.float32)

    return mask, depth


def default_projection(fx: float = 1750.68, cx: float = 707.87,
                       cy: float = 494.07, baseline: float = 0.124):
    """3x4 projection matrix matching the reference camera
    (reference leaf_grasp_node_2.py:23-27)."""
    p = np.zeros((3, 4), dtype=np.float64)
    p[0, 0] = fx
    p[1, 1] = fx
    p[0, 2] = cx
    p[1, 2] = cy
    p[2, 2] = 1.0
    p[0, 3] = -fx * baseline
    return p
