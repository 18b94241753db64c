#!/usr/bin/env python3
"""Render the checked-in sample composite (artifacts/sample_composite.png).

The reference ships eyeball-able sample outputs (test_visualization/,
grasp_point_visualization/); this is the rebuild's equivalent: the r1
regression scene through the full CV pipeline + LeafVisualizer, with a
synthetic depth-shaded stand-in for the RAFT left-rectified image on
the composite's left half (visualizer.py:129-157).

Run (CPU is fine): python tools/render_sample.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.pipeline.visualizer import LeafVisualizer

    cfg = DEFAULT_CONFIG
    mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                  num_leaves=6, seed=8, margin=120)
    fn = make_frame_fn(cfg, with_cnn=False)
    res = fn(mask, depth, np.float32(707.87), np.float32(494.07),
             np.float32(1750.68))
    rgb = np.clip((depth - depth.min()) / (np.ptp(depth) + 1e-6), 0, 1)
    rgb = np.stack([0.3 + 0.5 * (mask > 0) * rgb, 0.25 + 0.55 * rgb,
                    0.3 * np.ones_like(rgb)], -1)
    viz = LeafVisualizer()
    tall = [i + 1 for i, t in
            enumerate(np.asarray(res.leaf_selection.is_tall)) if t]
    frame = viz.render(mask, int(res.leaf_id),
                       grasp_uv=np.asarray(res.grasp_uv),
                       grasp_xyz=np.asarray(res.grasp_xyz),
                       pre_grasp_xyz=np.asarray(res.pre_grasp_xyz),
                       tall_leaves=tall, rgb=rgb)
    from PIL import Image
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "sample_composite.png")
    Image.fromarray(frame).save(out, optimize=True)
    print("wrote", out, frame.shape)


if __name__ == "__main__":
    main()
