#!/usr/bin/env python3
"""Row-sharded single-frame pipeline demo on a virtual 8-device mesh.

Shows the spatial (CP-analogue) path: one frame's rows partitioned over
the mesh's data axis, the full program -- leaf Pareto selection, score
maps, spaced top-k, 3D lift, pre-grasp -- running under one shard_map
with ICI collectives, and the result matching the single-device
pipeline exactly.

Run: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \\
       python examples/run_spatial_demo.py
(on a real multi-chip TPU slice, drop the env vars.)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

if "xla_force_host_platform_device_count" not in os.environ.get(
        "XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def main():
    import jax
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass

    from leafgrasp_tpu.config import (DEFAULT_CONFIG, FrameConfig,
                                      LeafSelectionConfig)
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.parallel.mesh import make_mesh
    from leafgrasp_tpu.parallel.spatial_frame import make_sharded_frame_fn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn

    n_dev = len(jax.devices())
    mesh = make_mesh(n_dev, model_axis=1)
    shards = mesh.shape["data"]
    h = 135 * shards if 1080 % shards else 1080  # rows must divide
    cfg = DEFAULT_CONFIG.replace(
        frame=FrameConfig(height=h, width=360, max_leaves=8),
        leaf=LeafSelectionConfig(min_leaf_area=1500))

    mask, depth = make_leaf_scene(h, 360, num_leaves=5, seed=8, margin=40)
    cx, cy, f = np.float32(180.0), np.float32(h / 2.0), np.float32(430.0)

    print(f"mesh: {dict(mesh.shape)}  frame: {h}x360 "
          f"({h // shards} rows/shard)")
    sharded = make_sharded_frame_fn(mesh, cfg, with_cnn=False)
    r = sharded(mask, depth, cx, cy, f)
    print(f"sharded : leaf {int(r.leaf_id)}  uv {np.asarray(r.grasp_uv)}"
          f"  3d {np.asarray(r.grasp_xyz).round(4)}")

    single = make_frame_fn(cfg, with_cnn=False, use_pallas=False)
    s = single(mask, depth, cx, cy, f)
    print(f"single  : leaf {int(s.leaf_id)}  uv {np.asarray(s.grasp_uv)}"
          f"  3d {np.asarray(s.grasp_xyz).round(4)}")
    same = (int(r.leaf_id) == int(s.leaf_id)
            and np.array_equal(np.asarray(r.grasp_uv),
                               np.asarray(s.grasp_uv)))
    print("row-sharded == single-device:", same)


if __name__ == "__main__":
    main()
