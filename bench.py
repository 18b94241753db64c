#!/usr/bin/env python3
"""End-to-end grasp-selection benchmark on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Baseline: the reference publishes no FPS number (its node is rate-gated
at 10 Hz, leaf_grasp_node_v3.py:81; BASELINE.json sets the north star at
>= 50 frames/sec/chip on v5e) -> vs_baseline is value / 50.
"""

import json
import time

import numpy as np


def main():
    import jax

    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.io.scenes import make_leaf_scene

    cfg = DEFAULT_CONFIG  # full 1080x1440 frame, CNN fusion on
    mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                  num_leaves=6, seed=7)
    cx, cy, f = 707.87, 494.07, 1750.68

    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    fn = make_frame_fn(cfg, with_cnn=True)

    mask_d = jax.device_put(mask)
    depth_d = jax.device_put(depth)
    vars_d = jax.device_put(variables)

    # compile + warmup
    res = fn(mask_d, depth_d, cx, cy, f, vars_d)
    jax.block_until_ready(res)

    n_iter = 30
    t0 = time.perf_counter()
    for _ in range(n_iter):
        res = fn(mask_d, depth_d, cx, cy, f, vars_d)
    jax.block_until_ready(res)
    dt = time.perf_counter() - t0

    fps = n_iter / dt
    print(json.dumps({
        "metric": "end_to_end_grasp_selection_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
