#!/usr/bin/env python3
"""End-to-end grasp-selection benchmark on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Methodology notes:
* N distinct frames are pre-staged on device; the loop dispatches all of
  them and then fetches each result's grasp pixel -- on this tunnelled
  backend ``block_until_ready`` does NOT synchronize, so value fetches
  are the only honest barrier.
* Baseline: the reference publishes no FPS number (its node is
  rate-gated at 10 Hz, leaf_grasp_node_v3.py:81; BASELINE.json sets the
  north star at >= 50 frames/sec/chip on v5e) -> vs_baseline = fps / 50.
"""

import json
import os
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_leafgrasp_bench"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax

    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.io.scenes import make_leaf_scene

    cfg = DEFAULT_CONFIG  # full 1080x1440 frame, CNN fusion on
    mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                  num_leaves=6, seed=7)
    cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)

    n_frames = 20
    masks = [jax.device_put(np.roll(mask, 3 * i, axis=1))
             for i in range(n_frames)]
    depths = [jax.device_put(np.roll(depth, 3 * i, axis=1))
              for i in range(n_frames)]

    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    variables = jax.device_put(variables)
    fn = make_frame_fn(cfg, with_cnn=True)

    # compile + warmup (full sync via value fetch)
    res = fn(masks[0], depths[0], cx, cy, f, variables)
    _ = np.asarray(res.grasp_uv)

    t0 = time.perf_counter()
    results = [fn(masks[i], depths[i], cx, cy, f, variables)
               for i in range(n_frames)]
    uvs = [np.asarray(r.grasp_uv) for r in results]
    dt = time.perf_counter() - t0
    assert all(uv.shape == (2,) for uv in uvs)

    fps = n_frames / dt
    print(json.dumps({
        "metric": "end_to_end_grasp_selection_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 4),
    }))


if __name__ == "__main__":
    main()
