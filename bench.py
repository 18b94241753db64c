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
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    import jax

    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.io.scenes import make_leaf_scene

    # Reference-parity configuration: the reference's production node
    # passes only the single-leaf mask into isolation scoring, making its
    # interference term degenerate (leaf_grasp_node_v3.py:117-119); the
    # 'reference_self' mode reproduces that exactly. The enhanced mode
    # (true leaf-union interference) is also measured and reported.
    from leafgrasp_tpu.config import GraspScoringConfig
    cfg = DEFAULT_CONFIG.replace(
        grasp=GraspScoringConfig(isolation_context="reference_self"))
    cfg_enh = DEFAULT_CONFIG
    mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                  num_leaves=6, seed=8)
    cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)

    n_frames = 40
    masks = [jax.device_put(np.roll(mask, 3 * i, axis=1))
             for i in range(n_frames)]
    depths = [jax.device_put(np.roll(depth, 3 * i, axis=1))
              for i in range(n_frames)]

    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    variables = jax.device_put(variables)

    def measure(config):
        fn = make_frame_fn(config, with_cnn=True)
        # compile + warmup (value fetch is the only honest barrier here)
        res = fn(masks[0], depths[0], cx, cy, f, variables)
        _ = np.asarray(res.grasp_uv)
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            results = [fn(masks[i], depths[i], cx, cy, f, variables)
                       for i in range(n_frames)]
            # single-device execution is in dispatch order: fetching the
            # last result bounds all prior computes with ONE round trip
            uv = np.asarray(results[-1].grasp_uv)
            assert uv.shape == (2,)
            best = min(best, time.perf_counter() - t0)
        return n_frames / best

    fps = measure(cfg)
    fps_enh = measure(cfg_enh)
    print(json.dumps({
        "metric": "end_to_end_grasp_selection_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 4),
        "enhanced_isolation_mode_fps": round(fps_enh, 3),
    }))


if __name__ == "__main__":
    main()
