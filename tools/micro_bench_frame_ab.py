#!/usr/bin/env python3
"""Interleaved A/B of the full frame program under two
GraspScoringConfig variants (r5: envelope stride/k + dvd impl).

Variant A = the pre-r5 knobs (envelope stride 8 / k 2048, per-dx
interference pass-1); variant B = the r5 defaults (stride 16 / k 1024,
sparse-table "levels" pass-1).  Both parity and enhanced isolation
modes are measured, interleaved A/B/A/B in ONE process (absolute
timings drift 2-3x between processes on the tunnelled backend), and
every frame's grasp pixel is asserted IDENTICAL between variants --
the knobs are exactness-preserving by construction (coverage-guarded
envelope; reassociated integer mins), so any divergence is a bug.

Run on the chip: python tools/micro_bench_frame_ab.py [--reps 3]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax

FAMILIES = [
    ("sparse", 6, 8, 120),
    ("crowded", 12, 3, 60),
    ("large_leaf", 3, 5, 260),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--per-family", type=int, default=8)
    args = ap.parse_args()

    from leafgrasp_tpu.config import DEFAULT_CONFIG, GraspScoringConfig
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn

    cfg = DEFAULT_CONFIG
    cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)
    frames = []
    for name, n_leaves, seed, margin in FAMILIES:
        mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                      num_leaves=n_leaves, seed=seed,
                                      margin=margin)
        for i in range(args.per_family):
            frames.append((jax.device_put(np.roll(mask, 3 * i, axis=1)),
                           jax.device_put(np.roll(depth, 3 * i, axis=1))))

    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    variables = jax.device_put(variables)

    old_knobs = dict(envelope_stride=8, envelope_k=2048, dvd_impl="runs")
    variants = {}
    for mode in ("reference_self", "union"):
        variants[f"{mode}:old"] = make_frame_fn(cfg.replace(
            grasp=GraspScoringConfig(isolation_context=mode,
                                     **old_knobs)), with_cnn=True)
        variants[f"{mode}:new"] = make_frame_fn(cfg.replace(
            grasp=GraspScoringConfig(isolation_context=mode)),
            with_cnn=True)

    # compile + warm + output-identity check
    uv = {}
    for key, fn in variants.items():
        uv[key] = [np.asarray(fn(m, d, cx, cy, f, variables).grasp_uv)
                   for (m, d) in frames]
    for mode in ("reference_self", "union"):
        for i, (a, b) in enumerate(zip(uv[f"{mode}:old"],
                                       uv[f"{mode}:new"])):
            assert np.array_equal(a, b), (mode, i, a, b)
    print(f"grasp pixels identical old vs new: "
          f"{len(frames)} frames x 2 modes", flush=True)

    def run(fn):
        results = [fn(m, d, cx, cy, f, variables) for (m, d) in frames]
        np.asarray(results[-1].grasp_uv)

    best = {k: float("inf") for k in variants}
    for _ in range(args.reps):
        for key, fn in variants.items():     # interleaved A/B
            t0 = time.perf_counter()
            run(fn)
            best[key] = min(best[key],
                            (time.perf_counter() - t0) / len(frames))
    for key in variants:
        print(f"{key:22s} {best[key]*1e3:7.2f} ms/frame")
    for mode in ("reference_self", "union"):
        o, n = best[f"{mode}:old"], best[f"{mode}:new"]
        print(f"{mode}: old {o*1e3:.2f} -> new {n*1e3:.2f} ms/frame "
              f"({o/n:.3f}x)")


if __name__ == "__main__":
    main()
