#!/usr/bin/env python3
"""End-to-end grasp-selection benchmark on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "frames/s", "vs_baseline": N}

Methodology notes:
* N distinct frames are pre-staged on device; the loop dispatches all of
  them and then fetches each result's grasp pixel -- on this tunnelled
  backend ``block_until_ready`` does NOT synchronize, so value fetches
  are the only honest barrier.
* Three scene families are measured (sparse / crowded / large-leaf):
  leaf count and area drive the adaptive banded EDT and the leaf-bbox
  window ladder, so a single scene would hide their worst case.
  ``worst_case_fps`` reports the slowest family; the headline ``value``
  is the mixed-family aggregate throughput.
* Baseline: the reference publishes no FPS number (its node is
  rate-gated at 10 Hz, leaf_grasp_node_v3.py:81; BASELINE.json sets the
  north star at >= 50 frames/sec/chip on v5e) -> vs_baseline = fps / 50.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

# (name, num_leaves, seed, margin): sparse mirrors the r1 regression
# scene; crowded stresses the EDT band + run-graph labeling; large-leaf
# stresses the per-leaf window ladder (bbox close to the frame).
FAMILIES = [
    ("sparse", 6, 8, 120),
    ("crowded", 12, 3, 60),
    ("large_leaf", 3, 5, 260),
]


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
    cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)

    # 28/family (r5; was 14): the per-family subsets pay the same fixed
    # ~31 ms dispatch+fetch overhead as the 3x-larger mixed aggregate,
    # so at 14 frames they under-read the chip's steady-state throughput
    # by ~2 fps (PERF.md "measurement caveat"); 28 frames amortize the
    # overhead like the mixed run while keeping the same scene diversity
    # (distinct np.roll offsets). Same-session interleaved A/B at the
    # switch: sparse-enhanced 62.5 fps at 14 frames vs 66.9 at 28
    # (identical program, 3 reps each within 1%).
    per_family = int(os.environ.get("LEAFGRASP_BENCH_PER_FAMILY", "28"))
    frames = []                      # list of (family, mask_dev, depth_dev)
    for name, n_leaves, seed, margin in FAMILIES:
        mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                      num_leaves=n_leaves, seed=seed,
                                      margin=margin)
        for i in range(per_family):
            frames.append((name,
                           jax.device_put(np.roll(mask, 3 * i, axis=1)),
                           jax.device_put(np.roll(depth, 3 * i, axis=1))))

    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    variables = jax.device_put(variables)

    def measure(config):
        fn = make_frame_fn(config, with_cnn=True)
        # compile + warmup (value fetch is the only honest barrier here)
        res = fn(frames[0][1], frames[0][2], cx, cy, f, variables)
        _ = np.asarray(res.grasp_uv)

        def run(subset):
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                results = [fn(m, d, cx, cy, f, variables)
                           for (_, m, d) in subset]
                # single-device execution is in dispatch order: fetching
                # the last result bounds all prior computes with ONE
                # round trip
                uv = np.asarray(results[-1].grasp_uv)
                assert uv.shape == (2,)
                best = min(best, time.perf_counter() - t0)
            return len(subset) / best

        mixed = run(frames)
        fam = {name: run([fr for fr in frames if fr[0] == name])
               for name, *_ in FAMILIES}
        return mixed, fam

    fps, fam = measure(cfg)
    fps_enh, fam_enh = measure(cfg_enh)
    worst = min(fam.values())
    rec = {
        "metric": "end_to_end_grasp_selection_frames_per_sec_per_chip",
        "value": round(fps, 3),
        "unit": "frames/s",
        "vs_baseline": round(fps / 50.0, 4),
        "enhanced_isolation_mode_fps": round(fps_enh, 3),
        "worst_case_fps": round(worst, 3),
        "family_fps": {k: round(v, 3) for k, v in fam.items()},
        "family_fps_enhanced": {k: round(v, 3) for k, v in fam_enh.items()},
    }
    # Combined VLA-enhanced service throughput (frame + 7B rerank in one
    # GraspService). Building/quantizing 7B-dims weights takes many
    # minutes on this host, so the number is measured by
    # tools/bench_vla_service.py (which writes the artifact read here)
    # rather than inline; provenance fields say when/how it was taken.
    vla_art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "artifacts", "vla_service_bench.json")
    if os.path.exists(vla_art):
        with open(vla_art) as f:
            v = json.load(f)
        # the service DEFAULT is serial (pipeline_depth=0): the overlap
        # A/B measured 0.917x of serial (PERF.md "combined VLA service"),
        # so reporting max() would mask an overlap regression fix --
        # report the default mode and carry both in the provenance
        rec["vla_service_fps"] = v["value"]
        try:
            head = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
                cwd=os.path.dirname(os.path.abspath(__file__)),
            ).stdout.strip() or None
        except Exception:
            head = None
        art_rev = v.get("git_rev")
        if head and art_rev and head != art_rev:
            print(f"WARNING: vla_service_bench.json was measured at "
                  f"{art_rev} but HEAD is {head}; the replayed "
                  f"vla_service_fps may be stale -- re-run "
                  f"tools/bench_vla_service.py", file=sys.stderr)
        rec["vla_service_provenance"] = {
            "tool": "tools/bench_vla_service.py",
            "quantize": v.get("quantize"), "dims": v.get("dims"),
            "backend": v.get("backend"),
            "recorded_unix": v.get("recorded_unix"),
            "git_rev": art_rev, "head_rev": head,
            "serial_fps": v["value"],
            "overlap_fps": v.get("overlap_fps")}
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
