#!/usr/bin/env python3
"""Randomized differential parity fuzzer.

The golden/production parity sets (tools/parity_report.py) pin 42 fixed
scenes; this fuzzes the SPACE around them: random leaf counts, margins,
and camera intrinsics per scene, pipeline vs the exact-EDT oracle
transcription (tests/reference_impl.py), asserting the chosen leaf, the
grasp pixel, and the published message agree on every non-degenerate
frame (degenerate frames -- empty valid region after the
min_edge_distance gate -- are reported but not compared: the reference
publishes an arbitrary zero-score pixel there,
grasp_point_selector.py:282-288).

One frame-shape per run (the jitted program compiles per (H, W)).
Default 540x720: the generator's leaves are fixed-size in PIXELS
(scenes.py:48-49), so smaller frames over-produce degenerate crowded
frames that the reference's valid-region gate discards anyway:
  python tools/fuzz_parity.py --n 100 [--h 540 --w 720] [--seed0 1000]

Writes artifacts/fuzz_parity.json; exits nonzero on any mismatch.
"""
import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--h", type=int, default=540)
    ap.add_argument("--w", type=int, default=720)
    ap.add_argument("--min-area", type=int, default=1500)
    ap.add_argument("--seed0", type=int, default=1000)
    args = ap.parse_args()
    H, W, AREA = args.h, args.w, args.min_area

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig)
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.pipeline.ingest import format_result_message
    import reference_impl as ref
    from test_geometry import _ref_candidates, _ref_pre_grasp

    # max_leaves must bound the scene's instance count: slots beyond it
    # are dropped by design (compact_instance_ids keeps the largest) and
    # the oracle would see leaves the pipeline was told to ignore --
    # the first fuzz run caught exactly that as 7 'mismatches' at 9-10
    # leaves under max_leaves=8.
    cfg = PipelineConfig(frame=FrameConfig(height=H, width=W, max_leaves=12),
                         leaf=LeafSelectionConfig(min_leaf_area=AREA))
    fn = make_frame_fn(cfg, with_cnn=False)

    rng = np.random.default_rng(args.seed0)
    stats = {"n": 0, "degenerate": 0, "empty": 0,
             "leaf_match": 0, "uv_match": 0, "msg_match": 0}
    mismatches = []
    for i in range(args.n):
        scene_seed = int(rng.integers(0, 100000))
        n_leaves = int(rng.integers(3, 11))
        lo, hi = int(0.10 * min(H, W)), int(0.35 * min(H, W))
        margin = int(rng.integers(lo, hi + 1))
        cx = float(W / 2 + rng.uniform(-30, 30))
        cy = float(H / 2 + rng.uniform(-30, 30))
        f = float(rng.uniform(600, 1800))
        mask, depth = make_leaf_scene(height=H, width=W,
                                      num_leaves=n_leaves,
                                      seed=scene_seed, margin=margin)
        case = {"i": i, "scene_seed": scene_seed, "n_leaves": n_leaves,
                "margin": margin, "cx": cx, "cy": cy, "f": f}
        res = fn(mask, depth, np.float32(cx), np.float32(cy),
                 np.float32(f))
        stats["n"] += 1

        leaf, _ = ref.select_leaf_reference(mask, depth, cx, cy, f,
                                            min_area=AREA, mode="exact")
        ours_found = bool(res.found)
        if leaf is None or not ours_found:
            if (leaf is None) != (not ours_found):
                mismatches.append({**case, "kind": "found_flag",
                                   "ref_leaf": leaf,
                                   "ours_found": ours_found})
            stats["empty"] += 1
            continue
        ours_leaf = int(res.leaf_id)
        if leaf != ours_leaf:
            mismatches.append({**case, "kind": "leaf",
                               "ref": leaf, "ours": ours_leaf})
            continue
        stats["leaf_match"] += 1
        if bool(res.degenerate):
            stats["degenerate"] += 1
            continue
        o = ref.grasp_scores_reference(mask == leaf, mask > 0, depth,
                                       cx, cy, f, mode="exact")
        cands = _ref_candidates(o["traditional_score"],
                                o["valid_region"], 20, 10)
        if not cands:
            stats["degenerate"] += 1
            continue
        rx, ry = cands[0]
        ours_uv = tuple(int(v) for v in np.asarray(res.grasp_uv))
        if (rx, ry) != ours_uv:
            mismatches.append({**case, "kind": "pixel",
                               "ref": (rx, ry), "ours": ours_uv})
            continue
        stats["uv_match"] += 1
        d = float(depth[ry, rx])
        g3 = np.array([(d * (rx - cx)) / f, (d * (ry - cy)) / f, d],
                      np.float32)
        pre = _ref_pre_grasp(g3, (mask == leaf).astype(np.uint8),
                             cx, cy, f)
        msg_ref = format_result_message(np.array([rx, ry]), g3,
                                        np.array(pre, np.float32))
        msg_ours = format_result_message(
            np.asarray(res.grasp_uv), np.asarray(res.grasp_xyz),
            np.asarray(res.pre_grasp_xyz))
        a = [float(t) for t in msg_ref.split(",")]
        b = [float(t) for t in msg_ours.split(",")]
        ok = len(a) == len(b) and all(
            (x == y) if j < 2 else abs(x - y) <= 1e-5 * max(1.0, abs(x))
            for j, (x, y) in enumerate(zip(a, b)))
        if ok:
            stats["msg_match"] += 1
        else:
            mismatches.append({**case, "kind": "message",
                               "ref": msg_ref, "ours": msg_ours})

    out = {"params": vars(args), "stats": stats,
           "mismatches": mismatches}
    os.makedirs("artifacts", exist_ok=True)
    with open("artifacts/fuzz_parity.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps({"fuzz_scenes": stats["n"],
                      "compared": stats["uv_match"] + len(
                          [m for m in mismatches
                           if m["kind"] in ("pixel", "message")]),
                      **stats, "mismatch_count": len(mismatches)}))
    if mismatches:
        for m in mismatches[:5]:
            print("MISMATCH:", json.dumps(m))
        sys.exit(1)


if __name__ == "__main__":
    main()
