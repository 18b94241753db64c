#!/usr/bin/env python3
"""Parity harness: bit-level agreement report vs the reference algorithms.

Runs a set of golden synthetic scenes through (a) the TPU-native pipeline
and (b) the loop-based transcription of the reference algorithms
(tests/reference_impl.py) in two oracle modes:

* exact  -- oracle uses the same exact EDT the framework computes: every
            score map, the chosen leaf and the chosen grasp pixel must
            match bit-for-bit (up to f32 rounding);
* cv2    -- oracle runs OpenCV's own chamfer transforms exactly as the
            reference calls them: leaf choice must match; the grasp pixel
            may shift by a few px (documented EDT divergence) and is
            reported with the score-equivalence gap.

Writes PARITY.json at the repo root and prints a summary table.
"""

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tests"))

SCENES = [(s, 4) for s in (0, 1, 3, 5, 7, 11, 13, 17, 19, 23)] + \
    [(s, 6) for s in (2, 4, 8, 10, 14, 16, 20, 22)] + \
    [(s, 8) for s in (6, 9, 15, 18)] + \
    [(s, 3) for s in (25, 26, 27, 28)]
H, W = 270, 360
CX, CY, F = 180.0, 135.0, 800.0
AREA = 1500


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig)
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    import reference_impl as ref
    from test_geometry import _ref_candidates

    cfg = PipelineConfig(frame=FrameConfig(height=H, width=W, max_leaves=8),
                         leaf=LeafSelectionConfig(min_leaf_area=AREA))
    fn = make_frame_fn(cfg, with_cnn=False)

    rows = []
    for seed, n_leaves in SCENES:
        mask, depth = make_leaf_scene(height=H, width=W,
                                      num_leaves=n_leaves, seed=seed,
                                      margin=40)
        res = fn(mask, depth, CX, CY, F)
        ours_leaf = int(res.leaf_id)
        ours_uv = tuple(int(v) for v in np.asarray(res.grasp_uv))
        degenerate = bool(res.degenerate)

        row = {"seed": seed, "n_leaves": n_leaves, "ours_leaf": ours_leaf,
               "ours_uv": ours_uv, "degenerate": degenerate}
        for mode in ("exact", "cv2"):
            leaf, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                                min_area=AREA, mode=mode)
            entry = {"leaf": leaf, "leaf_match": leaf == ours_leaf}
            if leaf is not None:
                o = ref.grasp_scores_reference(mask == leaf, mask > 0,
                                               depth, CX, CY, F, mode=mode)
                cands = _ref_candidates(o["traditional_score"],
                                        o["valid_region"], 20, 10)
                if cands:
                    rx, ry = cands[0]
                    entry["uv"] = (rx, ry)
                    entry["uv_match"] = (rx, ry) == ours_uv
                    entry["px_dist"] = abs(rx - ours_uv[0]) + \
                        abs(ry - ours_uv[1])
                    s_ref = float(o["traditional_score"][ry, rx])
                    uo = min(max(ours_uv[0], 0), W - 1)
                    vo = min(max(ours_uv[1], 0), H - 1)
                    s_ours = float(o["traditional_score"][vo, uo])
                    entry["score_gap"] = abs(s_ref - s_ours)
            row[mode] = entry
        rows.append(row)
        print(f"seed={seed:3d} leaves={n_leaves} ours leaf={ours_leaf} "
              f"uv={ours_uv} | exact: leaf_match="
              f"{row['exact']['leaf_match']} uv_match="
              f"{row['exact'].get('uv_match')} | cv2: leaf_match="
              f"{row['cv2']['leaf_match']} px_dist="
              f"{row['cv2'].get('px_dist')} score_gap="
              f"{row['cv2'].get('score_gap', 0):.2e}")

    # degenerate frames (empty valid region): the reference publishes a
    # zero-score tie-broken pixel there; excluded from pixel parity
    live = [r for r in rows if not r["degenerate"]]
    summary = {
        "scenes": len(rows),
        "degenerate_scenes": len(rows) - len(live),
        "exact_leaf_match": sum(r["exact"]["leaf_match"] for r in rows),
        "exact_uv_match": sum(bool(r["exact"].get("uv_match"))
                              for r in live),
        "live_scenes": len(live),
        "cv2_leaf_match": sum(r["cv2"]["leaf_match"] for r in rows),
        "cv2_uv_match": sum(bool(r["cv2"].get("uv_match")) for r in live),
        "cv2_max_px_dist": max((r["cv2"].get("px_dist", 0)
                                for r in live), default=0),
        "cv2_max_score_gap": max((r["cv2"].get("score_gap", 0.0)
                                  for r in live), default=0.0),
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PARITY.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nexact-mode: leaf {summary['exact_leaf_match']}/"
          f"{summary['scenes']}, pixel {summary['exact_uv_match']}/"
          f"{summary['live_scenes']} "
          f"({summary['degenerate_scenes']} degenerate excluded)")
    print(f"cv2-chamfer-mode: leaf {summary['cv2_leaf_match']}/"
          f"{summary['scenes']}, pixel {summary['cv2_uv_match']}/"
          f"{summary['live_scenes']}, max px dist "
          f"{summary['cv2_max_px_dist']}, max score gap "
          f"{summary['cv2_max_score_gap']:.2e}")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
