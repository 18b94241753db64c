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

Per scene it also records the full published tuple -- 3D grasp,
pre-grasp, and the reference's message string
(leaf_grasp_node_v3.py:170-177) -- and an ORIENTATION PROBE: the oracle
re-run with the reference's cv2.minAreaRect major-axis angle
(grasp_point_selector.py:718-752) instead of moment-PCA, quantifying the
documented orientation-source divergence (grasp_scorer.py:14-17).

--scale golden      270x360, min_area 1500, 26 scenes (fast CI set)
--scale production  1080x1440, min_area 10000 (leaf_scorer.py:80),
                    fx 1750.68 (leaf_grasp_node_v3 camera), 16 scenes

Writes PARITY.json (golden) / PARITY_production.json at the repo root.
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

GOLDEN = {
    # Scenes chosen so degenerate frames (empty valid region after the
    # min_edge_distance erosion; the reference publishes a zero-score
    # pixel there) are the EXCEPTION, as at production scale: r1's set
    # had 8/26 degenerate at 270x360, these swaps (same leaf-count
    # distribution, scanned via tools-free pipeline runs) leave 1/26
    # kept intentionally as the degenerate-path regression scene.
    "scenes": [(s, 4) for s in (0, 30, 3, 5, 7, 11, 13, 17, 19, 23)]
    + [(s, 6) for s in (29, 31, 8, 33, 14, 16, 20, 22)]
    + [(s, 8) for s in (2, 9, 34, 36)]
    + [(s, 3) for s in (25, 26, 27, 28)],
    "h": 270, "w": 360, "cx": 180.0, "cy": 135.0, "f": 800.0,
    "area": 1500, "margin": 40, "out": "PARITY.json",
}
PRODUCTION = {
    # all-live set (the degenerate code path is regression-covered by
    # the golden set's deliberate scene); swaps keep the leaf-count
    # distribution: (7,4)->(37,4), (2,6)->(39,6), (6,8)->(38,8),
    # (27,3)->(40,3)
    "scenes": [(s, 4) for s in (0, 3, 37, 13)]
    + [(s, 6) for s in (39, 8, 14, 20)]
    + [(s, 8) for s in (38, 9, 15, 18)]
    + [(s, 3) for s in (25, 26, 40, 28)],
    "h": 1080, "w": 1440, "cx": 707.87, "cy": 494.07, "f": 1750.68,
    "area": 10000, "margin": 80, "out": "PARITY_production.json",
}


def min_area_rect_angle(leaf_mask):
    """The reference's orientation source: cv2.minAreaRect of the
    largest external contour (grasp_point_selector.py:718-752)."""
    import cv2
    m8 = np.asarray(leaf_mask, np.uint8)
    contours, _ = cv2.findContours(m8, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
    if not contours:
        return None
    contour = max(contours, key=cv2.contourArea)
    rect = cv2.minAreaRect(contour)
    size, angle = rect[1], rect[2]
    if size[0] < size[1]:
        angle = angle + 90
    return float(np.deg2rad(angle))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", choices=("golden", "production"),
                    default="golden")
    args = ap.parse_args()
    P = GOLDEN if args.scale == "golden" else PRODUCTION
    H, W, AREA = P["h"], P["w"], P["area"]
    CX, CY, F = P["cx"], P["cy"], P["f"]

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
    from leafgrasp_tpu.pipeline.ingest import format_result_message
    import reference_impl as ref
    from test_geometry import _ref_candidates, _ref_pre_grasp

    cfg = PipelineConfig(frame=FrameConfig(height=H, width=W, max_leaves=8),
                         leaf=LeafSelectionConfig(min_leaf_area=AREA))
    fn = make_frame_fn(cfg, with_cnn=False)

    rows = []
    for seed, n_leaves in P["scenes"]:
        mask, depth = make_leaf_scene(height=H, width=W,
                                      num_leaves=n_leaves, seed=seed,
                                      margin=P["margin"])
        res = fn(mask, depth, CX, CY, F)
        ours_leaf = int(res.leaf_id)
        ours_uv = tuple(int(v) for v in np.asarray(res.grasp_uv))
        ours_xyz = [float(v) for v in np.asarray(res.grasp_xyz)]
        ours_pre = [float(v) for v in np.asarray(res.pre_grasp_xyz)]
        ours_msg = format_result_message(np.asarray(res.grasp_uv),
                                         np.asarray(res.grasp_xyz),
                                         np.asarray(res.pre_grasp_xyz))
        degenerate = bool(res.degenerate)

        row = {"seed": seed, "n_leaves": n_leaves, "ours_leaf": ours_leaf,
               "ours_uv": ours_uv, "ours_xyz": ours_xyz,
               "ours_pre_grasp": ours_pre, "ours_message": ours_msg,
               "degenerate": degenerate}
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
                    # the published tuple (get_3d_grasp_point +
                    # calculate_pre_grasp_point + publish_results)
                    d = float(depth[ry, rx])
                    g3 = ((d * (rx - CX)) / F, (d * (ry - CY)) / F, d)
                    entry["xyz"] = [float(v) for v in g3]
                    pre = _ref_pre_grasp(
                        np.array(g3, np.float32),
                        (mask == leaf).astype(np.uint8), CX, CY, F)
                    entry["pre_grasp"] = [float(v) for v in pre]
                    entry["xyz_err"] = float(max(
                        abs(a - b) for a, b in zip(g3, ours_xyz)))
                    entry["pre_grasp_err"] = float(max(
                        abs(a - b) for a, b in zip(pre, ours_pre)))
                    entry["message"] = format_result_message(
                        np.array([rx, ry]), np.array(g3, np.float32),
                        np.array(pre, np.float32))
                    # the reference lifts in float64-of-f32-depth
                    # (grasp_point_selector.py:157-162 .item()); ours
                    # is pure f32 -- field-wise numeric equality at
                    # f32 precision is the meaningful message parity
                    a = [float(t) for t in entry["message"].split(",")]
                    b = [float(t) for t in ours_msg.split(",")]
                    entry["message_match"] = len(a) == len(b) and all(
                        (x == y) if i < 2 else
                        abs(x - y) <= 1e-5 * max(1.0, abs(x))
                        for i, (x, y) in enumerate(zip(a, b)))
            row[mode] = entry

        # orientation probe: the exact-EDT oracle re-run with (a) the
        # moment-PCA angle (the orientation_source="pca" option) and
        # (b) OUR TPU-native caliper-sweep angle pinned as a float --
        # (b) isolates the downstream math (must be bit-exact) from
        # angle-grid quantization (ours is exact only to the fine-grid
        # resolution where cv2 lands exactly on a hull edge direction)
        leaf_e = row["exact"].get("leaf")
        if leaf_e is not None and row["exact"].get("uv") is not None:
            rect_uv = row["exact"]["uv"]
            o2 = ref.grasp_scores_reference(mask == leaf_e, mask > 0,
                                            depth, CX, CY, F,
                                            mode="exact", angle="pca")
            cands2 = _ref_candidates(o2["traditional_score"],
                                     o2["valid_region"], 20, 10)
            if cands2:
                mx, my = cands2[0]
                angle = min_area_rect_angle(mask == leaf_e)
                from leafgrasp_tpu.ops.pca import min_area_rect
                ours_o = min_area_rect(mask == leaf_e)
                ours_angle = float(ours_o.angle)
                o3 = ref.grasp_scores_reference(
                    mask == leaf_e, mask > 0, depth, CX, CY, F,
                    mode="exact", angle=ours_angle)
                cands3 = _ref_candidates(o3["traditional_score"],
                                         o3["valid_region"], 20, 10)
                px, py = cands3[0] if cands3 else (None, None)
                d_ang = (abs(np.rad2deg(ours_angle - angle)
                             + 90) % 180 - 90) if angle is not None \
                    else None
                row["orientation_probe"] = {
                    "min_area_rect_angle_deg": float(np.rad2deg(angle))
                    if angle is not None else None,
                    "ours_angle_deg": float(np.rad2deg(ours_angle)),
                    "angle_diff_deg": float(abs(d_ang))
                    if d_ang is not None else None,
                    "pinned_uv": (px, py),
                    "pinned_uv_match": (px, py) == ours_uv,
                    "pca_uv": (mx, my),
                    "px_dist_vs_pca_oracle": abs(mx - rect_uv[0])
                    + abs(my - rect_uv[1]),
                    "score_at_pca_pixel_gap": float(
                        abs(o2["traditional_score"][my, mx]
                            - o2["traditional_score"][rect_uv[1],
                                                      rect_uv[0]])),
                }
        rows.append(row)
        op = row.get("orientation_probe", {})
        print(f"seed={seed:3d} leaves={n_leaves} ours leaf={ours_leaf} "
              f"uv={ours_uv} | exact: leaf_match="
              f"{row['exact']['leaf_match']} uv_match="
              f"{row['exact'].get('uv_match')} msg_match="
              f"{row['exact'].get('message_match')} | cv2: px_dist="
              f"{row['cv2'].get('px_dist')} | minAreaRect px_dist="
              f"{op.get('px_dist_vs_pca_oracle')}", flush=True)

    # degenerate frames (empty valid region): the reference publishes a
    # zero-score tie-broken pixel there; excluded from pixel parity
    live = [r for r in rows if not r["degenerate"]]
    probes = [r["orientation_probe"] for r in rows
              if "orientation_probe" in r and not r["degenerate"]]
    summary = {
        "scale": args.scale,
        "frame": [H, W], "min_area": AREA, "camera": [CX, CY, F],
        "scenes": len(rows),
        "degenerate_scenes": len(rows) - len(live),
        "exact_leaf_match": sum(r["exact"]["leaf_match"] for r in rows),
        "exact_uv_match": sum(bool(r["exact"].get("uv_match"))
                              for r in live),
        "exact_message_match": sum(bool(r["exact"].get("message_match"))
                                   for r in live),
        "exact_max_xyz_err": max((r["exact"].get("xyz_err", 0.0)
                                  for r in live), default=0.0),
        "exact_max_pre_grasp_err": max(
            (r["exact"].get("pre_grasp_err", 0.0) for r in live),
            default=0.0),
        "live_scenes": len(live),
        "cv2_leaf_match": sum(r["cv2"]["leaf_match"] for r in rows),
        "cv2_uv_match": sum(bool(r["cv2"].get("uv_match")) for r in live),
        "cv2_max_px_dist": max((r["cv2"].get("px_dist", 0)
                                for r in live), default=0),
        "cv2_max_score_gap": max((r["cv2"].get("score_gap", 0.0)
                                  for r in live), default=0.0),
        "orientation_probe": {
            "scenes": len(probes),
            "pixel_changed": sum(p["px_dist_vs_pca_oracle"] > 0
                                 for p in probes),
            "max_px_dist": max((p["px_dist_vs_pca_oracle"]
                                for p in probes), default=0),
            "max_score_gap": max((p["score_at_pca_pixel_gap"]
                                  for p in probes), default=0.0),
            "pinned_uv_match": sum(bool(p.get("pinned_uv_match"))
                                   for p in probes),
            "max_angle_diff_deg": max(
                (p["angle_diff_deg"] for p in probes
                 if p.get("angle_diff_deg") is not None), default=0.0),
        },
        "rows": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), P["out"])
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(f"\nexact-mode: leaf {summary['exact_leaf_match']}/"
          f"{summary['scenes']}, pixel {summary['exact_uv_match']}/"
          f"{summary['live_scenes']}, message "
          f"{summary['exact_message_match']}/{summary['live_scenes']} "
          f"({summary['degenerate_scenes']} degenerate excluded)")
    print(f"cv2-chamfer-mode: leaf {summary['cv2_leaf_match']}/"
          f"{summary['scenes']}, pixel {summary['cv2_uv_match']}/"
          f"{summary['live_scenes']}, max px dist "
          f"{summary['cv2_max_px_dist']}, max score gap "
          f"{summary['cv2_max_score_gap']:.2e}")
    op = summary["orientation_probe"]
    print(f"pca-orientation probe: pixel changed on "
          f"{op['pixel_changed']}/{op['scenes']} scenes, max px dist "
          f"{op['max_px_dist']}, max score gap {op['max_score_gap']:.2e}")
    print(f"pinned-angle (downstream bit-parity): "
          f"{op['pinned_uv_match']}/{op['scenes']} pixel match, "
          f"max |ours - cv2| angle {op['max_angle_diff_deg']:.3f} deg")
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
