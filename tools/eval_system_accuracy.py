#!/usr/bin/env python3
"""Classical-vs-hybrid system comparison on synthetic scenes.

The reference's system-accuracy table (README.md:151-153: classical
25.3 px vs hybrid 27.1 px to a human-annotated ideal point; feature
alignment 80.67% vs 83.33%) was measured on a physical gantry rig with
human annotations -- unreproducible here. This tool produces the
honest synthetic ANALOGUE of the comparison structure: for N
production-scale scenes it runs the classical (CV-only) pipeline and
the hybrid (CV+CNN fusion) pipeline and reports

  * leaf_agreement   -- fraction choosing the same leaf
  * px_shift_mean/max -- pixel distance between the two modes' grasp
                         points when the leaf agrees (the hybrid's
                         learned refinement, comparable in spirit to
                         the reference's +1.8 px classical->hybrid
                         delta)
  * both modes' distance to the TEACHER point (training/teacher.py's
    safe-zone scoring, the self-supervision signal that stands in for
    the rig's human annotation)

Writes artifacts/system_accuracy.json; one summary line to stdout.
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))

import numpy as np


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=30)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1440)
    ap.add_argument("--ckpt", default=None,
                    help="checkpoint dir (default artifacts/grasp_cnn/"
                    "best_model); e.g. the hard-corpus model")
    ap.add_argument("--hard", action="store_true",
                    help="evaluate on make_hard_leaf_scene scenes "
                    "(clustered lobed overlapping leaves) -- the "
                    "regime where a hard-corpus CNN runs at mid-range "
                    "confidence and the fusion's ml_weight > 0")
    ap.add_argument("--out", default=None,
                    help="output json (default artifacts/"
                    "system_accuracy.json)")
    ap.add_argument("--attention", default="spatial",
                    choices=["spatial", "channel", "hybrid", "none"],
                    help="checkpoint's attention type")
    ap.add_argument("--arch", default="standard",
                    choices=["lightweight", "standard", "deep", "wide"],
                    help="checkpoint's encoder architecture")
    ap.add_argument("--norm", default="reference_minmax",
                    choices=["reference_minmax", "train_stats"],
                    help="serving patch normalization: the faithful "
                    "per-patch min-max (which MISMATCHES training and "
                    "leaves the CNN out-of-distribution, the "
                    "reference's own train/serve bug) or the corrected "
                    "train-consistent z-score from the checkpoint's "
                    "stored stats (geometry/patches.py)")
    args = ap.parse_args()

    import jax
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig)
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.training.teacher import teacher_select
    from leafgrasp_tpu.training.checkpoint import load_checkpoint

    from leafgrasp_tpu.config import ModelConfig, MLFusionConfig
    from leafgrasp_tpu.models.grasp_cnn import ARCHITECTURES

    h, w = args.height, args.width
    area = 10000 if h >= 1080 else 1500
    cfg = PipelineConfig(frame=FrameConfig(height=h, width=w,
                                           max_leaves=8),
                         leaf=LeafSelectionConfig(min_leaf_area=area),
                         model=ModelConfig(
                             attention_type=args.attention,
                             encoder_filters=ARCHITECTURES[args.arch]),
                         fusion=MLFusionConfig(
                             patch_normalization=args.norm))
    cx, cy, f = (np.float32(707.87), np.float32(494.07),
                 np.float32(1750.68))

    # the shipped trained checkpoint if present, else a fresh init
    ckpt = args.ckpt or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "grasp_cnn",
        "best_model")
    norm_stats = None
    try:
        restored = load_checkpoint(ckpt)
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
        norm_stats = restored.get("norm_stats")
        src = ckpt
    except Exception as e:
        print(f"checkpoint load failed ({type(e).__name__}); random init",
              flush=True)
        _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
        src = "random-init"
    if args.norm == "train_stats" and norm_stats is None:
        sys.exit("--norm train_stats needs a checkpoint that stores "
                 "norm_stats (training/checkpoint.py)")
    variables = jax.device_put(variables)

    cv_fn = make_frame_fn(cfg, with_cnn=False)
    ml_fn = make_frame_fn(cfg, with_cnn=True, norm_stats=norm_stats)

    from leafgrasp_tpu.io.scenes import make_hard_leaf_scene
    scene_fn = make_hard_leaf_scene if args.hard else make_leaf_scene

    rows = []
    for seed in range(args.scenes):
        n_leaves = (4, 6, 8)[seed % 3]
        mask, depth = scene_fn(h, w, num_leaves=n_leaves,
                               seed=100 + seed, margin=120)
        r_cv = cv_fn(mask, depth, cx, cy, f)
        r_ml = ml_fn(mask, depth, cx, cy, f, cnn_variables=variables)
        if bool(r_cv.degenerate) or bool(r_ml.degenerate):
            continue
        uv_cv = np.asarray(r_cv.grasp_uv)
        uv_ml = np.asarray(r_ml.grasp_uv)
        leaf_cv, leaf_ml = int(r_cv.leaf_id), int(r_ml.leaf_id)
        row = {"seed": 100 + seed, "n_leaves": n_leaves,
               "leaf_cv": leaf_cv, "leaf_ml": leaf_ml,
               "uv_cv": uv_cv.tolist(), "uv_ml": uv_ml.tolist()}
        # teacher annotation (the self-supervision signal) on the
        # CLASSICAL mode's leaf, as the rig's human point stand-in
        t, _, _ = teacher_select(mask == leaf_cv, mask > 0, depth,
                                 cx, cy, f, cfg=cfg)
        if t is not None:
            tx, ty = int(t[0]), int(t[1])
            row["teacher_uv"] = [tx, ty]
            row["cv_to_teacher_px"] = float(np.hypot(
                uv_cv[0] - tx, uv_cv[1] - ty))
            if leaf_ml == leaf_cv:
                row["ml_to_teacher_px"] = float(np.hypot(
                    uv_ml[0] - tx, uv_ml[1] - ty))
        rows.append(row)
        print(f"seed={row['seed']} leaves={n_leaves} "
              f"leaf cv/ml={leaf_cv}/{leaf_ml} "
              f"shift={abs(uv_cv[0]-uv_ml[0])+abs(uv_cv[1]-uv_ml[1])}",
              flush=True)

    agree = [r for r in rows if r["leaf_cv"] == r["leaf_ml"]]
    shifts = [float(np.hypot(r["uv_cv"][0] - r["uv_ml"][0],
                             r["uv_cv"][1] - r["uv_ml"][1]))
              for r in agree]
    cvt = [r["cv_to_teacher_px"] for r in rows if "cv_to_teacher_px" in r]
    mlt = [r["ml_to_teacher_px"] for r in rows if "ml_to_teacher_px" in r]
    summary = {
        "scenes": len(rows),
        "frame": [h, w],
        "hard_scenes": args.hard,
        "cnn_source": src,
        "cnn_config": {"attention": args.attention, "arch": args.arch},
        "patch_normalization": args.norm,
        "leaf_agreement": round(len(agree) / max(len(rows), 1), 4),
        "px_shift_mean": round(float(np.mean(shifts)), 2) if shifts else None,
        "px_shift_max": round(float(np.max(shifts)), 2) if shifts else None,
        "cv_to_teacher_px_mean": round(float(np.mean(cvt)), 2) if cvt else None,
        "ml_to_teacher_px_mean": round(float(np.mean(mlt)), 2) if mlt else None,
        "reference_rig_numbers": {
            "classical_px": 25.3, "hybrid_px": 27.1,
            "note": "README.md:151-153, physical gantry + human "
                    "annotations; rows above are the synthetic analogue"},
        "rows": rows,
    }
    out = args.out or os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "system_accuracy.json")
    with open(out, "w") as fjson:
        json.dump(summary, fjson, indent=2)
    print(json.dumps({k: v for k, v in summary.items() if k != "rows"}))


if __name__ == "__main__":
    main()
