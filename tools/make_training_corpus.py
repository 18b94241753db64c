#!/usr/bin/env python3
"""Build the HARD self-supervised training corpus (VERDICT r2 item 2).

The r2 corpus (tools/train_reference_model.py: clean ellipse scenes +
the reference's tip/stem/edge negatives) is linearly easy -- the
64-config sweep tied many configs at F1 = 100. This builds a
discriminating corpus:

* scenes from ``make_hard_leaf_scene``: clustered OVERLAPPING lobed
  leaves, tilted noisy surfaces, speckle (io/scenes.py);
* the collector's ``hard_negatives`` pools: near-boundary points (the
  selector's own valid-region margin violated) and tip-adjacent rings,
  on top of the reference's tip/stem/edge
  (reference data_collector.py:295-348).

Usage: python tools/make_training_corpus.py [--frames 220]
           [--out artifacts/grasp_cnn_hard/training_data]
"""
import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=220)
    ap.add_argument("--height", type=int, default=270)
    ap.add_argument("--width", type=int, default=360)
    ap.add_argument("--seed0", type=int, default=5000)
    ap.add_argument("--out", default=os.path.join(
        ROOT, "artifacts", "grasp_cnn_hard", "training_data"))
    ap.add_argument("--fresh", action="store_true",
                    help="discard any existing corpus at --out")
    args = ap.parse_args()

    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig)
    from leafgrasp_tpu.io.scenes import make_hard_leaf_scene
    from leafgrasp_tpu.training.data_collector import GraspDataCollector
    from leafgrasp_tpu.training.teacher import collect_from_frames
    from leafgrasp_tpu.training.verify_data import verify_dataset

    cfg = PipelineConfig(
        frame=FrameConfig(height=args.height, width=args.width,
                          max_leaves=10),
        leaf=LeafSelectionConfig(min_leaf_area=1500))
    cx, cy, f = args.width / 2.0, args.height / 2.0, 800.0

    coll = GraspDataCollector(args.out, resume=not args.fresh,
                              save_every=10_000, hard_negatives=True)
    have = coll.stats["positive_samples"]
    if have < args.frames:
        frames = (make_hard_leaf_scene(
            args.height, args.width, num_leaves=5 + s % 4,
            seed=args.seed0 + s, margin=40)
            for s in range(have, args.frames))
        used = collect_from_frames(frames, coll, cx, cy, f, cfg)
        print(f"teacher labeled {used} new frames", flush=True)
    coll.save()
    print("collection stats:", coll.stats)

    data = coll.dataset()
    report = verify_dataset(data)
    print("verify:", report)
    assert report["ok"], report["problems"]
    n = len(data["labels"])
    pos = int(data["labels"].sum())
    print(f"corpus: {n} samples, {pos} positive / {n - pos} negative "
          f"-> {os.path.join(args.out, 'training_data.npz')}")


if __name__ == "__main__":
    main()
