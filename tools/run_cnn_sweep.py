#!/usr/bin/env python3
"""Execute the FULL 64-config GraspPointCNN sweep on the TPU.

The reference tracked 60+ MLflow runs over this grid
(train_model_mlflow.py:499-589, README.md:110); this trains every
config for real on the collected patch dataset and ships the JSONL
store + top-10 summary in artifacts/experiments/.

Usage: python tools/run_cnn_sweep.py [--epochs 20] [--limit N]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

from leafgrasp_tpu.training.experiments import (ExperimentTracker,
                                                generate_experiment_configs,
                                                run_sweep)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument("--data", default="artifacts/grasp_cnn/"
                    "training_data/training_data.npz")
    ap.add_argument("--out", default="artifacts/experiments")
    args = ap.parse_args()

    data = np.load(args.data)
    ds = {k: data[k] for k in ("depth_patches", "mask_patches",
                               "score_patches", "labels")}
    n = ds["labels"].shape[0]
    configs = generate_experiment_configs()
    print(f"dataset: {n} samples ({int(ds['labels'].sum())} positive); "
          f"{len(configs)} configs x {args.epochs} epochs", flush=True)

    tracker = ExperimentTracker(args.out)
    t0 = time.time()
    run_sweep(ds, tracker, configs=configs, epochs=args.epochs,
              limit=args.limit)
    path = tracker.write_summary()
    best = tracker.top_k(1)[0]
    print(f"done in {time.time() - t0:.0f}s; summary: {path}")
    print(f"best: {best['run']} f1={best['final'].get('f1_score'):.4f} "
          f"(reference best 94.79, train_model_mlflow.py)")


if __name__ == "__main__":
    main()
