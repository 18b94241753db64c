#!/usr/bin/env python3
"""Train ONE GraspPointCNN config on a collected corpus npz and ship
the orbax checkpoint -- the full-epoch follow-up to a sweep's winner
(the reference's --full-optimization single-best run,
train_model_mlflow.py:591-637).

Usage: python tools/train_best_config.py
           --data artifacts/grasp_cnn_hard/training_data/training_data.npz
           --out artifacts/grasp_cnn_hard
           [--attention spatial --arch standard --lr 5e-4 --batch 16
            --pos-weight 2.0 --wd 0.01 --epochs 150]
"""
import argparse
import json
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--attention", default="spatial",
                    choices=["spatial", "channel", "hybrid", "none"])
    ap.add_argument("--arch", default="standard",
                    choices=["lightweight", "standard", "deep", "wide"])
    ap.add_argument("--lr", type=float, default=5e-4)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pos-weight", type=float, default=2.0)
    ap.add_argument("--wd", type=float, default=0.01)
    ap.add_argument("--epochs", type=int, default=150)
    args = ap.parse_args()

    from leafgrasp_tpu.config import ModelConfig, TrainConfig
    from leafgrasp_tpu.models.grasp_cnn import ARCHITECTURES
    from leafgrasp_tpu.training.train import Trainer
    from leafgrasp_tpu.training.checkpoint import save_checkpoint
    from leafgrasp_tpu.training.plots import plot_metrics
    from leafgrasp_tpu.training.verify_data import verify_dataset

    data = np.load(args.data)
    ds = {k: data[k] for k in data.files}
    report = verify_dataset(ds)
    assert report["ok"], report["problems"]
    print(f"dataset: {report['num_samples']} samples "
          f"({report['positive']} pos / {report['negative']} neg)",
          flush=True)

    trainer = Trainer(
        model_cfg=ModelConfig(attention_type=args.attention,
                              encoder_filters=ARCHITECTURES[args.arch]),
        cfg=TrainConfig(learning_rate=args.lr, batch_size=args.batch,
                        pos_weight=args.pos_weight,
                        weight_decay=args.wd, epochs=args.epochs))
    result = trainer.fit(
        ds, epochs=args.epochs, log_fn=lambda **kw: print(
            f"epoch {kw['epoch']:3d} train {kw['train_loss']:.4f} "
            f"val {kw['val_loss']:.4f} f1 {kw['f1_score']:.1f} "
            f"pos {kw['positive_accuracy']:.1f} "
            f"neg {kw['negative_accuracy']:.1f}", flush=True))

    out_dir = os.path.join(ROOT, args.out) if not os.path.isabs(
        args.out) else args.out
    save_checkpoint(os.path.join(out_dir, "best_model"), result.params,
                    result.batch_stats, norm_stats=result.norm_stats,
                    metrics=result.metrics, history=result.history,
                    epoch=result.best_epoch)
    plot_metrics(result.history, out_dir)
    with open(os.path.join(out_dir, "metrics.json"), "w") as fjson:
        json.dump({"best_val_loss": result.best_val_loss,
                   "best_epoch": result.best_epoch,
                   "config": {"attention": args.attention,
                              "arch": args.arch, "lr": args.lr,
                              "batch": args.batch,
                              "pos_weight": args.pos_weight,
                              "wd": args.wd},
                   "metrics": result.metrics,
                   "samples": report["num_samples"]}, fjson, indent=2)
    print("final metrics:", result.metrics)
    print("checkpoint written to", out_dir)


if __name__ == "__main__":
    main()
