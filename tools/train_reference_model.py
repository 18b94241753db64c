#!/usr/bin/env python3
"""Produce the shipped GraspPointCNN checkpoint via the full
self-supervised loop at reference scale (~875 samples: 125 teacher
frames x (1 positive + 3 augmented) + <=3 negatives each,
reference README.md:108).

Writes artifacts/grasp_cnn/{best_model*, metrics.json,
training_metrics.png} and prints the final metric block.
"""

import json
import os
import sys

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main():
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
    except RuntimeError:
        pass

    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig, TrainConfig,
                                      ModelConfig)
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.training.data_collector import GraspDataCollector
    from leafgrasp_tpu.training.teacher import collect_from_frames
    from leafgrasp_tpu.training.train import Trainer
    from leafgrasp_tpu.training.verify_data import verify_dataset
    from leafgrasp_tpu.training.plots import plot_metrics
    from leafgrasp_tpu.training.checkpoint import save_checkpoint

    cfg = PipelineConfig(
        frame=FrameConfig(height=270, width=360, max_leaves=8),
        leaf=LeafSelectionConfig(min_leaf_area=1500))
    cx, cy, f = 180.0, 135.0, 800.0
    out_dir = os.path.join(ROOT, "artifacts", "grasp_cnn")
    data_dir = os.path.join(out_dir, "training_data")

    coll = GraspDataCollector(data_dir, resume=True, save_every=1000)
    target_frames = 170
    have = coll.stats["positive_samples"]
    if have < target_frames:
        frames = (make_leaf_scene(270, 360, num_leaves=4 + s % 3,
                                  seed=1000 + s, margin=40)
                  for s in range(have, target_frames))
        used = collect_from_frames(frames, coll, cx, cy, f, cfg)
        print(f"teacher labeled {used} new frames", flush=True)
    print("collection stats:", coll.stats, flush=True)

    data = coll.dataset()
    report = verify_dataset(data)
    assert report["ok"], report["problems"]
    print(f"dataset: {report['num_samples']} samples "
          f"({report['positive']} pos / {report['negative']} neg)",
          flush=True)

    trainer = Trainer(model_cfg=ModelConfig(),   # standard spatial 64/128/256
                      cfg=TrainConfig())
    result = trainer.fit(
        data, log_fn=lambda **kw: print(
            f"epoch {kw['epoch']:3d} train {kw['train_loss']:.4f} "
            f"val {kw['val_loss']:.4f} f1 {kw['f1_score']:.1f} "
            f"pos {kw['positive_accuracy']:.1f} "
            f"neg {kw['negative_accuracy']:.1f}", flush=True))

    save_checkpoint(os.path.join(out_dir, "best_model"), result.params,
                    result.batch_stats, norm_stats=result.norm_stats,
                    metrics=result.metrics, history=result.history,
                    epoch=result.best_epoch)
    plot_metrics(result.history, out_dir)
    with open(os.path.join(out_dir, "metrics.json"), "w") as fjson:
        json.dump({"best_val_loss": result.best_val_loss,
                   "best_epoch": result.best_epoch,
                   "metrics": result.metrics,
                   "samples": report["num_samples"]}, fjson, indent=2)
    print("final metrics:", result.metrics)
    print("checkpoint written to", out_dir)


if __name__ == "__main__":
    main()
