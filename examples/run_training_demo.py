#!/usr/bin/env python3
"""Self-supervised training demo: CV teacher -> collector -> CNN trainer.

The offline equivalent of the reference's data-collection + train_model
flow (SURVEY.md 3.3/3.5), on synthetic scenes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig, TrainConfig)
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
    out = os.path.expanduser("~/leafgrasp_out")

    frames = [make_leaf_scene(270, 360, 4, seed=s, margin=40)
              for s in range(12)]
    coll = GraspDataCollector(os.path.join(out, "ml_training_data"),
                              resume=False)
    used = collect_from_frames(frames, coll, cx, cy, f, cfg)
    print(f"teacher labeled {used} frames -> {len(coll.samples)} samples "
          f"({coll.stats})")

    report = verify_dataset(coll.dataset())
    print("dataset ok:", report["ok"], "| pos", report["positive"],
          "neg", report["negative"])

    trainer = Trainer(cfg=TrainConfig(batch_size=16, epochs=20))
    result = trainer.fit(coll.dataset(), epochs=20,
                         log_fn=lambda **kw: print(
                             f"epoch {kw['epoch']:3d} train "
                             f"{kw['train_loss']:.4f} val "
                             f"{kw['val_loss']:.4f} f1 "
                             f"{kw['f1_score']:.1f}"))
    print("best val loss:", result.best_val_loss, "metrics:",
          result.metrics)
    save_checkpoint(os.path.join(out, "ml_models", "best_model"),
                    result.params, result.batch_stats,
                    norm_stats=result.norm_stats, metrics=result.metrics)
    plot_metrics(result.history, os.path.join(out, "ml_models"))
    print("checkpoint + plots written to", os.path.join(out, "ml_models"))


if __name__ == "__main__":
    main()
