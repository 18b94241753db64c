#!/usr/bin/env python3
"""VLA hybrid-selection demo (the reference's test_vla_simple /
demo_vla_integration equivalents, vla_system/demos/).

Exercises every scorer backend on synthetic candidates, shows the
confidence ladder and graceful degradation, and runs a small real LoRA
fine-tune + evaluation.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from leafgrasp_tpu.vla import (HybridGraspSelector, VLAProcessor,
                                   StubScorer, HeuristicScorer,
                                   TinyVLAScorer, VLATrainer,
                                   make_synthetic_vla_dataset,
                                   VLAModelConfig)

    samples = make_synthetic_vla_dataset(3, seed=0)
    image = samples[0]["image"]
    candidates = samples[0]["candidates"]

    for name, backend in (("stub (degraded)", StubScorer()),
                          ("heuristic", HeuristicScorer()),
                          ("tiny-vla", TinyVLAScorer())):
        sel = HybridGraspSelector(VLAProcessor(backend))
        best = sel.select_grasp_point(image, candidates)
        print(f"{name:18s} -> leaf@({best['x']},{best['y']}) "
              f"strategy={best['strategy']} "
              f"conf={best['vla_confidence']:.3f} "
              f"weights vla={best['vla_weight']:.2f}")

    print("\nLoRA fine-tune (real forward/backward):")
    cfg = VLAModelConfig(dim=64, n_layers=2, n_heads=4, n_kv_heads=2,
                         mlp_hidden=128, vision_tokens=4,
                         vision_patch=32, lora_rank=8, max_seq=600)
    trainer = VLATrainer(cfg=cfg, learning_rate=1e-3)
    train = make_synthetic_vla_dataset(8, seed=1)
    out = trainer.fine_tune(train, epochs=2,
                            log_fn=lambda **kw: print(
                                f"  epoch {kw['epoch']} loss "
                                f"{kw['loss']:.4f}"))
    metrics = trainer.evaluate(make_synthetic_vla_dataset(4, seed=2))
    print("eval:", metrics)
    trainer.save_adapter(os.path.expanduser(
        "~/leafgrasp_out/vla/adapter.npz"))
    print("adapter saved")


if __name__ == "__main__":
    main()
