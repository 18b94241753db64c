"""Regenerate the shipped VLA sweep artifacts (artifacts/vla).

Runs the 4-experiment production sweep (vla/experiments.py) with a
shared pretrained base -- the tiny-model analogue of LoRA-tuning the
pretrained LLaVA -- on real synthetic-scene data, writing adapter +
history artifacts in the reference's shapes.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from leafgrasp_tpu.vla.experiments import run_vla_sweep

t0 = time.perf_counter()
results = run_vla_sweep(
    os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "artifacts", "vla"),
    num_train=400, num_eval=32, pretrain_epochs=30, seed=0,
    log_fn=lambda **kw: print("  ", kw, flush=True))
for r in results:
    print(f"{r['experiment']:18s} loss {r['final_loss']:.3f} "
          f"top1 {r['top1_accuracy']:.2f} spearman {r['spearman']:.3f}",
          flush=True)
print(f"total {time.perf_counter() - t0:.0f}s")
