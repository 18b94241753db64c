"""VLA fine-tuning experiment sweep.

Rebuild of vla_system/training/vla_production_training.py:286-335 -- the
same 4 named configurations (baseline_5e5 / higher_lr_1e4 /
larger_rank_16 / optimized_config) -- except the training loop is REAL:
the reference's "production" sweep computes its loss curves in closed
form with no model in the loop (vla_production_training.py:184-218, see
SURVEY.md 2.7); here each experiment runs actual LoRA forward/backward
passes and real top-1 / Spearman evaluation, writing the same artifact
shapes (adapter_config.json + training_history.json).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, List, Optional

from leafgrasp_tpu.vla.lm import VLAModelConfig
from leafgrasp_tpu.vla.trainer import VLATrainer, make_synthetic_vla_dataset

__all__ = ["VLAExperiment", "PRODUCTION_EXPERIMENTS", "run_vla_sweep"]


@dataclasses.dataclass(frozen=True)
class VLAExperiment:
    name: str
    learning_rate: float
    lora_rank: int
    lora_alpha: float
    lora_dropout: float
    epochs: int = 3


PRODUCTION_EXPERIMENTS = (
    VLAExperiment("baseline_5e5", 5e-5, 8, 32.0, 0.1),
    VLAExperiment("higher_lr_1e4", 1e-4, 8, 32.0, 0.1),
    VLAExperiment("larger_rank_16", 5e-5, 16, 32.0, 0.1),
    VLAExperiment("optimized_config", 8e-5, 8, 16.0, 0.05),
)


def run_vla_sweep(out_dir: str,
                  experiments=PRODUCTION_EXPERIMENTS,
                  num_train: int = 24, num_eval: int = 8,
                  model_cfg: Optional[VLAModelConfig] = None,
                  seed: int = 0, log_fn=None,
                  pretrain_epochs: int = 0) -> List[Dict]:
    """Train + evaluate each experiment; write per-experiment artifacts.

    model_cfg: base LM size (defaults small enough for CI; scale up for
    real runs). LoRA fields are overridden per experiment.

    pretrain_epochs > 0 first pretrains ONE shared base (full params) on
    the training corpus and grafts it into every LoRA experiment -- the
    analogue of the reference starting each LoRA config from the same
    pretrained LLaVA. With a random base, LoRA-only training learns only
    the answer format (chance top-1); see VLATrainer.pretrain.
    """
    from leafgrasp_tpu.vla.lora import graft_base_params

    out_dir = os.path.expanduser(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    base = model_cfg or VLAModelConfig()

    train_set = make_synthetic_vla_dataset(num_train, seed=seed)
    eval_set = make_synthetic_vla_dataset(num_eval, seed=seed + 1)

    pretrained = None
    if pretrain_epochs > 0:
        base_trainer = VLATrainer(
            cfg=dataclasses.replace(base, lora_rank=0), seed=seed)
        base_trainer.pretrain(train_set, epochs=pretrain_epochs,
                              log_fn=log_fn)
        pretrained = base_trainer.variables["params"]
        # the adapters are deltas ON this base -- ship it alongside them
        import numpy as np
        import flax.traverse_util as tu
        flat = {"/".join(k): np.asarray(v)
                for k, v in tu.flatten_dict(pretrained).items()}
        np.savez_compressed(os.path.join(out_dir, "pretrained_base.npz"),
                            **flat)

    results = []
    for exp in experiments:
        cfg = dataclasses.replace(base, lora_rank=exp.lora_rank,
                                  lora_alpha=exp.lora_alpha,
                                  lora_dropout=exp.lora_dropout)
        trainer = VLATrainer(cfg=cfg, learning_rate=exp.learning_rate,
                             seed=seed)
        if pretrained is not None:
            trainer.variables = {"params": graft_base_params(
                trainer.variables["params"], pretrained)}
        fit = trainer.fine_tune(train_set, epochs=exp.epochs,
                                log_fn=log_fn)
        metrics = trainer.evaluate(eval_set)

        exp_dir = os.path.join(out_dir, exp.name)
        os.makedirs(exp_dir, exist_ok=True)
        trainer.save_adapter(os.path.join(exp_dir, "adapter.npz"))
        history = {
            "experiment": exp.name,
            "pretrain_epochs": pretrain_epochs,
            "params": dataclasses.asdict(exp),
            "loss_history": fit["loss_history"],
            "final_loss": fit["final_loss"],
            "top1_accuracy": metrics["top1_accuracy"],
            "spearman": metrics["spearman"],
        }
        with open(os.path.join(exp_dir, "training_history.json"),
                  "w") as f:
            json.dump(history, f, indent=2)
        results.append(history)

    with open(os.path.join(out_dir, "sweep_summary.json"), "w") as f:
        json.dump(sorted(results, key=lambda r: -r["top1_accuracy"]),
                  f, indent=2)
    return results
