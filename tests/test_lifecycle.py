"""Full self-supervised lifecycle integration test:

teacher labeling -> data collection -> training -> orbax checkpoint ->
restored variables serving inside the jitted pipeline -> grasp with ML
fusion. Mirrors the reference's end-to-end story (SURVEY.md 3.1/3.3/3.5)
at small scale.
"""

import numpy as np
import jax
import pytest

from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                  LeafSelectionConfig, ModelConfig,
                                  TrainConfig)
from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.training.data_collector import GraspDataCollector
from leafgrasp_tpu.training.teacher import collect_from_frames
from leafgrasp_tpu.training.train import Trainer
from leafgrasp_tpu.training.checkpoint import (save_checkpoint,
                                               load_checkpoint)
from leafgrasp_tpu.training.verify_data import verify_dataset
from leafgrasp_tpu.pipeline.frame import make_frame_fn

CX, CY, F = 180.0, 135.0, 800.0
MODEL = ModelConfig(encoder_filters=(8, 16), attention_type="spatial")
CFG = PipelineConfig(frame=FrameConfig(height=270, width=360,
                                       max_leaves=8),
                     leaf=LeafSelectionConfig(min_leaf_area=1500),
                     model=MODEL)


def test_full_self_supervised_lifecycle(tmp_path):
    # 1) teacher labels synthetic frames
    frames = [make_leaf_scene(270, 360, 4, seed=s, margin=40)
              for s in (3, 5, 8, 13)]
    coll = GraspDataCollector(str(tmp_path / "data"), resume=False,
                              save_every=1000)
    used = collect_from_frames(frames, coll, CX, CY, F, CFG)
    assert used >= 3
    data = coll.dataset()
    assert verify_dataset(data)["ok"]

    # 2) train a small CNN on the collected set
    trainer = Trainer(model_cfg=MODEL,
                      cfg=TrainConfig(batch_size=8, learning_rate=1e-3))
    result = trainer.fit(data, epochs=4)
    assert np.isfinite(result.best_val_loss)

    # 3) checkpoint round-trip
    path = save_checkpoint(str(tmp_path / "ckpt"), result.params,
                           result.batch_stats,
                           norm_stats=result.norm_stats,
                           metrics=result.metrics,
                           epoch=result.best_epoch)
    restored = load_checkpoint(path)
    variables = {"params": restored["params"],
                 "batch_stats": restored["batch_stats"]}

    # 4) serve: the restored model drives CV(+)ML fusion in the pipeline
    mask, depth = frames[0]
    fn = make_frame_fn(CFG, with_cnn=True)
    res = fn(mask, depth, CX, CY, F, variables)
    assert bool(res.found) and not bool(res.degenerate)
    u, v = np.asarray(res.grasp_uv)
    assert mask[v, u] == int(res.leaf_id)
    # the k-candidate ML scores were produced by the restored model
    assert np.asarray(res.fusion.combined).shape[0] == CFG.grasp.top_k
