"""Tests for sdf_helper, teacher loop, predictor, plots, replay,
VLA experiment sweep, tip penalty."""

import os

import numpy as np
import pytest

from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                  LeafSelectionConfig, ModelConfig)
from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.io.replay import (decode_mask_buffer,
                                     decode_depth_buffer,
                                     color_keyed_to_ids, replay_directory)
from leafgrasp_tpu.geometry.sdf_helper import (global_sdf, leaf_sdf,
                                               approach_vector,
                                               isolation_metric)
from leafgrasp_tpu.geometry.grasp_scorer import tip_penalty_map
from leafgrasp_tpu.training.teacher import teacher_select, \
    collect_from_frames
from leafgrasp_tpu.training.data_collector import GraspDataCollector
from leafgrasp_tpu.training.plots import plot_metrics
from leafgrasp_tpu.models.predictor import GraspQualityPredictor

H, W = 270, 360
CX, CY, F = 180.0, 135.0, 800.0
CFG = PipelineConfig(frame=FrameConfig(height=H, width=W, max_leaves=8),
                     leaf=LeafSelectionConfig(min_leaf_area=1500))


def _scene(seed=3):
    return make_leaf_scene(height=H, width=W, num_leaves=4, seed=seed,
                           margin=40)


# -------------------------------------------------------------- sdf_helper --

def test_global_sdf_zero_on_leaves():
    mask, _ = _scene()
    g = np.asarray(global_sdf(mask > 0))
    assert (g[mask > 0] == 0).all()
    assert g[mask == 0].max() > 0


def test_leaf_sdf_signs_and_approach_vector():
    mask, _ = _scene()
    leaf = mask == 3
    s = np.asarray(leaf_sdf(leaf))
    assert (s[leaf] >= 0).all() and (s[~leaf] <= 0).all()
    ys, xs = np.where(leaf)
    # a point near the leaf's left edge: gradient should have unit norm
    i = np.argmin(xs)
    v = np.asarray(approach_vector(leaf, (int(xs[i] + 2), int(ys[i]))))
    np.testing.assert_allclose(np.linalg.norm(v), 1.0, rtol=1e-5)


def test_isolation_metric_range():
    mask, _ = _scene()
    iso = float(isolation_metric(mask == 3, mask > 0))
    assert iso > 0


# ------------------------------------------------------------- tip penalty --

def test_tip_penalty_highest_at_tips():
    mask, _ = _scene()
    leaf = mask == 3
    tp = np.asarray(tip_penalty_map(leaf))
    assert tp.max() <= 1.0 + 1e-6
    assert (tp[~leaf] == 0).all()
    # the penalty at the leaf rim exceeds the penalty at the deepest point
    import scipy.ndimage as ndi
    dist = ndi.distance_transform_edt(leaf)
    deep = np.unravel_index(np.argmax(dist), dist.shape)
    ys, xs = np.where(leaf)
    rim_i = np.argmin(xs)
    assert tp[ys[rim_i], xs[rim_i]] > tp[deep]


# ------------------------------------------------------------ teacher loop --

def test_teacher_select_in_safe_zone():
    mask, depth = _scene()
    leaf = mask == 3
    point, total, scores = teacher_select(leaf, mask > 0, depth, CX, CY,
                                          F, CFG)
    assert point is not None
    x, y = point
    assert leaf[y, x]
    assert total > 0
    # safe zone: at least 10px from the rim (eroded 21-ellipse twice)
    import scipy.ndimage as ndi
    assert ndi.distance_transform_edt(leaf)[y, x] > 10


def test_collect_from_frames(tmp_path):
    frames = [_scene(s) for s in (3, 5)]
    coll = GraspDataCollector(str(tmp_path), resume=False, save_every=100)
    used = collect_from_frames(frames, coll, CX, CY, F, CFG)
    assert used == 2
    assert coll.stats["positive_samples"] == 2
    assert os.path.exists(os.path.join(str(tmp_path),
                                       "training_data.npz"))


# --------------------------------------------------------------- predictor --

def test_grasp_quality_predictor():
    pred = GraspQualityPredictor(ModelConfig(encoder_filters=(8, 16)))
    rng = np.random.default_rng(0)
    score = pred.predict({
        "depth_patch": rng.random((32, 32)),
        "mask_patch": np.ones((32, 32)),
        "score_patches": rng.random((7, 32, 32)),
    })
    assert 0.0 <= score <= 1.0
    batch = pred.predict_batch(rng.random((5, 32, 32, 9),
                                          dtype=np.float64).astype(
        np.float32))
    assert batch.shape == (5,)


# ------------------------------------------------------------------- plots --

def test_plot_metrics(tmp_path):
    history = {
        "train_loss": [1.0, 0.8, 0.6],
        "val_loss": [1.1, 0.9, 0.7],
        "metrics": [dict(positive_accuracy=50, negative_accuracy=60,
                         precision=55, recall=52, f1_score=53)] * 3,
    }
    path = plot_metrics(history, str(tmp_path))
    assert os.path.exists(path)


# ------------------------------------------------------------------ replay --

def test_decode_buffers():
    buf = np.arange(12, dtype=np.int16)
    m = decode_mask_buffer(buf, 3, 4)
    assert m.shape == (3, 4) and m[2, 3] == 11
    d = decode_depth_buffer(np.arange(12, dtype=np.float32), 3, 4)
    assert d.dtype == np.float32


def test_color_keyed_to_ids():
    rgb = np.zeros((4, 4, 3), np.uint8)
    rgb[0:2, 0:2] = (255, 0, 0)
    rgb[2:4, 2:4] = (0, 255, 0)
    ids = color_keyed_to_ids(rgb)
    assert set(np.unique(ids)) == {0, 1, 2}
    assert ids[0, 0] == 1      # first color in row-major order gets id 1
    assert ids[3, 3] == 2


def test_replay_directory(tmp_path):
    from PIL import Image
    mask, depth = _scene()
    rgb = np.zeros((H, W, 3), np.uint8)
    rgb[mask == 1] = (255, 0, 0)
    rgb[mask == 2] = (0, 255, 0)
    Image.fromarray(rgb).save(tmp_path / "mask7.png")
    np.save(tmp_path / "depth7.npy", depth)
    frames = list(replay_directory(str(tmp_path)))
    assert len(frames) == 1
    m, d, n = frames[0]
    assert n == 7
    assert set(np.unique(m)) <= {0, 1, 2}
    np.testing.assert_allclose(d, depth)


# ----------------------------------------------------------- vla sweep ----

def test_vla_sweep_two_experiments(tmp_path):
    from leafgrasp_tpu.vla.experiments import (run_vla_sweep,
                                               PRODUCTION_EXPERIMENTS)
    from leafgrasp_tpu.vla.lm import VLAModelConfig
    import dataclasses
    tiny = VLAModelConfig(dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                          mlp_hidden=64, vision_tokens=2, vision_patch=16,
                          max_seq=600)
    exps = [dataclasses.replace(e, epochs=1)
            for e in PRODUCTION_EXPERIMENTS[:2]]
    results = run_vla_sweep(str(tmp_path), experiments=exps,
                            num_train=4, num_eval=2, model_cfg=tiny,
                            pretrain_epochs=1)
    assert len(results) == 2
    assert all(r["pretrain_epochs"] == 1 for r in results)
    for e in exps:
        d = tmp_path / e.name
        assert (d / "adapter.npz").exists()
        assert (d / "training_history.json").exists()
        assert (d / "adapter.npz.adapter_config.json").exists()
    assert (tmp_path / "sweep_summary.json").exists()
    assert all(np.isfinite(r["final_loss"]) for r in results)

    # serving reconstruction: base + adapter == the trained params
    from leafgrasp_tpu.vla.trainer import VLATrainer
    import flax.traverse_util as tu
    import jax as _jax
    exp = exps[0]
    cfg = dataclasses.replace(tiny, lora_rank=exp.lora_rank,
                              lora_alpha=exp.lora_alpha,
                              lora_dropout=exp.lora_dropout)
    fresh = VLATrainer(cfg=cfg, seed=0)
    fresh.load_pretrained_base(str(tmp_path / "pretrained_base.npz"))
    fresh.load_adapter(str(tmp_path / exp.name / "adapter.npz"))
    ev = fresh.evaluate(
        __import__("leafgrasp_tpu.vla.trainer",
                   fromlist=["make_synthetic_vla_dataset"]
                   ).make_synthetic_vla_dataset(2, seed=9))
    assert 0.0 <= ev["top1_accuracy"] <= 1.0


# ------------------------------------------------------------ config IO --

def test_config_yaml_roundtrip(tmp_path):
    """save -> load must reproduce the exact config tree (the reference
    advertises --config configs/baseline.yaml but ships no loader,
    README.md:210)."""
    from leafgrasp_tpu.config import (DEFAULT_CONFIG, GraspScoringConfig,
                                      load_config, save_config)
    cfg = DEFAULT_CONFIG.replace(
        grasp=GraspScoringConfig(isolation_context="reference_self"))
    p = str(tmp_path / "cfg.yaml")
    save_config(cfg, p)
    assert load_config(p) == cfg
    pj = str(tmp_path / "cfg.json")
    save_config(cfg, pj)
    assert load_config(pj) == cfg


def test_config_partial_and_unknown_keys(tmp_path):
    from leafgrasp_tpu.config import DEFAULT_CONFIG, load_config
    p = tmp_path / "partial.yaml"
    p.write_text("frame:\n  height: 540\nleaf:\n  min_leaf_area: 42\n")
    cfg = load_config(str(p))
    assert cfg.frame.height == 540 and cfg.frame.width == 1440
    assert cfg.leaf.min_leaf_area == 42
    assert cfg == DEFAULT_CONFIG.replace(
        frame=cfg.frame, leaf=cfg.leaf)   # everything else defaulted
    bad = tmp_path / "bad.yaml"
    bad.write_text("grasp:\n  no_such_knob: 1\n")
    import pytest as _pytest
    with _pytest.raises(ValueError):
        load_config(str(bad))


def test_shipped_configs_load():
    """The shipped configs/ presets must load and stay jit-hashable."""
    from leafgrasp_tpu.config import load_config
    import glob
    paths = sorted(glob.glob("configs/*.yaml"))
    assert len(paths) >= 3
    for p in paths:
        cfg = load_config(p)
        hash(cfg)   # frozen tree stays a valid jit static arg


def test_collect_from_framelog_session(tmp_path):
    """A recorded framelog session feeds the teacher collector directly
    (the record -> self-supervised-collection loop, SURVEY.md 3.5)."""
    from leafgrasp_tpu.io.framelog import FrameLogWriter, FrameLogReader
    p = str(tmp_path / "sess.lflg")
    with FrameLogWriter(p, H, W) as wr:
        for seed in (3, 5):
            mask, depth = _scene(seed)
            wr.append(mask.astype(np.int16), depth, seed)
    collector = GraspDataCollector(str(tmp_path / "data"),
                                   patch_size=32)
    with FrameLogReader(p) as rd:
        used = collect_from_frames(((m, d) for m, d, _ in rd),
                                   collector, CX, CY, F, cfg=CFG)
    assert used == 2
    assert len(collector.samples) > 0
