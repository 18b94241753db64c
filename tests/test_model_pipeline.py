"""GraspPointCNN model tests + end-to-end pipeline tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from leafgrasp_tpu.config import (PipelineConfig, FrameConfig, ModelConfig,
                                  LeafSelectionConfig)
from leafgrasp_tpu.models.grasp_cnn import (GraspPointCNN, init_grasp_cnn,
                                            ml_scores_from_logits,
                                            ARCHITECTURES)
from leafgrasp_tpu.pipeline.fusion import fuse_candidates
from leafgrasp_tpu.pipeline.frame import select_grasp, make_frame_fn
from leafgrasp_tpu.io.scenes import make_leaf_scene

CX, CY, F = 180.0, 135.0, 800.0
CFG = PipelineConfig(
    frame=FrameConfig(height=270, width=360, max_leaves=8),
    leaf=LeafSelectionConfig(min_leaf_area=1500),
)


@pytest.mark.parametrize("attention", ["spatial", "channel", "hybrid",
                                       "none"])
def test_cnn_forward_all_attention_types(attention):
    cfg = ModelConfig(attention_type=attention,
                      encoder_filters=(16, 32, 64))
    model, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg)
    x = jnp.ones((4, 32, 32, 9))
    out = model.apply(variables, x, train=False)
    assert out.shape == (4, 1)
    assert np.isfinite(np.asarray(out)).all()


def test_cnn_train_mode_mutates_batch_stats():
    model, variables = init_grasp_cnn(jax.random.PRNGKey(0),
                                      ModelConfig(encoder_filters=(8, 16)))
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 32, 32, 9))
    out, mutated = model.apply(variables, x, train=True,
                               rngs={"dropout": jax.random.PRNGKey(2)},
                               mutable=["batch_stats"])
    assert out.shape == (8, 1)
    old = jax.tree.leaves(variables["batch_stats"])
    new = jax.tree.leaves(mutated["batch_stats"])
    assert any(not np.allclose(a, b) for a, b in zip(old, new))


def test_architecture_param_counts_ordering():
    counts = {}
    for name, filters in ARCHITECTURES.items():
        cfg = ModelConfig(encoder_filters=filters)
        model, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg)
        counts[name] = model.num_params(variables)
    assert counts["lightweight"] < counts["standard"] < counts["wide"]


def test_ml_score_spread_matches_reference():
    logits = jnp.array([-3.0, 0.0, 3.0])
    s = np.asarray(ml_scores_from_logits(logits))
    sig = 1 / (1 + np.exp(-np.array([-3.0, 0.0, 3.0])))
    expected = np.tanh(sig * 3.0) * 0.5 + 0.5
    np.testing.assert_allclose(s, expected, rtol=1e-4)  # f32 vs f64


# ---------------------------------------------------------------- fusion --

def _reference_fusion(trad, ml, use_ml):
    """grasp_point_selector.py:205-237 literal."""
    best_point = 0
    best_score = trad[0]
    ml_used = False
    if use_ml and len(trad) > 1:
        for i in range(len(trad)):
            conf = 1.0 - abs(ml[i] - 0.5) * 2
            w = min(0.3, conf * 0.6)
            combined = (1 - w) * trad[i] + w * ml[i]
            if combined > best_score:
                best_score = combined
                best_point = i
                ml_used = True
    return best_point, best_score, ml_used


@pytest.mark.parametrize("seed", range(5))
def test_fusion_matches_reference(seed, rng):
    k = 20
    trad = rng.random(k).astype(np.float32)
    ml = rng.random(k).astype(np.float32)
    accepted = np.ones(k, bool)
    out = fuse_candidates(trad, ml, accepted, True)
    exp_idx, exp_score, exp_used = _reference_fusion(list(trad), list(ml),
                                                     True)
    assert int(out.best_index) == exp_idx
    np.testing.assert_allclose(float(out.best_score), exp_score, rtol=1e-6)
    assert bool(out.ml_used) == exp_used


def test_fusion_cv_only_returns_first():
    trad = np.array([0.9, 0.8, 0.99], np.float32)
    ml = np.array([0.99, 0.99, 0.99], np.float32)
    out = fuse_candidates(trad, ml, np.ones(3, bool), False)
    assert int(out.best_index) == 0
    assert not bool(out.ml_used)


# -------------------------------------------------------------- pipeline --

def _scene():
    return make_leaf_scene(height=270, width=360, num_leaves=4, seed=3,
                           margin=40)


def test_pipeline_cv_only_end_to_end():
    mask, depth = _scene()
    fn = make_frame_fn(CFG, with_cnn=False)
    res = fn(mask, depth, CX, CY, F)
    assert bool(res.found)
    lid = int(res.leaf_id)
    assert lid >= 1
    u, v = np.asarray(res.grasp_uv)
    assert mask[v, u] == lid          # grasp pixel lies on the chosen leaf
    g = np.asarray(res.grasp_xyz)
    assert abs(g[2] - depth[v, u]) < 1e-6
    assert not bool(res.ml_used)
    pre = np.asarray(res.pre_grasp_xyz)
    assert np.isfinite(pre).all()
    assert abs(pre[2] - g[2]) < 1e-6  # constant-Z ray march


def test_pipeline_with_cnn_end_to_end():
    mask, depth = _scene()
    model, variables = init_grasp_cnn(
        jax.random.PRNGKey(0), ModelConfig(encoder_filters=(8, 16)))
    cfg = CFG.replace(model=ModelConfig(encoder_filters=(8, 16)))
    fn = make_frame_fn(cfg, with_cnn=True)
    res = fn(mask, depth, CX, CY, F, variables)
    assert bool(res.found)
    u, v = np.asarray(res.grasp_uv)
    assert mask[v, u] == int(res.leaf_id)
    # fused winner must obey the reference rule: either candidate 0 or a
    # strictly better combined score
    if bool(res.ml_used):
        assert float(res.fusion.best_score) > float(res.candidates.score[0])


def test_pipeline_train_stats_normalization():
    """patch_normalization='train_stats' serves the CNN the same
    z-scored inputs it trained on (the corrected mode; the reference's
    own serving min-max is a train/serve mismatch)."""
    from leafgrasp_tpu.config import MLFusionConfig
    mask, depth = _scene()
    mc = ModelConfig(encoder_filters=(8, 16))
    model, variables = init_grasp_cnn(jax.random.PRNGKey(0), mc)
    cfg = CFG.replace(model=mc, fusion=MLFusionConfig(
        patch_normalization="train_stats"))
    stats = {"depth_mean": 0.45, "depth_std": 0.1,
             "score_mean": np.zeros(7, np.float32),
             "score_std": np.ones(7, np.float32)}
    fn = make_frame_fn(cfg, with_cnn=True, norm_stats=stats)
    res = fn(mask, depth, CX, CY, F, variables)
    assert bool(res.found)
    u, v = np.asarray(res.grasp_uv)
    assert mask[v, u] == int(res.leaf_id)
    # the two normalizations feed the CNN different features
    base = make_frame_fn(CFG.replace(model=mc), with_cnn=True)(
        mask, depth, CX, CY, F, variables)
    assert not np.allclose(np.asarray(res.fusion.combined),
                           np.asarray(base.fusion.combined))
    # guard: train_stats without the checkpoint stats is an error
    with pytest.raises(ValueError):
        make_frame_fn(cfg, with_cnn=True)


def test_pipeline_empty_frame():
    mask = np.zeros((270, 360), np.int16)
    depth = np.full((270, 360), 0.6, np.float32)
    fn = make_frame_fn(CFG, with_cnn=False)
    res = fn(mask, depth, CX, CY, F)
    assert not bool(res.found)
    assert int(res.leaf_id) == 0
