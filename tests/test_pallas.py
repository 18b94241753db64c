"""Pallas kernel parity tests (interpret mode on the CPU mesh)."""

import numpy as np
import pytest

from leafgrasp_tpu.geometry.grasp_scorer import compute_grasp_scores
from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.ops.edt import edt
from leafgrasp_tpu.ops.pallas_edt import edt_pallas

CX, CY, F = 180.0, 135.0, 800.0


def test_pallas_edt_matches_oracle():
    mask, _ = make_leaf_scene(height=96, width=160, num_leaves=3, seed=1,
                              margin=20)
    fg = mask > 0
    a = np.asarray(edt(fg))
    b = np.asarray(edt_pallas(fg, interpret=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_pallas_edt_batch_matches_oracle():
    mask, _ = make_leaf_scene(height=64, width=96, num_leaves=3, seed=2,
                              margin=16)
    seeds = np.stack([mask > 0, mask == 1, mask == 2])
    a = np.stack([np.asarray(edt(s)) for s in seeds])
    b = np.asarray(edt_pallas(seeds, interpret=True))
    np.testing.assert_allclose(a, b, rtol=0, atol=0)


def test_fused_scoring_matches_oracle():
    mask, depth = make_leaf_scene(height=270, width=360, num_leaves=4,
                                  seed=3, margin=40)
    leaf = mask == 3
    allm = mask > 0
    ref = compute_grasp_scores(leaf, allm, depth, CX, CY, F,
                               use_pallas=False)
    fused = compute_grasp_scores(leaf, allm, depth, CX, CY, F,
                                 use_pallas=True)
    for name in ref._fields:
        a = np.asarray(getattr(ref, name))
        b = np.asarray(getattr(fused, name))
        if a.dtype == bool:
            np.testing.assert_array_equal(a, b, err_msg=name)
        else:
            np.testing.assert_allclose(a, b, rtol=2e-5, atol=2e-6,
                                       err_msg=name)


def test_fused_scoring_empty_leaf_orientation_fallback():
    """Empty leaf -> PCA invalid -> alignment term falls back to 1."""
    mask, depth = make_leaf_scene(height=96, width=128, num_leaves=2,
                                  seed=1, margin=20)
    leaf = np.zeros_like(mask, bool)
    ref = compute_grasp_scores(leaf, mask > 0, depth, CX, CY, F,
                               use_pallas=False)
    fused = compute_grasp_scores(leaf, mask > 0, depth, CX, CY, F,
                                 use_pallas=True)
    np.testing.assert_allclose(np.asarray(ref.traditional_score),
                               np.asarray(fused.traditional_score),
                               rtol=2e-5, atol=2e-6)


def test_pallas_attention_matches_reference():
    import jax
    import jax.numpy as jnp
    from leafgrasp_tpu.models.attention_pallas import (
        fused_attention_gate, attention_gate_reference)
    rng = np.random.default_rng(0)
    n, h, w, c, r = 4, 4, 4, 64, 4
    x = jnp.asarray(rng.normal(size=(n, h, w, c)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(c, 1)).astype(np.float32) * 0.1)
    bs = jnp.zeros((1,), jnp.float32)
    w1 = jnp.asarray(rng.normal(size=(c, r)).astype(np.float32) * 0.1)
    b1 = jnp.zeros((r,), jnp.float32)
    w2 = jnp.asarray(rng.normal(size=(r, c)).astype(np.float32) * 0.1)
    b2 = jnp.zeros((c,), jnp.float32)
    for mode in ("spatial", "channel", "hybrid", "none"):
        a = attention_gate_reference(x, ws, bs, w1, b1, w2, b2, mode)
        b = fused_attention_gate(x, ws, bs, w1, b1, w2, b2, mode,
                                 interpret=True)
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6, err_msg=mode)


def test_model_pallas_attention_flag_same_params():
    """Flipping pallas_attention must not change outputs or the param
    tree (shared parameters)."""
    import jax
    import jax.numpy as jnp
    from leafgrasp_tpu.config import ModelConfig
    from leafgrasp_tpu.models.grasp_cnn import GraspPointCNN, \
        init_grasp_cnn
    cfg = ModelConfig(encoder_filters=(8, 16), attention_type="hybrid")
    model, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(
        size=(3, 32, 32, 9)).astype(np.float32))
    out_plain = model.apply(variables, x, train=False)

    cfg_p = ModelConfig(encoder_filters=(8, 16), attention_type="hybrid",
                        pallas_attention=True)
    model_p = GraspPointCNN(cfg_p)
    out_pallas = model_p.apply(variables, x, train=False)
    np.testing.assert_allclose(np.asarray(out_plain),
                               np.asarray(out_pallas), rtol=1e-4,
                               atol=1e-5)


def test_pallas_segment_histogram_matches_numpy(rng):
    from leafgrasp_tpu.ops.pallas_median import segment_histogram, NBINS
    h, w, num = 40, 70, 5
    depth = rng.random((h, w)).astype(np.float32)
    ids = rng.integers(0, num, (h, w)).astype(np.int32)
    lo = np.zeros(num, np.float32)
    inv_w = np.full(num, NBINS / 1.0, np.float32)
    hist = np.asarray(segment_histogram(depth, ids, lo, inv_w, num,
                                        interpret=True))
    for n in range(num):
        vals = depth[ids == n]
        bins = np.clip((vals * NBINS).astype(np.int32), 0, NBINS - 1)
        expected = np.bincount(bins, minlength=NBINS)
        np.testing.assert_array_equal(hist[n], expected)


def test_pallas_median_matches_numpy(rng):
    from leafgrasp_tpu.ops.pallas_median import masked_median_pallas
    h, w, num = 64, 96, 6
    depth = (rng.random((h, w)) * 0.5 + 0.3).astype(np.float32)
    ids = rng.integers(0, num, (h, w)).astype(np.int32)
    counts = np.bincount(ids.ravel(), minlength=num)
    med = np.asarray(masked_median_pallas(depth, ids, counts, num,
                                          levels=2, interpret=True))
    span = depth.max() - depth.min()
    for n in range(num):
        expected = np.median(depth[ids == n])
        assert abs(med[n] - expected) <= span / (256 ** 2), \
            (n, med[n], expected)


def test_leaf_stats_pallas_median_parity(small_scene):
    """leaf_stats(use_pallas=True) must agree with the default path on
    every statistic, and the downstream leaf choice must be identical --
    guards the flag staying a behavioral no-op (or, if a Pallas median
    is ever routed, that it lands within tolerance)."""
    from leafgrasp_tpu.ops.components import leaf_stats
    from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf
    mask, depth = small_scene
    a = leaf_stats(mask, depth, 8, CX, CY, F)
    b = leaf_stats(mask, depth, 8, CX, CY, F, use_pallas=True)
    span = float(np.asarray(depth).max() - np.asarray(depth).min())
    present = np.asarray(a.present)
    # empty slots carry arbitrary medians in both paths; every consumer
    # masks by `present` (leaf_scorer.py tall split)
    np.testing.assert_allclose(np.asarray(a.median_depth)[present],
                               np.asarray(b.median_depth)[present],
                               atol=span / 256 ** 2 + span * 2 ** -18)
    for name in a._fields:
        if name == "median_depth":
            continue
        np.testing.assert_array_equal(np.asarray(getattr(a, name)),
                                      np.asarray(getattr(b, name)),
                                      err_msg=name)
    sa = select_optimal_leaf(mask, depth, CX, CY, F)
    sb = select_optimal_leaf(mask, depth, CX, CY, F, use_pallas=True)
    assert int(sa.best_leaf_id) == int(sb.best_leaf_id)
    np.testing.assert_array_equal(np.asarray(sa.is_tall),
                                  np.asarray(sb.is_tall))


def test_pallas_median_on_scene(small_scene):
    from leafgrasp_tpu.ops.pallas_median import masked_median_pallas
    mask, depth = small_scene
    num = 10
    ids = np.clip(mask, 0, num - 1).astype(np.int32)
    counts = np.bincount(ids.ravel(), minlength=num)
    med = np.asarray(masked_median_pallas(depth, ids, counts, num,
                                          levels=2, interpret=True))
    span = depth.max() - depth.min()
    for n in range(num):
        sel = ids == n
        if not sel.any():
            continue
        assert abs(med[n] - np.median(depth[sel])) <= span / 256 ** 2


def test_pallas_banded_pass2_matches_oracle():
    """Per-tile banded sweep kernel: exact on dense, sparse and
    seedless channels."""
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.edt import nearest_seed_dist_1d, squared_edt_full
    from leafgrasp_tpu.ops.pallas_edt import squared_edt_pass2_banded
    rng = np.random.default_rng(5)
    dense = rng.random((96, 160)) < 0.1
    sparse = np.zeros((96, 160), bool)
    sparse[7, 140] = True
    empty = np.zeros((96, 160), bool)
    seeds = np.stack([dense, sparse, empty])
    g = nearest_seed_dist_1d(jnp.asarray(seeds), axis=1).astype(jnp.float32)
    got = np.asarray(squared_edt_pass2_banded(g * g, interpret=True))
    want = np.stack([np.asarray(squared_edt_full(s)) for s in seeds])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)


def test_pallas_rowband_edt_matches_oracle():
    """Row-banded (sublane-major) kernel: exact vs the full sweep."""
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.edt import squared_edt_full
    from leafgrasp_tpu.ops.pallas_edt import edt_batch_rowband
    mask, _ = make_leaf_scene(height=96, width=160, num_leaves=3, seed=4,
                              margin=20)
    rng = np.random.default_rng(9)
    seeds = np.stack([mask > 0, mask == 2,
                      rng.random((96, 160)) < 0.002,
                      np.zeros((96, 160), bool)])
    got = np.asarray(edt_batch_rowband(jnp.asarray(seeds), interpret=True))
    want = np.stack([np.sqrt(np.asarray(squared_edt_full(s)))
                     for s in seeds])
    np.testing.assert_allclose(got, want, rtol=0, atol=0)
