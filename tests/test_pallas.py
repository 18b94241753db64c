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
