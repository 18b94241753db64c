"""Morphology parity vs OpenCV (kernels, dilate, erode, borders)."""

import numpy as np
import pytest
import cv2

from leafgrasp_tpu.ops.morphology import (elliptical_kernel, dilate, erode,
                                          morphological_boundary)


@pytest.mark.parametrize("size", [(3, 3), (5, 5), (15, 15), (30, 30),
                                  (40, 40), (21, 21), (31, 31), (7, 11)])
def test_elliptical_kernel_matches_cv2(size):
    ref = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, size)
    ours = elliptical_kernel(size[0], size[1])
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ksize", [3, 5, 15, 30])
def test_dilate_matches_cv2(ksize, small_scene):
    mask, _ = small_scene
    m = (mask == 2).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    ref = cv2.dilate(m, k)
    ours = np.asarray(dilate(m > 0, elliptical_kernel(ksize))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


@pytest.mark.parametrize("ksize", [3, 5, 15, 21])
def test_erode_matches_cv2(ksize, small_scene):
    mask, _ = small_scene
    m = (mask > 0).astype(np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (ksize, ksize))
    ref = cv2.erode(m, k)
    ours = np.asarray(erode(m > 0, elliptical_kernel(ksize))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_erode_border_semantics():
    # A mask touching the image border must NOT erode at the border
    # (OpenCV treats out-of-bounds as foreground for erosion).
    m = np.ones((20, 20), np.uint8)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (5, 5))
    ref = cv2.erode(m, k)
    ours = np.asarray(erode(m > 0, elliptical_kernel(5))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)
    assert ours.all()  # nothing eroded


def test_dilate_border_semantics():
    m = np.zeros((10, 10), np.uint8)
    m[0, 0] = 1
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (3, 3))
    ref = cv2.dilate(m, k)
    ours = np.asarray(dilate(m > 0, elliptical_kernel(3))).astype(np.uint8)
    np.testing.assert_array_equal(ours, ref)


def test_boundary_band(small_scene):
    mask, _ = small_scene
    m = mask == 1
    band = np.asarray(morphological_boundary(m))
    assert band.sum() > 0
    assert (band & ~m).sum() == 0  # band lies inside the mask


def test_dilated_vertical_dist_matches_dilate_then_scan():
    """dilated_vertical_dist == pass-1 of the materialized dilation
    (the identity that lets the interference EDTs skip the dilations,
    grasp_point_selector.py:607-610), checked via the final EDT field
    which is what consumers see."""
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.edt import (directional_seed_dist_1d,
                                       squared_edt_full)
    from leafgrasp_tpu.ops.morphology import (dilate,
                                              dilated_vertical_dist,
                                              elliptical_kernel,
                                              rect_kernel)
    rng = np.random.default_rng(2)
    h, w = 67, 91
    for p in (0.003, 0.05, 0.4):
        mask = rng.random((h, w)) < p
        du, dd = directional_seed_dist_1d(jnp.asarray(mask), axis=0)
        for K in (elliptical_kernel(3), elliptical_kernel(30),
                  elliptical_kernel(40), elliptical_kernel(7, 13),
                  rect_kernel(5)):
            g = dilated_vertical_dist(du, dd, K).astype(jnp.float32)
            got = np.asarray(squared_edt_full(
                jnp.zeros((h, w), bool), g2=g * g))
            want = np.asarray(squared_edt_full(
                jnp.asarray(dilate(mask, K))))
            np.testing.assert_array_equal(got, want)


def test_dilated_vertical_dist_multi_bit_equal_per_kernel():
    """The shared-shift multi-kernel variant is bit-identical to
    per-kernel calls (same mins in the same dx order) for the
    isolation close/wide pair and asymmetric extras."""
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.edt import directional_seed_dist_1d
    from leafgrasp_tpu.ops.morphology import (dilated_vertical_dist,
                                              dilated_vertical_dist_multi,
                                              elliptical_kernel,
                                              rect_kernel)
    rng = np.random.default_rng(5)
    mask = rng.random((53, 77)) < 0.04
    du, dd = directional_seed_dist_1d(jnp.asarray(mask), axis=0)
    kernels = (elliptical_kernel(30), elliptical_kernel(40),
               elliptical_kernel(7, 13), rect_kernel(5))
    multi = dilated_vertical_dist_multi(du, dd, kernels)
    for k, got in zip(kernels, multi):
        want = dilated_vertical_dist(du, dd, k)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_dilated_vertical_dist_levels_vs_runs_bit_equal():
    """The r5 sparse-table nested-window erosion ("levels") is
    bit-identical to the per-column-offset loop ("runs") -- the level
    decomposition of a unimodal structuring function preserves the
    candidate set exactly (ops/morphology.dilated_vertical_dist_multi).
    Covers seed densities from near-empty (sentinel paths) to dense,
    frame edges included."""
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.edt import directional_seed_dist_1d
    from leafgrasp_tpu.ops.morphology import (dilated_vertical_dist_multi,
                                              elliptical_kernel,
                                              rect_kernel)
    rng = np.random.default_rng(11)
    kernels = (elliptical_kernel(30), elliptical_kernel(40),
               elliptical_kernel(7, 13), rect_kernel(5),
               elliptical_kernel(41), elliptical_kernel(3))
    for p in (0.0, 0.001, 0.04, 0.5):
        mask = rng.random((61, 83)) < p
        du, dd = directional_seed_dist_1d(jnp.asarray(mask), axis=0)
        lv = dilated_vertical_dist_multi(du, dd, kernels, impl="levels")
        rn = dilated_vertical_dist_multi(du, dd, kernels, impl="runs")
        for k, a, b in zip(kernels, lv, rn):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b),
                err_msg=f"kernel {k.shape} p={p}")


def test_se_levels_non_unimodal_falls_back():
    """A structuring element whose column heights are NOT unimodal must
    route through the per-dx path (the level windows would be
    non-contiguous); the public API still returns the exact answer."""
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.edt import directional_seed_dist_1d
    from leafgrasp_tpu.ops.morphology import (_se_levels, _col_runs,
                                              dilated_vertical_dist,
                                              dilated_vertical_dist_multi)
    # columns: heights 3,1,3 around the anchor row -> non-unimodal
    se = np.array([[1, 0, 1],
                   [1, 1, 1],
                   [1, 0, 1]], dtype=np.uint8)
    runs = _col_runs(se)
    assert _se_levels(runs, 1) is None
    rng = np.random.default_rng(3)
    h, w = 31, 47
    mask = rng.random((h, w)) < 0.1
    du, dd = directional_seed_dist_1d(jnp.asarray(mask), axis=0)
    got = dilated_vertical_dist_multi(du, dd, (se,), impl="levels")[0]
    # numpy oracle: materialize the OpenCV dilation (anchor = center),
    # then per-column vertical nearest-seed distance with the h+w
    # sentinel
    dil = np.zeros((h, w), bool)
    for i in range(3):
        for j in range(3):
            if se[i, j]:
                ys = np.clip(np.arange(h) + i - 1, 0, h - 1)
                xs = np.clip(np.arange(w) + j - 1, 0, w - 1)
                valid_y = (np.arange(h) + i - 1 >= 0) & \
                    (np.arange(h) + i - 1 < h)
                valid_x = (np.arange(w) + j - 1 >= 0) & \
                    (np.arange(w) + j - 1 < w)
                contrib = mask[np.ix_(ys, xs)] & valid_y[:, None] & \
                    valid_x[None, :]
                dil |= contrib
    want = np.full((h, w), h + w, np.int64)
    for x in range(w):
        seeds = np.flatnonzero(dil[:, x])
        if seeds.size:
            want[:, x] = np.abs(np.arange(h)[:, None]
                                - seeds[None, :]).min(axis=1)
    np.testing.assert_array_equal(np.asarray(got, dtype=np.int64), want)
