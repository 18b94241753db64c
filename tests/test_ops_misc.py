"""Conv / pareto / PCA / per-leaf stats / spaced top-k unit tests."""

import numpy as np
import torch
import torch.nn.functional as F

from leafgrasp_tpu.ops.conv import (gaussian_kernel, smooth_depth,
                                    sobel_gradients, flatness_from_depth,
                                    SOBEL_X)
from leafgrasp_tpu.ops.pareto import pareto_mask
from leafgrasp_tpu.ops.pca import mask_orientation
from leafgrasp_tpu.ops.components import leaf_stats
from leafgrasp_tpu.ops.topk import topk_min_distance


# ---------------------------------------------------------------- conv ----

def test_gaussian_kernel_matches_reference_formula():
    k = gaussian_kernel(5)
    assert abs(k.sum() - 1.0) < 1e-6
    # peak at center, symmetric
    assert k[2, 2] == k.max()
    np.testing.assert_allclose(k, k.T, rtol=1e-6)


def test_smooth_depth_matches_torch(rng):
    depth = rng.random((64, 80)).astype(np.float32)
    ours = np.asarray(smooth_depth(depth, 5))

    # reference image_processor.py:56-64: reflect pad + conv2d
    g = torch.tensor(gaussian_kernel(5))
    t = torch.tensor(depth)[None, None]
    padded = F.pad(t, (2, 2, 2, 2), mode="reflect")
    ref = F.conv2d(padded, g[None, None]).squeeze().numpy()
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-6)


def test_sobel_matches_torch(rng):
    img = rng.random((33, 47)).astype(np.float32)
    dx, dy = sobel_gradients(img)
    t = torch.tensor(img)[None, None]
    padded = F.pad(t, (1, 1, 1, 1), mode="reflect")
    ref_dx = F.conv2d(padded, torch.tensor(SOBEL_X)[None, None]).squeeze()
    np.testing.assert_allclose(np.asarray(dx), ref_dx.numpy(),
                               rtol=1e-5, atol=1e-5)


def test_flatness_flat_surface_is_one():
    flat = np.full((40, 40), 0.5, np.float32)
    f = np.asarray(flatness_from_depth(flat))
    np.testing.assert_allclose(f, 1.0, atol=1e-5)


# -------------------------------------------------------------- pareto ----

def _naive_pareto(scores, valid):
    k = len(scores)
    out = np.zeros(k, bool)
    for i in range(k):
        if not valid[i]:
            continue
        dominated = False
        for j in range(k):
            if not valid[j] or i == j:
                continue
            if (scores[j] >= scores[i]).all() and (scores[j] > scores[i]).any():
                dominated = True
                break
        out[i] = not dominated
    return out


def test_pareto_random(rng):
    for _ in range(20):
        scores = rng.random((10, 3))
        valid = rng.random(10) > 0.2
        ours = np.asarray(pareto_mask(scores, valid))
        np.testing.assert_array_equal(ours, _naive_pareto(scores, valid))


def test_pareto_matches_paretoset_semantics():
    # hand case: b dominates a; c incomparable
    scores = np.array([[0.1, 0.1, 0.1],
                       [0.2, 0.2, 0.2],
                       [0.9, 0.0, 0.0]])
    valid = np.ones(3, bool)
    out = np.asarray(pareto_mask(scores, valid))
    np.testing.assert_array_equal(out, [False, True, True])


# ----------------------------------------------------------------- pca ----

def test_pca_orientation_on_ellipse():
    h, w = 200, 300
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    theta = 0.5
    ct, st = np.cos(theta), np.sin(theta)
    xr = (xx - 150) * ct + (yy - 100) * st
    yr = -(xx - 150) * st + (yy - 100) * ct
    mask = (xr / 80) ** 2 + (yr / 30) ** 2 <= 1

    o = mask_orientation(mask)
    ang = float(o.angle) % np.pi
    assert abs(ang - theta) < 0.02
    assert float(o.major_axis) > float(o.minor_axis)
    np.testing.assert_allclose(np.asarray(o.center), [150, 100], atol=1.0)
    # 4-sigma extent of a solid ellipse ~= 2a (sigma = a/2)
    assert abs(float(o.major_axis) - 160) < 6
    assert abs(float(o.minor_axis) - 60) < 6


def test_pca_empty_mask_is_invalid():
    o = mask_orientation(np.zeros((10, 10), bool))
    assert not bool(o.valid)


# ---------------------------------------------------------- leaf stats ----

def test_leaf_stats_match_numpy(small_scene):
    mask, depth = small_scene
    cx, cy, f = 180.0, 135.0, 800.0
    stats = leaf_stats(mask, depth, max_leaves=8, camera_cx=cx,
                       camera_cy=cy, f_norm=f)

    for lid in range(1, 9):
        m = mask == lid
        present = bool(m.any())
        assert bool(stats.present[lid - 1]) == present
        if not present:
            continue
        ys, xs = np.where(m)
        assert int(stats.area[lid - 1]) == m.sum()
        np.testing.assert_allclose(float(stats.centroid_x[lid - 1]),
                                   xs.mean(), rtol=1e-5)
        np.testing.assert_allclose(float(stats.centroid_y[lid - 1]),
                                   ys.mean(), rtol=1e-5)
        np.testing.assert_allclose(float(stats.mean_depth[lid - 1]),
                                   depth[m].mean(), rtol=1e-5)
        np.testing.assert_allclose(float(stats.median_depth[lid - 1]),
                                   np.median(depth[m]), rtol=1e-5)
        ray = np.sqrt((xs - cx) ** 2 + (ys - cy) ** 2 + f ** 2)
        # f32 accumulation over ~3e4 px -> allow 1e-4 relative
        np.testing.assert_allclose(float(stats.mean_ray_norm[lid - 1]),
                                   ray.mean(), rtol=1e-4)
        border = (m[0, :].any() or m[-1, :].any() or m[:, 0].any()
                  or m[:, -1].any())
        assert bool(stats.border_contact[lid - 1]) == border


# ---------------------------------------------------------------- topk ----

def _reference_candidates(score_map, valid, top_k, min_distance):
    """Literal transcription of grasp_point_selector.py:447-482."""
    valid_scores = score_map * valid
    flat = np.argsort(valid_scores.ravel(), kind="stable")[::-1]
    candidates = []
    used = np.zeros_like(valid, bool)
    for idx in flat:
        if len(candidates) >= top_k:
            break
        y, x = np.unravel_index(idx, score_map.shape)
        sl = (slice(max(0, y - min_distance),
                    min(y + min_distance + 1, score_map.shape[0])),
              slice(max(0, x - min_distance),
                    min(x + min_distance + 1, score_map.shape[1])))
        if not used[sl].any():
            candidates.append((int(x), int(y)))
            used[sl] = True
    return candidates


def test_topk_matches_reference(rng):
    h, w = 90, 120
    score = rng.random((h, w)).astype(np.float32)
    valid = rng.random((h, w)) > 0.6

    ref = _reference_candidates(score, valid, top_k=8, min_distance=10)
    ours = topk_min_distance(score, valid, k=8, min_distance=10)
    got = list(zip(np.asarray(ours.x).tolist(), np.asarray(ours.y).tolist()))
    # all reference candidates with positive score must match in order
    n_pos = sum(1 for (x, y) in ref if score[y, x] * valid[y, x] > 0)
    assert got[:n_pos] == ref[:n_pos]


def test_topk_exhaustion_flag():
    score = np.zeros((30, 30), np.float32)
    score[5, 5] = 1.0
    valid = np.zeros((30, 30), bool)
    valid[5, 5] = True
    out = topk_min_distance(score, valid, k=5, min_distance=10)
    assert bool(out.accepted[0])
    assert int(out.x[0]) == 5 and int(out.y[0]) == 5


def test_min_area_rect_matches_cv2():
    """TPU-native minAreaRect (row-extreme hull candidates -> hull by
    simultaneous reflex deletion -> exact edge-direction calipers) vs
    cv2.minAreaRect of the largest contour
    (grasp_point_selector.py:718-752): the same rectangle -- angle
    within 0.05 deg, extents/center within 0.51 px (f32 projection
    rounding) -- except on exact area ties between distinct edge
    directions, where ours must be at least as tight. Multi-component
    and holed masks exercise the run-graph component labeling (cv2's
    RETR_EXTERNAL + max contourArea semantics)."""
    import cv2
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.pca import min_area_rect
    from leafgrasp_tpu.io.scenes import make_leaf_scene

    cases = []
    for seed in (0, 2, 6, 9, 25):
        mask, _ = make_leaf_scene(270, 360, num_leaves=5, seed=seed,
                                  margin=40)
        for lid in np.unique(mask):
            if lid != 0 and (mask == lid).sum() >= 800:
                cases.append(mask == lid)
    # synthetic: two components (largest must win) and a holed blob
    two = np.zeros((120, 160), bool)
    two[10:30, 10:40] = True           # small
    two[50:110, 60:150] = True         # large
    cases.append(two)
    holed = np.zeros((120, 160), bool)
    holed[20:100, 30:130] = True
    holed[40:80, 60:100] = False
    cases.append(holed)

    for m in cases:
        m8 = m.astype(np.uint8)
        cont, _ = cv2.findContours(m8, cv2.RETR_EXTERNAL,
                                   cv2.CHAIN_APPROX_NONE)
        c = max(cont, key=cv2.contourArea)
        rect = cv2.minAreaRect(c)
        size, ang = rect[1], rect[2]
        if size[0] < size[1]:
            ang += 90
        ang = np.deg2rad(ang)
        o = min_area_rect(m)
        assert bool(o.valid)
        da = float(jnp.abs(((o.angle - ang + np.pi / 2) % np.pi)
                           - np.pi / 2)) * 180 / np.pi
        ours_area = float(o.major_axis) * float(o.minor_axis)
        cv2_area = size[0] * size[1]
        assert da < 0.05 or ours_area <= cv2_area + 1e-2, \
            f"angle diff {da:.2f} deg with worse area {ours_area} vs {cv2_area}"
        if da < 0.05:
            assert abs(float(o.major_axis) - max(size)) < 0.51
            assert abs(float(o.minor_axis) - min(size)) < 0.51
            assert np.hypot(float(o.center[0]) - rect[0][0],
                            float(o.center[1]) - rect[0][1]) < 0.51


def test_min_area_rect_empty_and_full():
    from leafgrasp_tpu.ops.pca import min_area_rect
    o = min_area_rect(np.zeros((40, 50), bool))
    assert not bool(o.valid)
    o = min_area_rect(np.ones((40, 50), bool))
    assert bool(o.valid)
    assert abs(float(o.major_axis) - 49.0) < 1.0
    assert abs(float(o.minor_axis) - 39.0) < 1.0
    # degenerate geometries: line masks give zero-width rects
    line = np.zeros((40, 50), bool)
    line[20, 5:45] = True
    o = min_area_rect(line)
    assert abs(float(o.major_axis) - 39.0) < 0.51
    assert float(o.minor_axis) < 1e-4
    diag = np.zeros((60, 60), bool)
    for i in range(40):
        diag[10 + i, 10 + i] = True
    o = min_area_rect(diag)
    da = abs(((float(o.angle) - np.pi / 4 + np.pi / 2) % np.pi)
             - np.pi / 2)
    assert da < 1e-4 and float(o.minor_axis) < 1e-3


def test_largest_component_labeling_adversarial():
    """Run-graph component labeling vs scipy 8-connected labeling on
    shapes built to break first-overlap linking: spirals, combs,
    diagonal chains, and random speckle. The winner's per-row extremes
    must equal scipy's largest component's."""
    import scipy.ndimage as ndi
    import jax.numpy as jnp
    from leafgrasp_tpu.ops.pca import _largest_component_extremes

    rng = np.random.default_rng(3)
    masks = []
    # spiral
    sp = np.zeros((64, 64), bool)
    x0, x1, y0, y1 = 2, 61, 2, 61
    while x1 - x0 > 6:
        sp[y0, x0:x1] = True
        sp[y0:y1, x1 - 1] = True
        sp[y1 - 1, x0:x1] = True
        sp[y0 + 2:y1, x0] = True
        x0 += 4; x1 -= 4; y0 += 4; y1 -= 4
    masks.append(sp)
    # comb: teeth joined only at the bottom bar
    comb = np.zeros((50, 80), bool)
    comb[45:48, 4:76] = True
    for t in range(4, 76, 6):
        comb[5:45, t:t + 2] = True
    masks.append(comb)
    # diagonal single-pixel chain (8-conn through corners only)
    dg = np.zeros((48, 48), bool)
    for i in range(40):
        dg[4 + i, 4 + i] = True
    dg[30:40, 4:10] = True      # a bigger second component
    masks.append(dg)
    # random speckle (many components, ties possible)
    masks.append(rng.random((60, 90)) < 0.35)
    masks.append(rng.random((40, 200)) < 0.55)
    # leaf touching frame row 0: flat run slot 0 is REAL, so the
    # compaction LUT must not take duplicate writes at index 0
    # (regression: links into row 0's leftmost run were corruptible)
    edge0 = np.zeros((30, 60), bool)
    edge0[0, 0:51] = True
    edge0[1, 0:11] = True
    edge0[1, 20:31] = True
    edge0[2:11, 20:31] = True      # arm hanging off the SECOND run
    masks.append(edge0)
    edge1 = edge0.copy()
    edge1[0, :] = False
    edge1[0, 0:5] = True           # two components, small one at (0,0)
    masks.append(edge1)

    for m in masks:
        lab, n = ndi.label(m, structure=np.ones((3, 3)))
        sizes = ndi.sum_labels(m, lab, index=np.arange(1, n + 1))
        res = _largest_component_extremes(jnp.asarray(m), 64, max_runs=4096)
        xmin, xmax, valid = (np.asarray(res[0]), np.asarray(res[1]),
                             bool(res[2]))
        assert valid
        cols = np.arange(m.shape[1])
        # any component tied for the max size is an acceptable winner
        tied = [i + 1 for i in range(n) if sizes[i] == sizes.max()]
        matched = False
        for cid in tied:
            big = lab == cid
            exp_min = np.where(big.any(1),
                               np.where(big, cols, 10**6).min(1), 1 << 20)
            exp_max = np.where(big.any(1),
                               np.where(big, cols, -1).max(1), -1)
            if np.array_equal(xmin, exp_min) and \
                    np.array_equal(xmax, exp_max):
                matched = True
                break
        assert matched, "winner extremes match no max-size component"


def test_largest_component_overflow_flag():
    from leafgrasp_tpu.ops.pca import _largest_component_extremes
    import jax.numpy as jnp
    m = np.zeros((8, 64), bool)
    m[3, ::4] = True       # 16 runs in one row
    _, _, valid = _largest_component_extremes(jnp.asarray(m), 8)
    assert not bool(valid)
    _, _, valid = _largest_component_extremes(jnp.asarray(m), 16)
    assert bool(valid)
