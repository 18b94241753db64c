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
