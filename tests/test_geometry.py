"""Parity of the vectorized leaf selector / grasp scorer vs the
loop-based oracle (tests/reference_impl.py)."""

import numpy as np
import pytest

from leafgrasp_tpu.config import FrameConfig, LeafSelectionConfig
from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf
from leafgrasp_tpu.geometry.grasp_scorer import compute_grasp_scores
from leafgrasp_tpu.geometry.lift3d import (lift_to_3d, project_to_2d,
                                           pre_grasp_point)
from leafgrasp_tpu.geometry.patches import assemble_cnn_inputs, \
    extract_patches
from leafgrasp_tpu.io.scenes import make_leaf_scene

from tests import reference_impl as ref

CX, CY, F = 180.0, 135.0, 800.0
# scenes are 270x360 -> scale the reference's 10000px area gate down
AREA = 1500
CFG = LeafSelectionConfig(min_leaf_area=AREA)
FRAME = FrameConfig(height=270, width=360, max_leaves=8)


def _scene(seed, n=4):
    return make_leaf_scene(height=270, width=360, num_leaves=n, seed=seed,
                           margin=40)


@pytest.mark.parametrize("seed", [0, 1, 3, 7, 11])
def test_leaf_selection_matches_oracle(seed):
    mask, depth = _scene(seed)
    sel = select_optimal_leaf(mask, depth, CX, CY, F, cfg=CFG, frame=FRAME)
    expected, cands = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                                min_area=AREA, mode="exact")
    if expected is None:
        assert not bool(sel.found)
        return
    assert int(sel.best_leaf_id) == expected
    # per-leaf score parity for every area-filtered candidate
    ours = np.asarray(sel.scores)
    for lid, c in cands.items():
        np.testing.assert_allclose(ours[lid - 1], c["s"], rtol=2e-4,
                                   atol=2e-5)
        assert bool(sel.is_tall[lid - 1]) == c["tall"]


@pytest.mark.parametrize("seed", [0, 1, 3])
def test_leaf_selection_matches_cv2_chamfer_oracle(seed):
    """Argmax-level parity against the reference running its own cv2
    chamfer transforms (the BASELINE 'bit-matched selection' check)."""
    mask, depth = _scene(seed)
    sel = select_optimal_leaf(mask, depth, CX, CY, F, cfg=CFG, frame=FRAME)
    expected, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                            min_area=AREA, mode="cv2")
    assert int(sel.best_leaf_id) == expected


@pytest.mark.parametrize("seed", [0, 3])
def test_grasp_scores_match_oracle(seed):
    mask, depth = _scene(seed)
    sel_id, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                          min_area=AREA, mode="exact")
    leaf = mask == sel_id
    allm = mask > 0
    ours = compute_grasp_scores(leaf, allm, depth, CX, CY, F)
    oracle = ref.grasp_scores_reference(leaf, allm, depth, CX, CY, F,
                                        mode="exact")
    for name in ("sdf_score", "approach_score", "flatness_map",
                 "isolation_map", "distance_map", "accessibility_map",
                 "stem_penalty", "traditional_score"):
        got = np.asarray(getattr(ours, name))
        np.testing.assert_allclose(
            got, oracle[name], rtol=2e-3, atol=2e-3,
            err_msg=f"score map mismatch: {name}")
    np.testing.assert_array_equal(np.asarray(ours.valid_region),
                                  oracle["valid_region"])


def test_grasp_pixel_matches_exact_oracle_bitwise():
    """Bit-level grasp-pixel parity vs the loop oracle running the same
    (exact) EDT -- validates every piece of vectorization/ordering."""
    from leafgrasp_tpu.ops.topk import topk_min_distance
    mask, depth = _scene(3)
    sel_id, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                          min_area=AREA, mode="exact")
    leaf = mask == sel_id
    allm = mask > 0

    ours = compute_grasp_scores(leaf, allm, depth, CX, CY, F)
    cand = topk_min_distance(np.asarray(ours.traditional_score),
                             np.asarray(ours.valid_region), k=20,
                             min_distance=10)
    # oracle candidates computed from OUR maps (validates topk) ...
    ref_cand = _ref_candidates(np.asarray(ours.traditional_score),
                               np.asarray(ours.valid_region), 20, 10)
    got = list(zip(np.asarray(cand.x).tolist(), np.asarray(cand.y).tolist()))
    n_pos = sum(1 for (x, y) in ref_cand
                if ours.traditional_score[y, x] > 0)
    assert got[:n_pos] == ref_cand[:n_pos]
    # ... and from the oracle's own exact-EDT maps (validates the maps)
    oracle = ref.grasp_scores_reference(leaf, allm, depth, CX, CY, F,
                                        mode="exact")
    ref_cand2 = _ref_candidates(oracle["traditional_score"],
                                oracle["valid_region"], 20, 10)
    assert got[0] == ref_cand2[0]


def test_grasp_pixel_vs_cv2_chamfer_bounded_divergence():
    """Documented divergence check: against an oracle running the
    reference's own cv2 *chamfer* transforms (max rel. err ~2%), the
    selected pixel may shift by a few px, but must stay equal-quality:
    the oracle's own score at our pixel matches its best score to 1e-3
    and the pixel distance stays small."""
    from leafgrasp_tpu.ops.topk import topk_min_distance
    mask, depth = _scene(3)
    sel_id, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                          min_area=AREA, mode="cv2")
    leaf = mask == sel_id
    allm = mask > 0

    ours = compute_grasp_scores(leaf, allm, depth, CX, CY, F)
    cand = topk_min_distance(np.asarray(ours.traditional_score),
                             np.asarray(ours.valid_region), k=20,
                             min_distance=10)
    x0, y0 = int(cand.x[0]), int(cand.y[0])

    oracle = ref.grasp_scores_reference(leaf, allm, depth, CX, CY, F,
                                        mode="cv2")
    ref_cand = _ref_candidates(oracle["traditional_score"],
                               oracle["valid_region"], 20, 10)
    rx, ry = ref_cand[0]
    assert abs(x0 - rx) + abs(y0 - ry) <= 10
    s_ref = oracle["traditional_score"][ry, rx]
    s_ours = oracle["traditional_score"][y0, x0]
    assert abs(s_ref - s_ours) < 1e-3


def _ref_candidates(score_map, valid, top_k, min_distance):
    valid_scores = score_map * valid
    flat = np.argsort(valid_scores.ravel(), kind="stable")[::-1]
    out, used = [], np.zeros_like(valid, bool)
    for idx in flat:
        if len(out) >= top_k:
            break
        y, x = np.unravel_index(idx, score_map.shape)
        sl = (slice(max(0, y - min_distance), y + min_distance + 1),
              slice(max(0, x - min_distance), x + min_distance + 1))
        if not used[sl].any():
            out.append((int(x), int(y)))
            used[sl] = True
    return out


# ------------------------------------------------------------- 3D / pre --

def test_lift_project_roundtrip():
    p3 = lift_to_3d(200.0, 100.0, 0.5, CX, CY, F)
    u, v = project_to_2d(p3, CX, CY, F)
    assert (int(u), int(v)) == (200, 100)


def test_pre_grasp_matches_reference_loop():
    mask, depth = _scene(3)
    sel_id, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                          min_area=AREA, mode="exact")
    leaf = (mask == sel_id)
    ys, xs = np.where(leaf)
    gi = len(xs) // 2
    u, v = int(xs[gi]), int(ys[gi])
    g3 = np.asarray(lift_to_3d(float(u), float(v), float(depth[v, u]),
                               CX, CY, F))

    out = pre_grasp_point(g3, leaf, CX, CY, F)
    expected = _ref_pre_grasp(g3, leaf.astype(np.uint8), CX, CY, F)
    np.testing.assert_allclose(np.asarray(out.point), expected, rtol=1e-5)


def _ref_pre_grasp(g, leaf_u8, cx, cy, f):
    """grasp_point_selector.py:754-819 literal."""
    import cv2
    d = g / np.linalg.norm(g)
    k = cv2.getStructuringElement(cv2.MORPH_ELLIPSE, (31, 31))
    dil = cv2.dilate(leaf_u8, k)
    h, w = leaf_u8.shape
    for dist in np.arange(0.05, 0.10, 0.01):
        t = (g[0] - d[0] * dist, g[1] - d[1] * dist, g[2])
        u = int(t[0] * f / t[2] + cx)
        v = int(t[1] * f / t[2] + cy)
        if not (0 <= u < w and 0 <= v < h):
            continue
        if dil[v, u] == 0 and np.linalg.norm(np.array(t) - g) >= 0.05:
            return np.array(t)
    return np.array([g[0] - d[0] * 0.10, g[1] - d[1] * 0.10, g[2]])


# --------------------------------------------------------------- patches --

def test_patch_extraction_replicate_padding(rng):
    maps = rng.random((3, 50, 60)).astype(np.float32)
    xs = np.array([0, 30, 59], np.int32)   # includes border centers
    ys = np.array([0, 25, 49], np.int32)
    out = np.asarray(extract_patches(maps, xs, ys, patch_size=32))
    assert out.shape == (3, 3, 32, 32)
    # interior patch equals the raw slice
    np.testing.assert_array_equal(out[1], maps[:, 25 - 16:25 + 16,
                                               30 - 16:30 + 16])
    # border patch: first row replicates row 0
    np.testing.assert_array_equal(out[0][:, 0, 16:], maps[:, 0, 0:16])


def test_assemble_cnn_inputs_channels(small_scene):
    mask, depth = small_scene
    leaf = mask == 1
    scores = compute_grasp_scores(leaf, mask > 0, depth, CX, CY, F)
    xs = np.array([100, 200], np.int32)
    ys = np.array([100, 150], np.int32)
    feats = np.asarray(assemble_cnn_inputs(depth, leaf, scores, xs, ys))
    assert feats.shape == (2, 32, 32, 9)
    # normalized channels in [0, 1]
    assert feats[:, :, :, 0].min() >= 0 and feats[:, :, :, 0].max() <= 1
    # mask channel is binary
    assert set(np.unique(feats[:, :, :, 1])) <= {0.0, 1.0}


def test_assemble_cnn_inputs_train_stats(small_scene):
    """Corrected serving normalization: the checkpoint's TRAINING
    z-score stats applied at inference (the reference min-maxes at
    serve time, a train/serve mismatch; geometry/patches.py)."""
    mask, depth = small_scene
    leaf = mask == 1
    scores = compute_grasp_scores(leaf, mask > 0, depth, CX, CY, F)
    xs = np.array([100, 200], np.int32)
    ys = np.array([100, 150], np.int32)
    stats = {"depth_mean": np.float32(0.45), "depth_std": np.float32(0.1),
             "score_mean": np.linspace(0.2, 0.8, 7).astype(np.float32),
             "score_std": np.full(7, 0.25, np.float32)}
    z = np.asarray(assemble_cnn_inputs(depth, leaf, scores, xs, ys,
                                       norm_stats=stats))
    mm = np.asarray(assemble_cnn_inputs(depth, leaf, scores, xs, ys))
    assert z.shape == mm.shape == (2, 32, 32, 9)
    # mask channel is raw in both modes
    np.testing.assert_array_equal(z[..., 1], mm[..., 1])
    # depth + score channels are the exact z-scores of the raw patches
    stack = np.concatenate([depth[None].astype(np.float32),
                            leaf[None].astype(np.float32),
                            np.asarray(scores.stacked_channels())], axis=0)
    raw = np.asarray(extract_patches(stack, xs, ys, 32))    # (2, 9, P, P)
    np.testing.assert_allclose(z[..., 0], (raw[:, 0] - 0.45) / 0.1,
                               rtol=0, atol=1e-5)
    for c in range(7):
        np.testing.assert_allclose(
            z[..., 2 + c],
            (raw[:, 2 + c] - stats["score_mean"][c]) / 0.25,
            rtol=0, atol=1e-5)


def test_simple_scorer_v2_legacy():
    from leafgrasp_tpu.geometry.simple_scorer import select_leaf_simple
    mask, depth = _scene(3)
    sel = select_leaf_simple(mask, depth, max_leaves=8, min_area=1500,
                             depth_threshold=0.7)
    assert bool(sel.found)
    lid = int(sel.best_leaf_id)
    assert lid >= 1
    u, v = np.asarray(sel.centroid_uv)
    ys, xs = np.where(mask == lid)
    assert abs(u - xs.mean()) < 1.0 and abs(v - ys.mean()) < 1.0
    s = np.asarray(sel.scores)
    assert (s >= 0).all() and (s <= 1 + 1e-6).all()
    # depth gate: all-far scene yields nothing
    sel2 = select_leaf_simple(mask, depth + 1.0, max_leaves=8,
                              min_area=1500, depth_threshold=0.7)
    assert not bool(sel2.found)


def test_union_half_isolation_close_to_full():
    from leafgrasp_tpu.config import GraspScoringConfig
    mask, depth = _scene(3)
    leaf = mask == 4
    full = compute_grasp_scores(leaf, mask > 0, depth, CX, CY, F,
                                cfg=GraspScoringConfig())
    half = compute_grasp_scores(
        leaf, mask > 0, depth, CX, CY, F,
        cfg=GraspScoringConfig(isolation_context="union_half"))
    a = np.asarray(full.isolation_map)
    b = np.asarray(half.isolation_map)
    sel = np.asarray(leaf)
    # same field up to the half-res quantization (few-px distance error
    # normalized by a few-hundred-px max)
    corr = np.corrcoef(a[sel], b[sel])[0, 1]
    assert corr > 0.99
    # everything outside isolation is untouched
    np.testing.assert_array_equal(np.asarray(full.valid_region),
                                  np.asarray(half.valid_region))
    np.testing.assert_allclose(np.asarray(full.traditional_score),
                               np.asarray(half.traditional_score),
                               rtol=1e-6, atol=1e-7)


@pytest.mark.parametrize("seed,n,h,w", [
    (31, 5, 192, 256), (33, 7, 320, 280), (35, 2, 256, 384),
])
def test_fuzz_pipeline_vs_oracle(seed, n, h, w):
    """Randomized shapes/leaf-counts: leaf choice and candidate order
    must match the loop oracle (exact-EDT mode)."""
    from leafgrasp_tpu.config import PipelineConfig, FrameConfig, \
        LeafSelectionConfig
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    area = max(300, h * w // 60)
    cfg = PipelineConfig(frame=FrameConfig(height=h, width=w,
                                           max_leaves=8),
                         leaf=LeafSelectionConfig(min_leaf_area=area))
    mask, depth = make_leaf_scene(height=h, width=w, num_leaves=n,
                                  seed=seed, margin=30)
    fn = make_frame_fn(cfg, with_cnn=False)
    res = fn(mask, depth, CX, CY, F)
    expected, _ = ref.select_leaf_reference(mask, depth, CX, CY, F,
                                            min_area=area, mode="exact")
    if expected is None:
        assert not bool(res.found)
        return
    assert int(res.leaf_id) == expected
    if not bool(res.degenerate):
        leaf = mask == expected
        oracle = ref.grasp_scores_reference(leaf, mask > 0, depth, CX,
                                            CY, F, mode="exact")
        cands = _ref_candidates(oracle["traditional_score"],
                                oracle["valid_region"], 20, 10)
        assert (int(res.grasp_uv[0]), int(res.grasp_uv[1])) == cands[0]


# ------------------------------------------------- point-cloud lifting --

def test_lift_with_cloud_agreement_keeps_depth_point():
    """Within the 1 cm threshold the depth-lifted point is kept
    (grasp_point_selector.py:163-180)."""
    from leafgrasp_tpu.geometry.lift3d import lift_to_3d_with_cloud
    h, w = 8, 10
    u, v, d = 4, 3, 0.5
    depth_pt = np.asarray(lift_to_3d(float(u), float(v), d, CX, CY, F))
    cloud = np.zeros((h, w, 3), np.float32)
    cloud[v, u] = depth_pt + 0.004   # 4mm off per axis -> ~7mm < 1cm
    out = np.asarray(lift_to_3d_with_cloud(float(u), float(v), d, cloud,
                                           CX, CY, F))
    np.testing.assert_allclose(out, depth_pt, rtol=1e-6)


def test_lift_with_cloud_discrepancy_uses_cloud_point():
    from leafgrasp_tpu.geometry.lift3d import lift_to_3d_with_cloud
    h, w = 8, 10
    u, v, d = 4, 3, 0.5
    depth_pt = np.asarray(lift_to_3d(float(u), float(v), d, CX, CY, F))
    cloud = np.zeros((h, w, 3), np.float32)
    cloud[v, u] = depth_pt + np.array([0.02, 0.0, 0.0])  # 2cm > 1cm
    out = np.asarray(lift_to_3d_with_cloud(float(u), float(v), d, cloud,
                                           CX, CY, F))
    np.testing.assert_allclose(out, cloud[v, u], rtol=1e-6)


def test_lift_with_cloud_nan_entry_falls_back_to_depth():
    """NaN cloud returns (invalid stereo) never trigger the swap."""
    from leafgrasp_tpu.geometry.lift3d import lift_to_3d_with_cloud
    u, v, d = 2, 1, 0.7
    depth_pt = np.asarray(lift_to_3d(float(u), float(v), d, CX, CY, F))
    cloud = np.full((4, 6, 3), np.nan, np.float32)
    out = np.asarray(lift_to_3d_with_cloud(float(u), float(v), d, cloud,
                                           CX, CY, F))
    np.testing.assert_allclose(out, depth_pt, rtol=1e-6)


def test_pipeline_cloud_cross_check():
    """select_grasp(points=...) swaps in the cloud point on discrepancy."""
    from leafgrasp_tpu.config import PipelineConfig, FrameConfig, \
        LeafSelectionConfig
    from leafgrasp_tpu.pipeline.frame import select_grasp
    cfg = PipelineConfig(frame=FRAME, leaf=CFG)
    mask, depth = _scene(3)
    base = select_grasp(mask, depth, CX, CY, F, cfg=cfg)
    assert bool(base.found)
    # cloud disagreeing everywhere by 5cm in X
    h, w = mask.shape
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    z = depth
    cloud = np.stack([z * (xs - CX) / F + 0.05, z * (ys - CY) / F, z],
                     axis=-1).astype(np.float32)
    res = select_grasp(mask, depth, CX, CY, F, cfg=cfg, points=cloud)
    assert np.asarray(res.grasp_uv).tolist() == \
        np.asarray(base.grasp_uv).tolist()
    np.testing.assert_allclose(np.asarray(res.grasp_xyz)[0],
                               np.asarray(base.grasp_xyz)[0] + 0.05,
                               atol=1e-5)
