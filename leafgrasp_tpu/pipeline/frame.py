"""End-to-end frame pipeline: one jitted function from (mask, depth, P)
to (leaf id, grasp pixel, 3D grasp, pre-grasp).

This is the TPU-native equivalent of the reference's production node flow
(leaf_grasp_node_v3.py:102-158 -> leaf_scorer -> grasp_point_selector),
with zero host round-trips inside the frame: leaf selection, all score
maps, spaced top-k, batched CNN scoring, fusion and 3D lifting compile
into a single XLA program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from leafgrasp_tpu.config import PipelineConfig, DEFAULT_CONFIG
from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf, \
    LeafSelection
from leafgrasp_tpu.geometry.grasp_scorer import compute_grasp_scores
from leafgrasp_tpu.geometry.patches import assemble_cnn_inputs
from leafgrasp_tpu.geometry.lift3d import lift_to_3d, \
    lift_to_3d_with_cloud, pre_grasp_point
from leafgrasp_tpu.models.grasp_cnn import GraspPointCNN, \
    ml_scores_from_logits
from leafgrasp_tpu.ops.topk import topk_min_distance, Candidates
from leafgrasp_tpu.pipeline.fusion import fuse_candidates, FusionResult

__all__ = ["FrameResult", "select_grasp", "make_frame_fn"]


class FrameResult(NamedTuple):
    found: jnp.ndarray           # bool: a leaf was selected
    degenerate: jnp.ndarray      # bool: valid region empty -> the grasp
                                 # pixel is a zero-score tie-break (the
                                 # reference publishes garbage here too;
                                 # callers should treat it as a miss)
    leaf_id: jnp.ndarray         # int32 (0 if none)
    grasp_uv: jnp.ndarray        # (2,) int32 pixel (u, v)
    grasp_xyz: jnp.ndarray       # (3,) float32 camera-frame metres
    pre_grasp_xyz: jnp.ndarray   # (3,) float32
    ml_used: jnp.ndarray         # bool
    candidates: Candidates       # the spaced top-k set
    fusion: FusionResult
    leaf_selection: LeafSelection


@functools.partial(jax.jit,
                   static_argnames=("cfg", "cnn_apply", "use_pallas"))
def select_grasp(mask_ids: jnp.ndarray, depth: jnp.ndarray,
                 camera_cx, camera_cy, f_norm,
                 cnn_variables=None, cnn_apply=None,
                 cfg: PipelineConfig = DEFAULT_CONFIG,
                 use_pallas: bool = False,
                 points=None, cnn_norm_stats=None) -> FrameResult:
    """Full grasp selection for one frame.

    cnn_apply : optional static callable (variables, feats) -> logits.
        When None the pipeline runs CV-only, mirroring the reference's
        graceful degradation when no checkpoint exists
        (grasp_point_selector.py:43-57).
    points : optional (H, W, 3) organized point cloud; when given the
        3D grasp is cross-checked against it at the reference's 1 cm
        threshold (grasp_point_selector.py:163-180).
    cnn_norm_stats : optional stats dict -> corrected train-consistent
        patch normalization (geometry/patches.py); None -> the
        reference-faithful per-patch min-max.  NOTE: this argument, not
        ``cfg.fusion.patch_normalization``, decides the normalization
        for direct calls -- the config field is enforced one level up
        (``make_frame_fn`` requires/nulls stats to match it); passing
        stats here with a 'reference_minmax' config serves train_stats.
    """
    mask_ids = jnp.asarray(mask_ids, jnp.int32)
    depth = jnp.asarray(depth, jnp.float32)

    sel = select_optimal_leaf(mask_ids, depth, camera_cx, camera_cy,
                              f_norm, cfg=cfg.leaf, frame=cfg.frame,
                              use_pallas=use_pallas)
    leaf = mask_ids == sel.best_leaf_id
    all_mask = mask_ids > 0

    # isolation feeds only the CNN patch channels -> skip its EDT fields
    # entirely in CV-only mode
    scores = compute_grasp_scores(leaf, all_mask, depth, camera_cx,
                                  camera_cy, f_norm, cfg=cfg.grasp,
                                  use_pallas=use_pallas,
                                  skip_isolation=cnn_apply is None)
    cand = topk_min_distance(scores.traditional_score, scores.valid_region,
                             k=cfg.grasp.top_k,
                             min_distance=cfg.grasp.min_candidate_distance)

    if cnn_apply is not None:
        feats = assemble_cnn_inputs(depth, leaf, scores, cand.x, cand.y,
                                    cfg.fusion.patch_size,
                                    norm_stats=cnn_norm_stats)
        logits = cnn_apply(cnn_variables, feats)
        ml = ml_scores_from_logits(logits, cfg.fusion.score_spread_scale)
        fusion = fuse_candidates(cand.score, ml, cand.accepted, True,
                                 cfg.fusion)
    else:
        zeros = jnp.zeros_like(cand.score)
        fusion = fuse_candidates(cand.score, zeros, cand.accepted, False,
                                 cfg.fusion)

    u = cand.x[fusion.best_index]
    v = cand.y[fusion.best_index]
    if points is None:
        grasp_xyz = lift_to_3d(u.astype(jnp.float32),
                               v.astype(jnp.float32), depth[v, u],
                               camera_cx, camera_cy, f_norm)
    else:
        grasp_xyz = lift_to_3d_with_cloud(
            u.astype(jnp.float32), v.astype(jnp.float32), depth[v, u],
            points, camera_cx, camera_cy, f_norm,
            threshold_m=cfg.pregrasp.cloud_threshold_m)
    pre = pre_grasp_point(grasp_xyz, leaf, camera_cx, camera_cy, f_norm,
                          cfg=cfg.pregrasp)

    return FrameResult(
        found=sel.found & cand.accepted[0],
        degenerate=~(cand.score[0] > 0),
        leaf_id=sel.best_leaf_id,
        grasp_uv=jnp.stack([u, v]),
        grasp_xyz=grasp_xyz,
        pre_grasp_xyz=pre.point,
        ml_used=fusion.ml_used,
        candidates=cand,
        fusion=fusion,
        leaf_selection=sel,
    )


def make_frame_fn(cfg: PipelineConfig = DEFAULT_CONFIG,
                  with_cnn: bool = False,
                  use_pallas: bool | None = None,
                  norm_stats=None):
    """Build a jit-ready frame function (and CNN apply fn if requested).

    Returns ``fn(mask, depth, cx, cy, f[, cnn_variables])`` closing over
    the static config, suitable for compile-once serving.
    ``use_pallas=None`` routes the fused scoring kernel on TPU backends
    and the oracle composition elsewhere.
    ``norm_stats`` (required iff cfg.fusion.patch_normalization ==
    "train_stats"): the checkpoint's stored stats dict, closed over as
    program constants -- the corrected train-consistent serving
    normalization (geometry/patches.py).
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")

    if cfg.fusion.patch_normalization not in ("reference_minmax",
                                               "train_stats"):
        raise ValueError(
            f"unknown patch_normalization "
            f"{cfg.fusion.patch_normalization!r}; expected "
            f"'reference_minmax' or 'train_stats'")
    corrected = cfg.fusion.patch_normalization == "train_stats"
    if corrected and with_cnn and norm_stats is None:
        raise ValueError(
            "patch_normalization='train_stats' needs the checkpoint's "
            "norm_stats (load_checkpoint(...)['norm_stats'])")
    if not corrected:
        norm_stats = None

    if not with_cnn:
        def fn(mask_ids, depth, cx, cy, f):
            return select_grasp(mask_ids, depth, cx, cy, f, cfg=cfg,
                                use_pallas=use_pallas)
        return fn

    model = GraspPointCNN(cfg.model)

    def cnn_apply(variables, feats):
        return model.apply(variables, feats, train=False)

    stats_const = None if norm_stats is None else {
        k: jnp.asarray(norm_stats[k], jnp.float32)
        for k in ("depth_mean", "depth_std", "score_mean", "score_std")}

    def fn(mask_ids, depth, cx, cy, f, cnn_variables):
        return select_grasp(mask_ids, depth, cx, cy, f,
                            cnn_variables=cnn_variables,
                            cnn_apply=cnn_apply, cfg=cfg,
                            use_pallas=use_pallas,
                            cnn_norm_stats=stats_const)
    return fn
