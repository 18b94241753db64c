"""Single-frame spatial parallelism for the FULL grasp pipeline.

``parallel/spatial.py`` shards the EDT/morphology primitives; this module
shards the entire ``select_grasp`` program -- leaf Pareto selection,
all 7 score maps, spaced top-k, batched CNN patches, fusion, 3D lift and
pre-grasp -- with image ROWS partitioned over a mesh axis, so one
frame's latency scales with chips (SURVEY.md section 5.7: the
reference's 1080x1440 per-pixel fusion is this project's analogue of
sequence/context parallelism).

Decomposition (all cross-device movement is mesh collectives over ICI):

* vertical EDT pass 1      -- two-level associative scan: local scans +
  ``all_gather`` of one boundary summary row per shard;
* EDT min-plus pass 2      -- row-local (embarrassingly parallel), with
  the full-frame sentinel and per-shard adaptive bands;
* morphology / convs       -- halo exchange (``ppermute``) of <= r
  boundary rows, then the unmodified single-device op on the padded
  block (frame-edge shards synthesize the op's own border rule, so the
  cropped core is bit-identical to the unsharded op);
* per-leaf statistics      -- local scatter-free partial sums + ``psum``;
  medians bisect with a psum'd count per round;
* global argmin/argmax     -- local extremum + gathered (value, index)
  combine with numpy's row-major tie-break;
* spaced top-k             -- k rounds of {local argmax, global combine,
  local Chebyshev suppression};
* CNN patches              -- each candidate's 32x32 window is extracted
  by its owner shard from a halo-padded block and ``psum``-merged;
* pre-grasp window checks  -- every window cell is owned by exactly one
  shard; local ANY + summed-int psum reproduces the full-frame check.

Float caveat: psum reduction order differs from a single-device sum, so
per-leaf float statistics can differ in the last ulps vs the unsharded
pipeline; integer decisions (leaf id, grasp pixel) are tested equal on
golden scenes and float outputs agree to ~1e-5 relative.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from leafgrasp_tpu.config import PipelineConfig, DEFAULT_CONFIG
from leafgrasp_tpu.geometry.grasp_scorer import (
    GraspScores, sdf_score_map, approach_score_map, isolation_score_map,
    accessibility_score_map, stem_penalty_map, combine_traditional,
    valid_region_mask)
from leafgrasp_tpu.geometry.leaf_scorer import leaf_choice_from_stats
from leafgrasp_tpu.geometry.lift3d import lift_to_3d, pre_grasp_point
from leafgrasp_tpu.geometry.patches import normalize_patch_batch
from leafgrasp_tpu.models.grasp_cnn import ml_scores_from_logits
from leafgrasp_tpu.ops.components import leaf_stats
from leafgrasp_tpu.ops.conv import flatness_from_depth
from leafgrasp_tpu.ops.edt import squared_edt
from leafgrasp_tpu.ops.morphology import (elliptical_kernel, _row_runs,
                                          _directional_hdist)
from leafgrasp_tpu.ops.pca import (mask_orientation, _mask_row_runs,
                                   _largest_component_extremes_from_runs,
                                   _rect_from_row_extremes)
from leafgrasp_tpu.ops.topk import Candidates
from leafgrasp_tpu.pipeline.frame import FrameResult
from leafgrasp_tpu.pipeline.fusion import fuse_candidates

__all__ = ["make_sharded_frame_fn"]


# ---------------------------------------------------------------------------
# shard-local helpers (used inside a shard_map body; `ax` is the mesh axis)
# ---------------------------------------------------------------------------

def _halo_pad(local: jnp.ndarray, top: int, bot: int, ax: str,
              n_shards: int, mode: str = "constant", value=0):
    """Pad a (..., rows, W) local block with `top`/`bot` boundary rows
    from the neighboring shards (ppermute); frame-edge shards synthesize
    the requested border rule from their own rows:

    * "constant": `value`
    * "reflect":  np.pad reflect (row -1 == row 1), valid for halo <= rows
    * "edge":     replicate row 0 / row -1
    """
    rows = local.shape[-2]
    assert top <= rows and bot <= rows, "halo exceeds shard rows"
    shard = jax.lax.axis_index(ax)
    parts = []

    if top > 0:
        # receive the bottom `top` rows of the shard ABOVE
        strip = local[..., rows - top:, :]
        recv = jax.lax.ppermute(strip, ax, [(s, s + 1)
                                            for s in range(n_shards - 1)])
        if mode == "constant":
            fill = jnp.full_like(recv, value)
        elif mode == "reflect":
            fill = local[..., 1:top + 1, :][..., ::-1, :]
        elif mode == "edge":
            fill = jnp.broadcast_to(local[..., :1, :], recv.shape)
        else:
            raise ValueError(mode)
        parts.append(jnp.where(shard == 0, fill, recv))
    parts.append(local)
    if bot > 0:
        strip = local[..., :bot, :]
        recv = jax.lax.ppermute(strip, ax, [(s, s - 1)
                                            for s in range(1, n_shards)])
        if mode == "constant":
            fill = jnp.full_like(recv, value)
        elif mode == "reflect":
            fill = local[..., rows - bot - 1:rows - 1, :][..., ::-1, :]
        elif mode == "edge":
            fill = jnp.broadcast_to(local[..., -1:, :], recv.shape)
        else:
            raise ValueError(mode)
        parts.append(jnp.where(shard == n_shards - 1, fill, recv))
    return jnp.concatenate(parts, axis=-2)


def _nearest_rows_sharded(seeds: jnp.ndarray, ax: str, n_shards: int,
                          full_h: int, full_w: int) -> jnp.ndarray:
    """Vertical 1D nearest-seed distance over row-sharded (..., rows, W)
    seeds via the two-level associative scan (one (W,) boundary summary
    per shard over ICI). Sentinel matches ``nearest_seed_dist_1d``:
    full_h + full_w."""
    rows = seeds.shape[-2]
    shard = jax.lax.axis_index(ax)
    row0 = shard * rows
    big = jnp.int32(2 ** 30)
    sentinel = jnp.int32(full_h + full_w)

    rows_axis = seeds.ndim - 2
    idx = row0 + jax.lax.broadcasted_iota(jnp.int32, seeds.shape, rows_axis)
    before = jnp.where(seeds, idx, jnp.int32(-1))
    before = jax.lax.associative_scan(jnp.maximum, before, axis=rows_axis)
    after = jnp.where(seeds, idx, big)
    after = jax.lax.associative_scan(jnp.minimum, after, axis=rows_axis,
                                     reverse=True)

    last_above = before[..., -1, :]                 # (..., W)
    first_below = after[..., 0, :]
    all_last = jax.lax.all_gather(last_above, ax)   # (S, ..., W)
    all_first = jax.lax.all_gather(first_below, ax)

    sid = jax.lax.broadcasted_iota(jnp.int32, all_last.shape, 0)
    carry_above = jnp.max(jnp.where(sid < shard, all_last, -1), axis=0)
    carry_below = jnp.min(jnp.where(sid > shard, all_first, big), axis=0)

    before = jnp.maximum(before, carry_above[..., None, :])
    after = jnp.minimum(after, carry_below[..., None, :])

    d_above = jnp.where(before >= 0, idx - before, sentinel)
    d_below = jnp.where(after < big, after - idx, sentinel)
    return jnp.minimum(d_above, d_below)


def _edt_batch_sharded(seeds: jnp.ndarray, ax: str, n_shards: int,
                       full_h: int, full_w: int) -> jnp.ndarray:
    """Exact L2 EDT over row-sharded (C, rows, W) seed masks: two-level
    vertical pass 1 + row-local adaptive banded pass 2 with the
    full-frame sentinel."""
    g = _nearest_rows_sharded(seeds, ax, n_shards, full_h, full_w) \
        .astype(jnp.float32)
    g2 = g * g
    big = float((full_h + full_w) * (full_h + full_w))
    outs = [jnp.sqrt(squared_edt(seeds[c], g2=g2[c], big=big))
            for c in range(seeds.shape[0])]
    return jnp.stack(outs)


def _dilate_sharded(mask: jnp.ndarray, kernel, ax: str,
                    n_shards: int) -> jnp.ndarray:
    """Row-sharded binary dilation: per-row directional scans are local;
    the vertical SE reach is satisfied by a halo of hdist rows (OOB rows
    at the frame edge fill with the background sentinel, matching
    cv2.dilate's zero border)."""
    m = jnp.asarray(mask, bool)
    rows, w = m.shape
    runs = _row_runs(np.asarray(kernel))
    max_dy = max(abs(r[0]) for r in runs)
    d_left, d_right = _directional_hdist(m)
    big = jnp.int32(rows + w + 2 * max_dy)
    dl = _halo_pad(d_left, max_dy, max_dy, ax, n_shards, "constant", big)
    dr = _halo_pad(d_right, max_dy, max_dy, ax, n_shards, "constant", big)
    out = jnp.zeros((rows, w), bool)
    for dy_src, reach_left, reach_right in runs:
        sl = slice(max_dy + dy_src, max_dy + dy_src + rows)
        out = out | (dl[sl] <= reach_left) | (dr[sl] <= reach_right)
    return out


def _conv_halo(local: jnp.ndarray, radius: int, fn, ax: str,
               n_shards: int, mode: str = "reflect") -> jnp.ndarray:
    """Apply a convolution chain `fn` of total receptive radius `radius`
    to a halo-padded block and crop the exact core: the padded block's
    own border handling only contaminates rows that are cropped."""
    padded = _halo_pad(local, radius, radius, ax, n_shards, mode)
    return fn(padded)[radius:-radius]


def _global_extremum(val, flat_idx, ax: str, mode: str):
    """Combine per-shard (extremum value, global flat index) pairs with
    numpy tie-breaking (first row-major index wins)."""
    vals = jax.lax.all_gather(val, ax)         # (S,)
    idxs = jax.lax.all_gather(flat_idx, ax)    # (S,)
    if mode == "min":
        best_val = jnp.min(vals)
    else:
        best_val = jnp.max(vals)
    big = jnp.int64(2 ** 62) if idxs.dtype == jnp.int64 else jnp.int32(2 ** 30)
    best_idx = jnp.min(jnp.where(vals == best_val, idxs, big))
    return best_val, best_idx


# ---------------------------------------------------------------------------
# the sharded frame program
# ---------------------------------------------------------------------------

def make_sharded_frame_fn(mesh: Mesh, cfg: PipelineConfig = DEFAULT_CONFIG,
                          with_cnn: bool = False, axis: str = "data",
                          use_pallas: bool | None = None):
    """Build ``fn(mask_ids, depth, cx, cy, f[, cnn_variables])`` with the
    frame's rows sharded over ``mesh.shape[axis]`` devices.

    use_pallas routes the per-pixel combination through the fused Pallas
    scoring kernel on each shard's row block (None = on for TPU
    backends, off elsewhere -- same default as make_frame_fn).

    Semantics match ``pipeline.frame.select_grasp`` (CV-only when
    ``with_cnn=False``) with these documented bounds:

    * frame height must divide the axis size; each shard must hold at
      least max(isolation kernel, stem kernel)//2 and patch//2 rows;
    * ``isolation_context='union_half'`` is not supported here (the
      half-res pooling does not row-shard cleanly); 'union',
      'reference_self' and CV-only skip are;
    * float fields differ from the unsharded program only by psum
      reduction order.
    """
    if use_pallas is None:
        use_pallas = jax.default_backend() in ("tpu", "axon")
    if with_cnn and cfg.fusion.patch_normalization == "train_stats":
        # the sharded CNN path hard-codes the reference per-patch
        # min-max; silently serving it under a train_stats config would
        # reintroduce the train/serve mismatch the mode exists to fix
        raise NotImplementedError(
            "patch_normalization='train_stats' is not plumbed through "
            "the row-sharded frame fn; use the single-device frame fn "
            "or patch_normalization='reference_minmax'")
    n_shards = mesh.shape[axis]
    h, w = cfg.frame.height, cfg.frame.width
    if h % n_shards:
        raise ValueError(f"frame height {h} must divide {n_shards} shards")
    rows = h // n_shards
    iso_mode = cfg.grasp.isolation_context
    if iso_mode == "union_half" and with_cnn:
        # isolation feeds only the CNN patch channels; CV-only mode
        # skips it entirely, so union_half configs still serve sharded
        raise NotImplementedError(
            "union_half isolation does not row-shard; use 'union'")
    min_rows = max(cfg.grasp.isolation_wide_kernel // 2,
                   cfg.grasp.stem_kernel // 2, cfg.fusion.patch_size // 2,
                   cfg.grasp.gaussian_kernel_size // 2 + 1)
    if rows < min_rows:
        raise ValueError(f"{rows} rows/shard < required halo {min_rows}")

    if with_cnn:
        from leafgrasp_tpu.models.grasp_cnn import GraspPointCNN
        model = GraspPointCNN(cfg.model)

    def body(local_ids, local_depth, cx, cy, f, variables):
        ax = axis
        shard = jax.lax.axis_index(ax)
        row0 = shard * rows

        def psum(x):
            return jax.lax.psum(x, ax)

        local_ids = jnp.asarray(local_ids, jnp.int32)
        local_depth = jnp.asarray(local_depth, jnp.float32)

        # ---- leaf selection ------------------------------------------------
        dmin = jax.lax.pmin(jnp.min(local_depth), ax)
        dmax = jax.lax.pmax(jnp.max(local_depth), ax)
        stats = leaf_stats(local_ids, local_depth, cfg.frame.max_leaves,
                           cx, cy, f, reduce_fn=psum, row0=row0,
                           frame_height=h, depth_range=(dmin, dmax))

        fg = local_ids > 0
        global_sdf = _edt_batch_sharded(fg[None], ax, n_shards, h, w)[0]
        flat = jnp.arange(rows * w, dtype=jnp.int32) + row0 * w
        lmin = jnp.argmin(global_sdf)
        lmax = jnp.argmax(global_sdf)
        sdfr = global_sdf.reshape(-1)
        _, amin = _global_extremum(sdfr[lmin], flat[lmin], ax, "min")
        _, amax = _global_extremum(sdfr[lmax], flat[lmax], ax, "max")
        min_y = (amin // w).astype(jnp.float32)
        min_x = (amin % w).astype(jnp.float32)
        max_y = (amax // w).astype(jnp.float32)
        max_x = (amax % w).astype(jnp.float32)

        sel = leaf_choice_from_stats(stats, min_x, min_y, max_x, max_y,
                                     h, w, f, cfg.leaf)

        leaf = local_ids == sel.best_leaf_id
        all_mask = local_ids > 0
        mf = leaf.astype(jnp.float32)

        # ---- score maps ----------------------------------------------------
        skip_isolation = not with_cnn
        mode = "skip" if skip_isolation else iso_mode
        if mode == "union":
            other = all_mask & ~leaf
            seeds = jnp.stack([
                ~leaf, leaf,
                _dilate_sharded(other, elliptical_kernel(
                    cfg.grasp.isolation_close_kernel), ax, n_shards),
                _dilate_sharded(other, elliptical_kernel(
                    cfg.grasp.isolation_wide_kernel), ax, n_shards),
            ])
            din, dout, dclose, dwide = _edt_batch_sharded(
                seeds, ax, n_shards, h, w)
        else:
            din, dout = _edt_batch_sharded(jnp.stack([~leaf, leaf]),
                                           ax, n_shards, h, w)
            fill = 0.0 if skip_isolation else 1.0
            dclose = jnp.full_like(din, fill)
            dwide = jnp.full_like(din, fill)

        sdf_raw = din - dout
        norm_max = jax.lax.pmax(jnp.max(jnp.abs(sdf_raw)), ax)
        if cfg.grasp.orientation_source == "min_area_rect":
            # local per-row runs (lax.top_k on the shard's block), then
            # ONE tiny all_gather -- (h, 16) int32 endpoints, ~100 KB at
            # production scale -- and the run-graph labeling + hull
            # calipers run replicated on every device: identical to the
            # single-chip exact minAreaRect (ops/pca.min_area_rect)
            xl_l, xr_l, nrow_l = _mask_row_runs(leaf, 16)
            xl_f = jax.lax.all_gather(xl_l, ax, tiled=True)
            xr_f = jax.lax.all_gather(xr_l, ax, tiled=True)
            nrow_f = jax.lax.all_gather(nrow_l, ax, tiled=True)
            xmin_r, xmax_r, valid_m = \
                _largest_component_extremes_from_runs(xl_f, xr_f,
                                                      nrow_f, w)
            orient = _rect_from_row_extremes(xmin_r, xmax_r, w, valid_m)
        else:
            orient = mask_orientation(leaf, reduce_fn=psum, row0=row0)
        close_max = jax.lax.pmax(jnp.max(dclose), ax)
        wide_max = jax.lax.pmax(jnp.max(dwide), ax)
        stem = stem_penalty_map(
            leaf, cfg.grasp, row0=row0, frame_height=h,
            dilate_fn=lambda m, k: _dilate_sharded(m, k, ax, n_shards))

        if use_pallas:
            from leafgrasp_tpu.ops.pallas_scoring import fused_score_maps
            from leafgrasp_tpu.ops.conv import (smooth_depth,
                                                sobel_gradients)
            r = cfg.grasp.gaussian_kernel_size // 2 + 1

            def grad_chain(x):
                dx, dy = sobel_gradients(
                    smooth_depth(x, cfg.grasp.gaussian_kernel_size))
                return jnp.sqrt(dx * dx + dy * dy)

            grad_mag = _conv_halo(local_depth * mf, r, grad_chain,
                                  ax, n_shards)
            (sdf, approach, flatness, isolation, distance, accessibility,
             stem_o, traditional, valid) = fused_score_maps(
                din, dout, dclose, dwide, grad_mag, mf, stem,
                cx, cy, f, orient.angle, orient.valid, cfg=cfg.grasp,
                row0=jnp.float32(row0 * 1.0), frame_height=h,
                max_sdf=norm_max, max_close=close_max,
                max_wide=wide_max)
            scores = GraspScores(
                sdf_score=sdf, approach_score=approach,
                flatness_map=flatness, isolation_map=isolation,
                distance_map=distance, accessibility_map=accessibility,
                stem_penalty=stem_o, traditional_score=traditional,
                valid_region=valid)
        else:
            sdf = sdf_score_map(leaf, cx, cy, cfg.grasp, dist_inside=din,
                                dist_outside=dout, row0=row0,
                                norm_max=norm_max, orientation=orient)
            approach = approach_score_map(leaf, cx, cy, f, row0=row0)
            flatness = _conv_halo(
                local_depth * mf, cfg.grasp.gaussian_kernel_size // 2 + 1,
                lambda x: flatness_from_depth(
                    x, cfg.grasp.flatness_gradient_scale,
                    cfg.grasp.gaussian_kernel_size),
                ax, n_shards)
            isolation = isolation_score_map(
                leaf, all_mask, cfg.grasp, dist_close=dclose,
                dist_wide=dwide, row0=row0, frame_height=h,
                close_max=close_max, wide_max=wide_max)
            distance = din * mf
            accessibility = accessibility_score_map(
                leaf, cx, cy, cfg.grasp, row0=row0, frame_height=h)

            traditional = combine_traditional(approach, sdf, flatness,
                                              accessibility, stem,
                                              cfg.grasp)
            valid = valid_region_mask(distance, leaf, stem, cfg.grasp)
            scores = GraspScores(
                sdf_score=sdf, approach_score=approach,
                flatness_map=flatness, isolation_map=isolation,
                distance_map=distance, accessibility_map=accessibility,
                stem_penalty=stem, traditional_score=traditional,
                valid_region=valid)

        # ---- spaced top-k (distributed greedy rounds) ----------------------
        k = cfg.grasp.top_k
        radius = 2 * cfg.grasp.min_candidate_distance
        masked = jnp.where(valid, traditional, 0.0)
        grows = row0 + jax.lax.broadcasted_iota(jnp.int32, (rows, w), 0)
        gcols = jax.lax.broadcasted_iota(jnp.int32, (rows, w), 1)

        def step(s, _):
            li = jnp.argmax(s)
            lval = s.reshape(-1)[li]
            gflat = flat[li]
            bval, bidx = _global_extremum(lval, gflat, ax, "max")
            y = (bidx // w).astype(jnp.int32)
            x = (bidx % w).astype(jnp.int32)
            suppress = ((jnp.abs(grows - y) <= radius)
                        & (jnp.abs(gcols - x) <= radius))
            s = jnp.where(suppress, -jnp.inf, s)
            return s, (x, y, bval)

        _, (cxs, cys, cvals) = jax.lax.scan(step, masked, None, length=k)
        cand = Candidates(x=cxs, y=cys, score=cvals,
                          accepted=jnp.isfinite(cvals))

        # ---- CNN patch scoring + fusion ------------------------------------
        if with_cnn:
            p = cfg.fusion.patch_size
            half = p // 2
            stack = jnp.concatenate([
                local_depth[None], mf[None], scores.stacked_channels()],
                axis=0)                                     # (9, rows, W)
            padded = _halo_pad(stack, half, half - 1, ax, n_shards, "edge")
            offs = jnp.arange(p, dtype=jnp.int32) - half
            own = (cys >= row0) & (cys < row0 + rows)       # (k,)
            # window rows in padded-local coords; frame-edge clipping
            # reproduces the reference's replicate padding
            pr = jnp.clip(cys[:, None] + offs[None, :], 0, h - 1) \
                - row0 + half                               # (k, p)
            pr = jnp.clip(pr, 0, rows + p - 2)
            pc = jnp.clip(cxs[:, None] + offs[None, :], 0, w - 1)
            raw = padded[:, pr[:, :, None], pc[:, None, :]]  # (9, k, p, p)
            raw = jnp.where(own[None, :, None, None], raw, 0.0)
            patches = psum(raw.transpose(1, 0, 2, 3))        # (k, 9, p, p)
            feats = normalize_patch_batch(patches)
            logits = model.apply(variables, feats, train=False)
            ml = ml_scores_from_logits(logits, cfg.fusion.score_spread_scale)
            fusion = fuse_candidates(cand.score, ml, cand.accepted, True,
                                     cfg.fusion)
        else:
            fusion = fuse_candidates(cand.score,
                                     jnp.zeros_like(cand.score),
                                     cand.accepted, False, cfg.fusion)

        # ---- 3D lift + pre-grasp -------------------------------------------
        u = cand.x[fusion.best_index]
        v = cand.y[fusion.best_index]
        own_v = (v >= row0) & (v < row0 + rows)
        dval = psum(jnp.where(own_v,
                              local_depth[jnp.clip(v - row0, 0, rows - 1),
                                          u], 0.0))
        grasp_xyz = lift_to_3d(u.astype(jnp.float32), v.astype(jnp.float32),
                               dval, cx, cy, f)
        pre = pre_grasp_point(grasp_xyz, leaf, cx, cy, f, cfg=cfg.pregrasp,
                              row0=row0, frame_height=h, any_reduce=psum)

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

    sharded = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(), P(), P(), P()),
        out_specs=P(), check_vma=False)

    @jax.jit
    def run(mask_ids, depth, cx, cy, f, variables=None):
        return sharded(jnp.asarray(mask_ids, jnp.int32),
                       jnp.asarray(depth, jnp.float32),
                       jnp.asarray(cx, jnp.float32),
                       jnp.asarray(cy, jnp.float32),
                       jnp.asarray(f, jnp.float32), variables)

    def fn(mask_ids, depth, cx, cy, f, variables=None):
        with mesh:
            return run(mask_ids, depth, cx, cy, f, variables)

    return fn
