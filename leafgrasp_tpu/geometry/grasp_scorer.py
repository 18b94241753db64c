"""Per-pixel grasp scoring: the 7 score maps + combined traditional score.

TPU-native rebuild of ``GraspPointSelector._calculate_all_scores``
(reference grasp_point_selector.py:256-288,502-701).  All maps are
computed in one jitted pass over the full frame; the fused Pallas kernel
in ``ops/pallas_scoring.py`` accelerates the elementwise combination and
this module is its oracle.

Documented divergences (see SURVEY.md section 7 hard parts):

* ``cv2.distanceTransform(.., DIST_L2, 3|5)`` chamfer approximations are
  replaced by the exact EDT (strictly more accurate; downstream uses are
  a >20px threshold, a ridge Gaussian, and max-normalized fields);
* the leaf major-axis direction defaults to the reference-faithful
  exact ``min_area_rect`` (run-graph connected components + rotating
  calipers, ops/pca.py -- matches ``cv2.minAreaRect`` of the largest
  contour; config.py ``orientation_source="min_area_rect"``); the
  cheaper image-moment PCA remains selectable and agrees on elongated
  blobs (divergence quantified in PARITY.json orientation_probe);
* the reference treats an absent orientation (no contour) as
  alignment == 1 everywhere; PCA on an empty mask is flagged invalid and
  handled the same way.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from leafgrasp_tpu.config import GraspScoringConfig
from leafgrasp_tpu.ops.edt import edt
from leafgrasp_tpu.ops.morphology import elliptical_kernel, dilate
from leafgrasp_tpu.ops.conv import flatness_from_depth
from leafgrasp_tpu.ops.pca import mask_orientation

__all__ = ["GraspScores", "compute_grasp_scores", "valid_grasp_region"]

# Channel order consumed by the CNN (grasp_point_selector.py:95-99).
SCORE_CHANNELS = ("sdf_score", "approach_score", "flatness_map",
                  "isolation_map", "distance_map", "accessibility_map",
                  "stem_penalty")


class GraspScores(NamedTuple):
    sdf_score: jnp.ndarray
    approach_score: jnp.ndarray
    flatness_map: jnp.ndarray
    isolation_map: jnp.ndarray
    distance_map: jnp.ndarray
    accessibility_map: jnp.ndarray
    stem_penalty: jnp.ndarray
    traditional_score: jnp.ndarray
    valid_region: jnp.ndarray    # bool

    def stacked_channels(self) -> jnp.ndarray:
        """(7, H, W) stack in CNN channel order."""
        return jnp.stack([getattr(self, name) for name in SCORE_CHANNELS])


def _pixel_grids(h: int, w: int, row0=0):
    """Pixel coordinate grids; ``row0`` offsets rows to FRAME coordinates
    for row-sharded callers working on a local row block."""
    ys = row0 + jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    return ys, xs


def sdf_score_map(leaf_mask: jnp.ndarray, camera_cx, camera_cy,
                  cfg: GraspScoringConfig, dist_inside=None,
                  dist_outside=None, row0=0, norm_max=None,
                  orientation=None) -> jnp.ndarray:
    """Ridge-SDF + camera-alignment score
    (grasp_point_selector.py:526-567).

    row0/norm_max/orientation: row-sharded callers pass the shard's
    frame-row offset, the globally-reduced max|sdf|, and a
    globally-reduced Orientation (defaults reproduce the single-device
    computation).
    """
    m = jnp.asarray(leaf_mask, bool)
    h, w = m.shape
    if dist_inside is None:
        dist_inside = edt(~m)    # cv2.distanceTransform(mask)
    if dist_outside is None:
        dist_outside = edt(m)    # cv2.distanceTransform(1 - mask)
    sdf = dist_inside - dist_outside

    opt = cfg.optimal_edge_distance
    interior_penalty = jnp.exp(-((dist_inside - opt) ** 2) / (2.0 * opt * opt))

    if norm_max is None:
        norm_max = jnp.max(jnp.abs(sdf))
    sdf = sdf / jnp.maximum(norm_max, 1e-30)

    ys, xs = _pixel_grids(h, w, row0)
    vx = xs - camera_cx
    vy = ys - camera_cy
    norm = jnp.sqrt(vx * vx + vy * vy)
    norm = jnp.where(norm == 0, 1.0, norm)
    vx, vy = vx / norm, vy / norm

    o = mask_orientation(m) if orientation is None else orientation
    # alignment = |cross((vx,vy), (cos a, sin a))| = |vx sin a - vy cos a|
    alignment = jnp.abs(vx * jnp.sin(o.angle) - vy * jnp.cos(o.angle))
    alignment = jnp.where(o.valid, alignment, jnp.ones_like(alignment))

    final = (cfg.sdf_interior_weight * interior_penalty
             + cfg.sdf_alignment_weight * alignment
             + cfg.sdf_raw_weight * sdf) * m
    return final


def approach_score_map(leaf_mask: jnp.ndarray, camera_cx, camera_cy,
                       f_norm, row0=0) -> jnp.ndarray:
    """|dot(unit ray, z)| = f / ||(x-cx, y-cy, f)||
    (grasp_point_selector.py:569-593)."""
    m = jnp.asarray(leaf_mask, jnp.float32)
    h, w = m.shape
    ys, xs = _pixel_grids(h, w, row0)
    norm = jnp.sqrt((xs - camera_cx) ** 2 + (ys - camera_cy) ** 2
                    + f_norm * f_norm)
    return (f_norm / norm) * m


def isolation_score_map(leaf_mask: jnp.ndarray, all_mask: jnp.ndarray,
                        cfg: GraspScoringConfig, dist_close=None,
                        dist_wide=None, row0=0,
                        frame_height: int | None = None,
                        close_max=None, wide_max=None) -> jnp.ndarray:
    """Distance-from-interference blend x top-down height preference
    (grasp_point_selector.py:595-633)."""
    m = jnp.asarray(leaf_mask, bool)
    h, w = m.shape
    fh = h if frame_height is None else frame_height
    other = jnp.asarray(all_mask, bool) & ~m

    if dist_close is None:
        dist_close = edt(dilate(other,
                                elliptical_kernel(
                                    cfg.isolation_close_kernel)))
    if dist_wide is None:
        dist_wide = edt(dilate(other,
                               elliptical_kernel(
                                   cfg.isolation_wide_kernel)))
    if close_max is None:
        close_max = jnp.max(dist_close)
    if wide_max is None:
        wide_max = jnp.max(dist_wide)

    score = (cfg.isolation_close_weight * dist_close / (close_max + 1e-6)
             + cfg.isolation_wide_weight * dist_wide / (wide_max + 1e-6))

    # np.linspace(1.0, 0.2, h) row preference (grasp_point_selector.py:623)
    rows = row0 + jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    pref = cfg.height_pref_top + (cfg.height_pref_bottom
                                  - cfg.height_pref_top) * rows / (fh - 1)
    return score * pref * m


def accessibility_score_map(leaf_mask: jnp.ndarray, camera_cx, camera_cy,
                            cfg: GraspScoringConfig, row0=0,
                            frame_height: int | None = None) -> jnp.ndarray:
    """0.7 * (1 - r/max) + 0.3 * cos(theta), masked
    (grasp_point_selector.py:502-524)."""
    m = jnp.asarray(leaf_mask, jnp.float32)
    h, w = m.shape
    fh = h if frame_height is None else frame_height
    ys, xs = _pixel_grids(h, w, row0)
    dx = xs - camera_cx
    dy = ys - camera_cy
    dist = jnp.sqrt(dx * dx + dy * dy)
    max_dist = jnp.sqrt(jnp.float32(w * w + fh * fh))
    access = 1.0 - dist / max_dist
    forward = jnp.cos(jnp.arctan2(dy, dx))
    return (cfg.access_distance_weight * access
            + cfg.access_direction_weight * forward) * m


def tip_penalty_map(leaf_mask: jnp.ndarray,
                    kernel_size: int = 15) -> jnp.ndarray:
    """Tip-proximity penalty used by the data-collection (teacher)
    selector (grasp_point_selector_bkp / grasp_point_selector.py:703-716):
    1 at dilated tip bands, decaying with distance from them."""
    from leafgrasp_tpu.ops.morphology import erode
    from leafgrasp_tpu.ops.edt import edt
    m = jnp.asarray(leaf_mask, bool)
    k = elliptical_kernel(kernel_size)
    tips = m & ~erode(m, k)
    tip_area = dilate(tips, k) & m
    dist_from_tips = edt(tip_area)
    penalty = 1.0 - dist_from_tips / (jnp.max(dist_from_tips) + 1e-6)
    return penalty * m.astype(jnp.float32)


def stem_penalty_map(leaf_mask: jnp.ndarray,
                     cfg: GraspScoringConfig, row0=0,
                     frame_height: int | None = None,
                     dilate_fn=None) -> jnp.ndarray:
    """Dilated bottom-third intersection (grasp_point_selector.py:688-701).

    dilate_fn: override for row-sharded callers (halo-exchanging
    dilation); defaults to the single-device ``dilate``.
    """
    m = jnp.asarray(leaf_mask, bool)
    h, w = m.shape
    fh = h if frame_height is None else frame_height
    if dilate_fn is None:
        dilate_fn = dilate
    bottom_third = fh // 3
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (h, w), 0)
    bottom = rows >= (fh - bottom_third)
    masked_bottom = m & bottom
    stem = dilate_fn(masked_bottom, elliptical_kernel(cfg.stem_kernel)) & m
    return stem.astype(jnp.float32)


def combine_traditional(approach, sdf, flatness, accessibility, stem,
                        cfg: GraspScoringConfig) -> jnp.ndarray:
    """Weighted traditional score (grasp_point_selector.py:272-277 --
    the CODE weights, not the README's)."""
    return (cfg.approach_weight * approach
            + cfg.sdf_weight * sdf
            + cfg.flatness_weight * flatness
            + cfg.accessibility_weight * accessibility) * (1.0 - stem)


def valid_region_mask(distance, leaf_mask, stem,
                      cfg: GraspScoringConfig) -> jnp.ndarray:
    """Pixels eligible as candidates (grasp_point_selector.py:282-288)."""
    return (distance > cfg.min_edge_distance) & jnp.asarray(leaf_mask, bool) \
        & (stem < cfg.stem_penalty_cutoff)


@functools.partial(jax.jit, static_argnames=("cfg", "use_pallas",
                                              "skip_isolation"))
def compute_grasp_scores(leaf_mask: jnp.ndarray, all_mask: jnp.ndarray,
                         depth: jnp.ndarray, camera_cx, camera_cy, f_norm,
                         cfg: GraspScoringConfig = GraspScoringConfig(),
                         use_pallas: bool = False,
                         skip_isolation: bool = False) -> GraspScores:
    """All score maps + traditional score + valid region for one leaf.

    leaf_mask : (H, W) bool -- the selected leaf
    all_mask  : (H, W) bool -- union of all leaves (for isolation).
        NOTE: the reference's production node passes only the single-leaf
        mask here, making its other-leaf isolation term degenerate
        (leaf_grasp_node_v3.py:117-119 + grasp_point_selector.py:605-607);
        passing the true union restores the intended behavior.
    depth     : (H, W) float32 metric depth
    use_pallas: route the per-pixel combination through the fused Pallas
        kernel (ops/pallas_scoring.py); False = the oracle composition.
    """
    m = jnp.asarray(leaf_mask, bool)
    mf = m.astype(jnp.float32)
    depth = jnp.asarray(depth, jnp.float32)

    # The distance fields share ONE batched pass-1 scan; the
    # inside-distance is shared by sdf_score and distance_map (the
    # reference recomputes it, grasp_point_selector.py:266+529).
    #
    # The WIDE fields are never materialized in full: every consumer of
    # dist_outside / the interference fields is masked by the leaf
    # (grasp_point_selector.py:538,563,611-628 all multiply by the
    # mask; CNN patches stay >= min_edge_distance - patch/2 = 4 px
    # inside it), so only their full-frame MAXES (the normalizers) are
    # needed globally -- computed exactly by the batched sampled-
    # envelope edt_max_argmax -- while the per-leaf fields evaluate
    # pass-2 only on the leaf's bbox window (squared_edt_window), whose
    # cost is set by the LEAF size, not by how far the interference
    # is. The interference pass-1 comes from dilated_vertical_dist,
    # skipping both dilations and their own vertical scans.
    from leafgrasp_tpu.ops.edt import (directional_seed_dist_1d,
                                       edt_batch, edt_max_argmax,
                                       edt_max_argmax_batch,
                                       nearest_seed_dist_1d, squared_edt,
                                       squared_edt_window,
                                       squared_edt_window_src)
    from leafgrasp_tpu.ops.morphology import dilated_vertical_dist_multi
    iso_mode = "skip" if skip_isolation else cfg.isolation_context
    env_kw = {}
    if cfg.envelope_stride:
        env_kw["stride"] = cfg.envelope_stride
    if cfg.envelope_k:
        env_kw["k"] = cfg.envelope_k

    def _batched_g2(seeds):
        g = nearest_seed_dist_1d(seeds, axis=1).astype(jnp.float32)
        return g * g

    fh, fw = m.shape
    rows_any = jnp.any(m, axis=1)
    cols_any = jnp.any(m, axis=0)
    r_lo = jnp.argmax(rows_any).astype(jnp.int32)
    r_hi = jnp.int32(fh - 1) - jnp.argmax(rows_any[::-1]).astype(jnp.int32)
    c_lo = jnp.argmax(cols_any).astype(jnp.int32)
    c_hi = jnp.int32(fw - 1) - jnp.argmax(cols_any[::-1]).astype(jnp.int32)
    any_m = jnp.any(m)
    # smallest-first window ladder; duplicates after frame clamping drop
    sizes = sorted({(min(s, fh), min(s, fw))
                    for s in cfg.leaf_windows if s > 0})

    # upper bound on the leaf-interior distance: any leaf pixel is
    # within half the bbox's smaller side of the exterior
    din_bound = 0.5 * jnp.minimum(r_hi - r_lo + 1,
                                  c_hi - c_lo + 1).astype(jnp.float32) + 2.0

    def _leaf_fields(g2s, field_bound=None):
        """sqrt-EDTs from a (C, H, W) pass-1 stack, exact on the leaf:
        ONE batched bbox-window pass-2 in the smallest ladder window
        that contains the leaf (zeros outside the window), else the
        adaptive banded sweep sized to the leaf (exact on the mask).

        field_bound: dynamic upper bound on every channel's value over
        the leaf; with ``cfg.leaf_window_src_pad > 0`` and
        field_bound < pad the pass-2 sources shrink to +-pad columns
        around the window (provably exact; squared_edt_window_src)."""
        pad = cfg.leaf_window_src_pad

        def windowed(hq, wq):
            def full(_):
                r0 = jnp.clip(r_lo, 0, fh - hq)
                c0 = jnp.clip(c_lo, 0, fw - wq)
                blk = jnp.sqrt(squared_edt_window(g2s, r0, c0, hq, wq))
                return jax.lax.dynamic_update_slice(
                    jnp.zeros(g2s.shape, jnp.float32), blk,
                    (jnp.int32(0), r0, c0))

            if not pad or field_bound is None or wq + 2 * pad >= fw:
                return full

            def banded_src(_):
                r0 = jnp.clip(r_lo, 0, fh - hq)
                c0 = jnp.clip(c_lo, 0, fw - wq)
                blk = jnp.sqrt(squared_edt_window_src(
                    g2s, r0, c0, hq, wq, pad))
                return jax.lax.dynamic_update_slice(
                    jnp.zeros(g2s.shape, jnp.float32), blk,
                    (jnp.int32(0), r0, c0))

            def run(_):
                return jax.lax.cond(field_bound < pad, banded_src,
                                    full, None)
            return run

        def banded(_):
            return jnp.stack([
                jnp.sqrt(squared_edt(None, g2=g2s[i], band_mask=m))
                for i in range(g2s.shape[0])])

        out = banded
        for hq, wq in reversed(sizes):
            fits = any_m & (r_hi - r_lo < hq) & (c_hi - c_lo < wq)
            out = functools.partial(
                jax.lax.cond, fits, windowed(hq, wq), out)
        return out(None)

    if iso_mode == "union":
        other = jnp.asarray(all_mask, bool) & ~m
        # ONE batched directional scan serves all three pass-1 seeds:
        # channels 0/1 (~m, m) take the directional min (== nearest),
        # channel 2 (other) keeps both directions for the dilation
        # clamp identity. Associative-scan cost is depth-bound, so the
        # 3-channel scan costs ~the same as the 2-channel one it
        # replaces plus the separate (H, W) scan it absorbs.
        d3_up, d3_dn = directional_seed_dist_1d(
            jnp.stack([~m, m, other]), axis=1)
        g = jnp.minimum(d3_up[:2], d3_dn[:2]).astype(jnp.float32)
        g2 = g * g
        d_up, d_dn = d3_up[2], d3_dn[2]
        gc, gw = (x.astype(jnp.float32) for x in dilated_vertical_dist_multi(
            d_up, d_dn, (elliptical_kernel(cfg.isolation_close_kernel),
                         elliptical_kernel(cfg.isolation_wide_kernel)),
            impl=cfg.dvd_impl))
        g2_close, g2_wide = gc * gc, gw * gw
        no_other = ~jnp.any(other)
        maxs, _ = edt_max_argmax_batch(
            jnp.stack([g2[1], g2_close, g2_wide]),
            constant_field=jnp.stack([~jnp.any(m), no_other, no_other]),
            **env_kw)
        max_dout, close_max, wide_max = maxs[0], maxs[1], maxs[2]
        din, dclose, dwide = _leaf_fields(
            jnp.stack([g2[0], g2_close, g2_wide]),
            field_bound=jnp.maximum(din_bound,
                                    jnp.maximum(close_max, wide_max)))
    elif iso_mode == "union_half":
        other = jnp.asarray(all_mask, bool) & ~m
        h, w = m.shape
        g2 = _batched_g2(jnp.stack([~m, m]))
        din = _leaf_fields(g2[:1], field_bound=din_bound)[0]
        max_dout, _ = edt_max_argmax(m, g2=g2[1], **env_kw)

        def half_edt(inter):
            # 2x2 any-pool -> half-res EDT -> nearest upsample, px scale x2
            hh, wh = h // 2, w // 2
            pooled = inter[:hh * 2, :wh * 2].reshape(hh, 2, wh, 2).any(
                axis=(1, 3))
            d = edt_batch(pooled[None])[0] * 2.0
            up = jnp.repeat(jnp.repeat(d, 2, axis=0), 2, axis=1)
            return jnp.pad(up, ((0, h - hh * 2), (0, w - wh * 2)),
                           mode="edge")

        dclose = half_edt(dilate(other, elliptical_kernel(
            cfg.isolation_close_kernel)))
        dwide = half_edt(dilate(other, elliptical_kernel(
            cfg.isolation_wide_kernel)))
        close_max = jnp.max(dclose)
        wide_max = jnp.max(dwide)
    else:
        g2 = _batched_g2(jnp.stack([~m, m]))
        din = _leaf_fields(g2[:1], field_bound=din_bound)[0]
        max_dout, _ = edt_max_argmax(m, g2=g2[1], **env_kw)
        # reference_self: empty interference -> cv2 FLT_MAX field ->
        # normalized score 1 everywhere; skip: zero field -> score 0
        fill = 0.0 if skip_isolation else 1.0
        dclose = jnp.full_like(din, fill)
        dwide = jnp.full_like(din, fill)
        close_max = jnp.float32(fill)
        wide_max = jnp.float32(fill)

    # max|sdf| = max(din inside, dist_outside outside): the two fields
    # are disjointly supported, so the normalizer needs only max(dout)
    # as a scalar -- dist_outside is 0 on every consumed (leaf) pixel.
    sdf_norm = jnp.maximum(jnp.max(din), max_dout)
    zeros_dout = jnp.zeros_like(din)

    # sdf-alignment angle source (grasp_point_selector.py:553-558): the
    # reference uses cv2.minAreaRect of the largest contour; "pca" is
    # the cheaper moment estimator (divergence measured in PARITY.json)
    if cfg.orientation_source == "min_area_rect":
        from leafgrasp_tpu.ops.pca import min_area_rect
        o = min_area_rect(m)
    else:
        o = mask_orientation(m)

    if use_pallas:
        from leafgrasp_tpu.ops.pallas_scoring import fused_score_maps
        from leafgrasp_tpu.ops.conv import smooth_depth, sobel_gradients
        smoothed = smooth_depth(depth * mf, cfg.gaussian_kernel_size)
        dx, dy = sobel_gradients(smoothed)
        grad_mag = jnp.sqrt(dx * dx + dy * dy)
        stem = stem_penalty_map(m, cfg)
        (sdf, approach, flatness, isolation, distance, accessibility,
         stem_o, traditional, valid) = fused_score_maps(
            din, zeros_dout, dclose, dwide, grad_mag, mf, stem,
            camera_cx, camera_cy, f_norm, o.angle, o.valid, cfg=cfg,
            max_sdf=sdf_norm, max_close=close_max, max_wide=wide_max)
        return GraspScores(
            sdf_score=sdf, approach_score=approach, flatness_map=flatness,
            isolation_map=isolation, distance_map=distance,
            accessibility_map=accessibility, stem_penalty=stem_o,
            traditional_score=traditional, valid_region=valid)

    sdf = sdf_score_map(m, camera_cx, camera_cy, cfg,
                        dist_inside=din, dist_outside=zeros_dout,
                        norm_max=sdf_norm, orientation=o)
    approach = approach_score_map(m, camera_cx, camera_cy, f_norm)
    flatness = flatness_from_depth(depth * mf, cfg.flatness_gradient_scale,
                                   cfg.gaussian_kernel_size)
    isolation = isolation_score_map(m, all_mask, cfg, dist_close=dclose,
                                    dist_wide=dwide, close_max=close_max,
                                    wide_max=wide_max)
    distance = din * mf      # cv2.distanceTransform zeroes background
    accessibility = accessibility_score_map(m, camera_cx, camera_cy, cfg)
    stem = stem_penalty_map(m, cfg)

    traditional = combine_traditional(approach, sdf, flatness,
                                      accessibility, stem, cfg)
    valid = valid_region_mask(distance, m, stem, cfg)

    return GraspScores(
        sdf_score=sdf,
        approach_score=approach,
        flatness_map=flatness,
        isolation_map=isolation,
        distance_map=distance,
        accessibility_map=accessibility,
        stem_penalty=stem,
        traditional_score=traditional,
        valid_region=valid,
    )


def valid_grasp_region(scores: GraspScores) -> jnp.ndarray:
    return scores.valid_region
