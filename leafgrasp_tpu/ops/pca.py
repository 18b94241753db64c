"""Leaf orientation estimation, in pure JAX: exact minAreaRect + PCA.

Replaces ``cv2.findContours`` + ``cv2.minAreaRect``
(reference grasp_point_selector.py:718-752) and ``cv2.fitEllipse``
(leaf_grasp_node_2.py:158-265).  Two estimators:

* ``min_area_rect`` -- the DEFAULT (``orientation_source=
  "min_area_rect"``, config.py): exact cv2.minAreaRect parity computed
  on-device (largest connected component -> convex hull -> rotating
  calipers), bit-matched against cv2 in tests/test_ops_misc.py.
* ``mask_orientation`` -- the faster moment-PCA alternate
  (``orientation_source="pca"``): for elongated convex-ish leaf blobs
  both agree on the major-axis direction (the only quantity the
  |cross| alignment term consumes, grasp_point_selector.py:556-558),
  but the exact angle can differ by a few degrees on non-elliptical
  blobs, so it is opt-in, not the parity path.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["Orientation", "mask_orientation", "min_area_rect"]


class Orientation(NamedTuple):
    angle: jnp.ndarray        # radians, direction of the major axis
    major_axis: jnp.ndarray   # full extent (4 sigma) along major axis, px
    minor_axis: jnp.ndarray   # full extent (4 sigma) along minor axis, px
    center: jnp.ndarray       # (2,) = (x, y) centroid
    valid: jnp.ndarray        # bool: mask had any pixels


def mask_orientation(mask: jnp.ndarray, reduce_fn=None,
                     row0=0) -> Orientation:
    """Major-axis angle / extents / centroid of a binary mask via PCA.

    reduce_fn/row0: cross-shard SUM hook + global first-row offset for
    row-sharded callers (identity semantics at the defaults). Second
    moments stay CENTERED (two reduction rounds) -- raw moments about
    the origin cancel catastrophically in f32 at 1440-px scale.
    """
    m = jnp.asarray(mask, jnp.float32)
    h, w = m.shape
    reduce_fn = reduce_fn or (lambda x: x)

    ys = row0 + jnp.arange(h, dtype=jnp.float32)[:, None]
    xs = jnp.arange(w, dtype=jnp.float32)[None, :]

    first = reduce_fn(jnp.stack([jnp.sum(m), jnp.sum(m * xs),
                                 jnp.sum(m * ys)]))
    total, sx, sy = first
    valid = total > 0
    safe_total = jnp.maximum(total, 1.0)

    mx = sx / safe_total
    my = sy / safe_total

    second = reduce_fn(jnp.stack([
        jnp.sum(m * (xs - mx) ** 2),
        jnp.sum(m * (ys - my) ** 2),
        jnp.sum(m * (xs - mx) * (ys - my))]))
    dx2 = second[0] / safe_total
    dy2 = second[1] / safe_total
    dxy = second[2] / safe_total

    # Principal eigen-direction of [[dx2, dxy], [dxy, dy2]].
    angle = 0.5 * jnp.arctan2(2.0 * dxy, dx2 - dy2)

    common = jnp.sqrt(jnp.maximum((dx2 - dy2) ** 2 / 4.0 + dxy ** 2, 0.0))
    lam1 = (dx2 + dy2) / 2.0 + common
    lam2 = (dx2 + dy2) / 2.0 - common

    major = 4.0 * jnp.sqrt(jnp.maximum(lam1, 0.0))
    minor = 4.0 * jnp.sqrt(jnp.maximum(lam2, 0.0))

    return Orientation(
        angle=angle,
        major_axis=major,
        minor_axis=minor,
        center=jnp.stack([mx, my]),
        valid=valid,
    )


def _mask_row_runs(m: jnp.ndarray, rpr: int):
    """Per-row mask runs: ([xl, xr] slot arrays (h, rpr) ascending,
    per-row run counts). Purely local to the rows given -- the
    row-sharded pipeline computes this on each shard's block and
    all_gathers the (tiny) results before the global component graph
    (``_largest_component_extremes_from_runs``)."""
    h, w = m.shape
    rpr = min(rpr, (w + 1) // 2)       # a row fits at most ceil(w/2) runs
    xs = jnp.arange(w, dtype=jnp.int32)[None, :]
    no_left = jnp.roll(m, 1, axis=1).at[:, 0].set(False)
    no_right = jnp.roll(m, -1, axis=1).at[:, w - 1].set(False)
    starts = m & ~no_left
    ends = m & ~no_right
    inval = jnp.int32(w + 1)
    xl = -jax.lax.top_k(jnp.where(starts, -xs, -inval), rpr)[0]  # (h,rpr)
    xr = -jax.lax.top_k(jnp.where(ends, -xs, -inval), rpr)[0]
    return xl, xr, jnp.sum(starts, axis=1)


def _largest_component_extremes(m: jnp.ndarray, rpr: int,
                                max_runs: int = 512):
    """Per-row [xmin, xmax] of the LARGEST 8-connected component.

    TPU-shaped connected components without any full-frame scan or
    compaction (a flat 1.5M cumsum costs ~14.5 ms on a v5e; this whole
    routine is ~1 ms): the mask is viewed as horizontal RUNS, at most
    ``rpr`` per row, extracted by ``lax.top_k`` of the run start/end
    column positions (start/end flags are elementwise; top_k of -x
    yields the leftmost ``rpr`` starts ascending, and the i-th start
    pairs with the i-th end). Runs in adjacent rows are linked to
    their FIRST overlapping run above and below (8-connected overlap:
    +-1 column slack); with min-label propagation iterated to a fixed
    point this spans every component: if runs u (row r) and d (row
    r+1) overlap but neither first-link hits the other, d's first
    overlap u' lies left of u in row r yet must reach d's interval --
    contradiction with u'/u being disjoint -- so overlap blocks stay
    connected through first-links alone. The (h, rpr) run slots are
    then COMPACTED to 512 via another top_k (label-loop ops on a 17k
    array cost ~4 ms on a v5e; on 512 they are noise), labels converge
    by symmetric hooking + path-halving (convergence-checked
    while_loop), component areas are a segment_sum of run lengths, and
    the winner's per-row extremes come from a masked scatter.

    Rows with more than ``rpr`` runs -- or masks with more than
    ``max_runs`` total -- overflow: the result is flagged invalid
    (third return value False) rather than silently wrong.
    """
    xl, xr, nrow = _mask_row_runs(m, rpr)
    return _largest_component_extremes_from_runs(xl, xr, nrow,
                                                 m.shape[1], max_runs)


def _largest_component_extremes_from_runs(xl, xr, nrow, w: int,
                                          max_runs: int = 512):
    """Global half of ``_largest_component_extremes``: run-graph
    labeling + winner extremes from already-extracted per-row runs
    (possibly all_gathered across row shards). See the docstring
    above for the algorithm and correctness argument."""
    h, rpr = xl.shape
    inval = jnp.int32(w + 1)
    run_ok = xl < inval
    overflow = jnp.any(nrow > rpr)

    def first_overlap(xl_o, xr_o, ok_o, row_shift):
        """index of the first run in the +-1-shifted row that
        8-overlaps each run, else self; (h, rpr) int32 flat indices."""
        ov = (ok_o[:, None, :] & run_ok[:, :, None]
              & (xr_o[:, None, :] >= xl[:, :, None] - 1)
              & (xl_o[:, None, :] <= xr[:, :, None] + 1))   # (h, i, j)
        j = jnp.argmax(ov, axis=2).astype(jnp.int32)
        hit = jnp.any(ov, axis=2)
        rows_ = jnp.arange(h, dtype=jnp.int32)[:, None]
        self_idx = rows_ * rpr + jnp.arange(rpr, dtype=jnp.int32)[None]
        tgt = (rows_ + row_shift) * rpr + j
        return jnp.where(hit, tgt, self_idx)

    def rshift(a, d, fill):
        return jnp.roll(a, d, axis=0).at[0 if d > 0 else h - 1].set(fill)

    up = first_overlap(rshift(xl, 1, inval), rshift(xr, 1, -1),
                       rshift(run_ok, 1, False), -1).ravel()
    dn = first_overlap(rshift(xl, -1, inval), rshift(xr, -1, -1),
                       rshift(run_ok, -1, False), 1).ravel()

    # ---- compact the (h*rpr) slots to MAXR real runs ----------------
    nflat = h * rpr
    maxr = min(max_runs, nflat)
    okf = run_ok.ravel()
    neg = jnp.where(okf, -jnp.arange(nflat, dtype=jnp.int32),
                    jnp.int32(-(nflat + 1)))
    cflat = -jax.lax.top_k(neg, maxr)[0]     # ascending flat indices
    cok = cflat < nflat
    cclip = jnp.where(cok, cflat, 0)
    # flat -> compact map. Invalid compact slots' indices are OUT OF
    # BOUNDS and must be DROPPED, not clamped or defaulted to 0: a
    # duplicate write at 0 would corrupt the mapping for a real run in
    # frame row 0 (XLA scatter order with duplicates is undefined) and
    # silently split that run's component.
    lut = jnp.full((nflat,), jnp.int32(0)).at[cflat].set(
        jnp.arange(maxr, dtype=jnp.int32), mode="drop")
    cidx = jnp.arange(maxr, dtype=jnp.int32)
    # invalid compact slots self-link so they never touch real labels
    up_c = jnp.where(cok, jnp.take(lut, jnp.take(up, cclip)), cidx)
    dn_c = jnp.where(cok, jnp.take(lut, jnp.take(dn, cclip)), cidx)
    overflow = overflow | (jnp.sum(nrow) > maxr)

    init = jnp.arange(maxr, dtype=jnp.int32)

    def body(state):
        lab, _ = state
        # pulls along BOTH directions of every edge: gather for i <-
        # link[i], scatter-min for link[i] <- i (gather-only pulls
        # leave nodes whose first-links all point elsewhere unable to
        # export their subtree's minimum -- components split)
        new = jnp.minimum(lab, jnp.take(lab, up_c))
        new = jnp.minimum(new, jnp.take(new, dn_c))
        new = new.at[up_c].min(new)
        new = new.at[dn_c].min(new)
        new = jnp.take(new, new)
        new = jnp.take(new, new)
        return new, jnp.any(new != lab)

    lab, _ = jax.lax.while_loop(lambda s: s[1], body,
                                (init, jnp.bool_(True)))

    xl_c = jnp.take(xl.ravel(), cclip)
    xr_c = jnp.take(xr.ravel(), cclip)
    length = jnp.where(cok, xr_c - xl_c + 1, 0)
    areas = jax.ops.segment_sum(length, lab, num_segments=maxr)
    win = jnp.argmax(areas).astype(jnp.int32)
    winner = (lab == win) & cok
    crow = cclip // rpr

    bigx = jnp.int32(1 << 20)
    xmin_r = jnp.full((h,), bigx, jnp.int32).at[crow].min(
        jnp.where(winner, xl_c, bigx))
    xmax_r = jnp.full((h,), jnp.int32(-1)).at[crow].max(
        jnp.where(winner, xr_c, -1))
    return xmin_r, xmax_r, jnp.any(nrow > 0) & ~overflow


def min_area_rect(mask: jnp.ndarray,
                  max_runs_per_row: int = 16,
                  largest_component: bool = True) -> Orientation:
    """``cv2.minAreaRect``-equivalent orientation, TPU-native and EXACT.

    The reference's production orientation source is the minimum-area
    bounding rectangle of the largest contour
    (grasp_point_selector.py:718-752 estimate_leaf_orientation, feeding
    the sdf alignment term at :554-558); moment-PCA
    (``mask_orientation``) can differ by tens of degrees on
    non-elliptical blobs. This computes the same rectangle -- rotating
    calipers over the convex hull, the same optimum cv2 lands on --
    with static shapes and no sequential hull scan:

    1. per-row min/max x of the mask (every strict hull vertex of a
       pixel set is a row extreme: a point with same-row points on
       both sides lies inside their segment) -> 2h hull candidates,
       lexicographically sorted by an integer key;
    2. upper/lower hulls by SIMULTANEOUS reflex deletion, iterated to
       a fixed point: each round deletes every candidate lying on or
       inside the segment of its nearest alive neighbors (exclusive
       suffix-min / prefix-max for neighbor lookup, int32 cross
       products -- exact). A strict hull vertex lies strictly outside
       the segment of ANY point pair, so it is never deleted; the
       fixed point is exactly the strict-vertex hull;
    3. project the hull points onto every hull EDGE direction (the
       min-area rectangle has a side collinear with a hull edge) in
       one (K, 2) x (2, 2E) matmul at ``Precision.HIGHEST`` (the
       default f32 dot is bf16-grade on TPU and on this XLA:CPU
       build -- measured area errors ~70x the optimum's margin) and
       take the smallest width x height.

    ``largest_component=True`` (the default, matching cv2's
    RETR_EXTERNAL + max contourArea on occlusion-fragmented instance
    masks) restricts the rectangle to the LARGEST 8-connected
    component via the run-graph labeling in
    ``_largest_component_extremes`` -- no full-frame scan, ~1 ms on a
    v5e. ``False`` skips component selection (hull of the whole mask).

    Exactness caveats vs cv2: rows with more than ``max_runs_per_row``
    mask runs flag the result invalid; component ranking uses filled
    pixel area where cv2.contourArea measures the outer polygon (they
    can disagree between near-tied components with interior holes); on
    EXACT area ties between distinct edge directions the tie-break
    (lowest edge index) may differ from cv2's traversal order. Angle
    returned is the MAJOR-axis direction in radians, matching the
    reference's ``if size[0] < size[1]: angle += 90`` normalization.
    """
    m = jnp.asarray(mask, bool)
    h, w = m.shape
    bigx = jnp.int32(1 << 20)
    if largest_component:
        xmin_r, xmax_r, valid_m = _largest_component_extremes(
            m, max_runs_per_row)
    else:
        cols = jnp.arange(w, dtype=jnp.int32)[None, :]
        xmin_r = jnp.min(jnp.where(m, cols, bigx), axis=1)
        xmax_r = jnp.max(jnp.where(m, cols, -1), axis=1)
        valid_m = jnp.any(m)
    return _rect_from_row_extremes(xmin_r, xmax_r, w, valid_m)


def _rect_from_row_extremes(xmin_r, xmax_r, w: int, valid_m):
    """Exact min-area rectangle (hull by reflex deletion + calipers)
    from per-row [xmin, xmax] extremes -- steps 2-3 of the
    ``min_area_rect`` docstring. Row index IS the y coordinate, so the
    row-sharded pipeline can call this replicated on all_gathered
    extremes."""
    h = xmin_r.shape[0]
    rows = jnp.arange(h, dtype=jnp.int32)
    row_ok = xmax_r >= 0
    cx_ = jnp.concatenate([xmin_r, xmax_r])
    cy_ = jnp.concatenate([rows, rows])
    # single-pixel rows would duplicate their point: a strict vertex
    # and its twin see a zero cross against each other and would BOTH
    # be deleted -- keep only the xmin copy
    cok = jnp.concatenate([row_ok, row_ok & (xmax_r > xmin_r)])
    n = 2 * h
    # lexicographic (x, y) sort; invalid rows sort to the end
    skey = jnp.where(cok, cx_ * jnp.int32(h + 1) + cy_,
                     jnp.int32(2**31 - 1))
    order = jnp.argsort(skey)
    px = jnp.take(cx_, order)
    py = jnp.take(cy_, order)
    pok = jnp.take(cok, order)
    idx = jnp.arange(n, dtype=jnp.int32)
    nbig = jnp.int32(n + 1)

    def half_hull(sign):
        """Alive mask of the strict hull on one side, by simultaneous
        reflex deletion to a fixed point. sign=+1 keeps the max-y
        chain, -1 the min-y chain (over x-sorted candidates)."""
        def neighbors(alive):
            arr = jnp.where(alive, idx, nbig)
            suf = jnp.flip(jax.lax.cummin(jnp.flip(arr)))
            nxt = jnp.concatenate([suf[1:], jnp.full((1,), nbig)])
            arr2 = jnp.where(alive, idx, -1)
            pre = jax.lax.cummax(arr2)
            prv = jnp.concatenate([jnp.full((1,), jnp.int32(-1)),
                                   pre[:-1]])
            return prv, nxt

        def body(state):
            alive, _ = state
            prv, nxt = neighbors(alive)
            interior_pt = alive & (prv >= 0) & (nxt < n)
            pc = jnp.clip(prv, 0, n - 1)
            nc = jnp.clip(nxt, 0, n - 1)
            ax, ay = jnp.take(px, pc), jnp.take(py, pc)
            bx, by = jnp.take(px, nc), jnp.take(py, nc)
            # int32 exact: |coords| < 2^12 -> |cross| < 2^25
            cr = (bx - ax) * (py - ay) - (px - ax) * (by - ay)
            drop = interior_pt & (sign * cr <= 0)
            return alive & ~drop, jnp.any(drop)

        alive, _ = jax.lax.while_loop(
            lambda s: s[1], lambda s: body(s), (pok, jnp.bool_(True)))
        return alive

    up, lo_h = half_hull(jnp.int32(1)), half_hull(jnp.int32(-1))
    hull = up | lo_h

    # ---- hull edge directions (+ axis-aligned fallback) -------------
    def edges(alive):
        arr = jnp.where(alive, idx, nbig)
        suf = jnp.flip(jax.lax.cummin(jnp.flip(arr)))
        nxt = jnp.concatenate([suf[1:], jnp.full((1,), nbig)])
        ok_e = alive & (nxt < n)
        nc = jnp.clip(nxt, 0, n - 1)
        dx = jnp.where(ok_e, jnp.take(px, nc) - px, 1)
        dy = jnp.where(ok_e, jnp.take(py, nc) - py, 0)
        return dx.astype(jnp.float32), dy.astype(jnp.float32)

    dxu, dyu = edges(up)
    dxl, dyl = edges(lo_h)
    dx = jnp.concatenate([dxu, dxl, jnp.ones((1,), jnp.float32)])
    dy = jnp.concatenate([dyu, dyl, jnp.zeros((1,), jnp.float32)])
    inv = 1.0 / jnp.sqrt(dx * dx + dy * dy)
    c, s = dx * inv, dy * inv                                # (E,)

    pts = jnp.stack([px.astype(jnp.float32),
                     py.astype(jnp.float32)], axis=1)        # (N, 2)
    dirs = jnp.concatenate(
        [jnp.stack([c, s]), jnp.stack([-s, c])], axis=1)     # (2, 2E)
    proj = jnp.matmul(pts, dirs,
                      precision=jax.lax.Precision.HIGHEST)   # (N, 2E)
    big = jnp.float32(2 * (h + w))
    hf = hull[:, None]
    lo = jnp.min(jnp.where(hf, proj, big), axis=0)
    hi = jnp.max(jnp.where(hf, proj, -big), axis=0)
    e = dx.shape[0]
    wid, hei = (hi - lo)[:e], (hi - lo)[e:]
    best = jnp.argmin(wid * hei)

    theta = jnp.arctan2(dy[best], dx[best])
    rw, rh = wid[best], hei[best]
    cu = (lo[best] + hi[best]) / 2
    cv = (lo[e + best] + hi[e + best]) / 2
    cb, sb = jnp.cos(theta), jnp.sin(theta)
    center = jnp.stack([cu * cb - cv * sb, cu * sb + cv * cb])

    angle = jnp.where(rw >= rh, theta, theta + jnp.float32(math.pi / 2))
    return Orientation(angle=angle,
                       major_axis=jnp.maximum(rw, rh),
                       minor_axis=jnp.minimum(rw, rh),
                       center=center,
                       valid=valid_m)
