"""Exact Euclidean distance transform (EDT) in pure JAX, TPU-friendly.

Replaces two third-party native dependencies of the reference stack:

* ``cv2.distanceTransform(mask, DIST_L2, 5)``
  (reference grasp_point_selector.py:266,529-530,611-616) -- OpenCV's
  maskSize=5 variant is a *chamfer approximation* (max rel. error ~2%);
  this module computes the **exact** L2 EDT, a conscious, documented
  divergence that is at least as accurate.
* ``skfmm.distance`` on binary level sets
  (reference leaf_scorer.py:69, sdf_helper.py:23-43) -- on a binary
  region the fast-marching solution equals the Euclidean distance up to
  FMM discretization error; the leaf scorer only consumes distances /
  arg-extrema of this field, for which the exact EDT is a drop-in.

Algorithm (exact, O(H*W*W) but fully data-parallel, i.e. TPU-shaped):

1. per-column 1D distance to the nearest seed via two *associative scans*
   (log-depth, no sequential loop), giving G[i,j];
2. exact 2D squared distance D2[i,j] = min_{j'} (G[i,j']^2 + (j-j')^2),
   evaluated as a chunked min-plus contraction that XLA fuses into a
   reduction (no H*W*W intermediate in HBM).

A fused Pallas kernel for pass 2 lives in ``ops/pallas_edt.py``; this
module is the jit-able oracle it is verified against.
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["nearest_seed_dist_1d", "directional_seed_dist_1d",
           "squared_edt", "squared_edt_full", "squared_edt_window",
           "squared_edt_window_src", "edt", "signed_edt", "edt_batch",
           "edt_max_argmax", "edt_max_argmax_batch"]


def directional_seed_dist_1d(seeds: jnp.ndarray, axis: int = 0):
    """(d_before, d_after): distance along `axis` to the nearest True
    seed at-or-before / at-or-after each position.

    Uses running-max/min of seed indices via ``lax.associative_scan``
    -> O(log n) depth, no host loop. Positions with no seed in that
    direction get a large finite sentinel (n_axis0 + n_axis1), which
    squares safely in float32. Callers needing asymmetric vertical
    reach (``morphology.dilated_vertical_dist``) consume the two
    directions separately; ``nearest_seed_dist_1d`` is their min.
    """
    seeds = jnp.asarray(seeds, dtype=bool)
    n = seeds.shape[axis]
    # > any achievable pixel distance; spatial dims only, so batched
    # (C, H, W) calls produce the same seedless-line sentinel as 2D ones
    big = jnp.int32(sum(seeds.shape[-2:]))

    idx = jax.lax.broadcasted_iota(jnp.int32, seeds.shape, axis)

    # Nearest seed at-or-before i: running max of seed indices.
    before = jnp.where(seeds, idx, jnp.int32(-1))
    before = jax.lax.associative_scan(jnp.maximum, before, axis=axis)
    d_before = jnp.where(before >= 0, idx - before, big)

    # Nearest seed at-or-after i: running min of seed indices (reverse).
    after = jnp.where(seeds, idx, jnp.int32(2 * n))
    after = jax.lax.associative_scan(jnp.minimum, after, axis=axis,
                                     reverse=True)
    d_after = jnp.where(after < 2 * n, after - idx, big)

    return d_before, d_after


def nearest_seed_dist_1d(seeds: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """1D distance (in pixels) along `axis` to the nearest True seed.
    See ``directional_seed_dist_1d`` for the scan structure."""
    d_before, d_after = directional_seed_dist_1d(seeds, axis=axis)
    return jnp.minimum(d_before, d_after)


@functools.partial(jax.jit, static_argnames=("chunk",))
def squared_edt_full(seeds: jnp.ndarray, chunk: int = 512,
                     g2: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact squared EDT via the full O(H*W*W) min-plus sweep (the
    verification oracle for the banded fast path below)."""
    seeds = jnp.asarray(seeds, dtype=bool)
    h, w = seeds.shape

    # Pass 1: per-column vertical distances.
    if g2 is None:
        g = nearest_seed_dist_1d(seeds, axis=0).astype(jnp.float32)
        g2 = g * g  # (H, W)

    # Pass 2: D2[i,j] = min_{j'} g2[i,j'] + (j-j')^2, chunked over j'.
    cols = jnp.arange(w, dtype=jnp.float32)

    n_chunks = -(-w // chunk)
    pad = n_chunks * chunk - w
    big = jnp.float32((h + w) * (h + w))
    g2p = jnp.pad(g2, ((0, 0), (0, pad)), constant_values=big)
    colp = jnp.pad(cols, (0, pad), constant_values=jnp.float32(-10 * w))
    g2c = g2p.reshape(h, n_chunks, chunk)
    colc = colp.reshape(n_chunks, chunk)

    def body(carry, inputs):
        g2_blk, col_blk = inputs          # (H, C), (C,)
        # (H, C, W) broadcast fused into the min-reduction by XLA.
        off = (cols[None, :] - col_blk[:, None]) ** 2       # (C, W)
        cand = jnp.min(g2_blk[:, :, None] + off[None, :, :], axis=1)
        return jnp.minimum(carry, cand), None

    init = jnp.full((h, w), big, dtype=jnp.float32)
    d2, _ = jax.lax.scan(body, init,
                         (jnp.moveaxis(g2c, 1, 0), colc))
    return d2


def _shift_cols(arr: jnp.ndarray, delta: int, fill) -> jnp.ndarray:
    """out[:, j] = arr[:, j + delta], fill where OOB (static delta)."""
    if delta == 0:
        return arr
    h = arr.shape[0]
    pad = jnp.full((h, abs(delta)), fill, arr.dtype)
    if delta > 0:
        return jnp.concatenate([arr[:, delta:], pad], axis=1)
    return jnp.concatenate([pad, arr[:, :delta]], axis=1)


@functools.partial(jax.jit, static_argnames=("chunk", "big"))
def squared_edt(seeds: jnp.ndarray | None, chunk: int = 128,
                g2: jnp.ndarray | None = None,
                big: float | None = None,
                band_mask: jnp.ndarray | None = None) -> jnp.ndarray:
    """Exact squared L2 distance from every pixel to the nearest True
    seed, via a BANDED min-plus sweep.

    g2: optional precomputed pass-1 squared vertical distances (callers
    batching several fields amortize the associative scans).

    seeds : (H, W) bool. Returns (H, W) float32. Pixels on a seed -> 0.
    If no seed exists the result is a large finite sentinel everywhere.

    Exactness of the band: a cheap upper bound U is first taken as the
    min over sparse column offsets delta of g2[:, j+delta] + delta^2
    (every term is a true candidate, so D2 <= U pointwise).  Any
    candidate farther than B = sqrt(max U) columns costs >= B^2 >= D2
    from its offset alone and can never win, so the dynamic
    ``while_loop`` only visits chunk offsets |o| <= ceil(B/chunk)+1.
    Typical frames have B in the low hundreds -> 3-10x less work than
    the full sweep, degrading gracefully to the full sweep for
    seed-free frames.

    big: optional sentinel override (> any achievable squared distance).
    Row-sharded callers operating on a local row block MUST pass the
    full-frame (H + W)^2 -- the local block's own (h + w)^2 can be
    smaller than true squared distances, corrupting padded columns.

    band_mask: optional (H, W) bool query mask. When given, the band is
    sized from the upper bound's max over ONLY the masked pixels, so the
    result is exact on the mask and an OVERESTIMATE elsewhere. Callers
    whose consumers multiply the field by the mask (e.g. the per-leaf
    isolation fields, grasp_point_selector.py:611-628) get the exact
    answer for a fraction of the sweep cost; global normalizers must
    then come from ``edt_max_argmax`` instead of the returned field.
    """
    if seeds is None:
        if g2 is None:
            raise ValueError("squared_edt needs seeds or g2")
        h, w = g2.shape
    else:
        seeds = jnp.asarray(seeds, dtype=bool)
        h, w = seeds.shape
    big = jnp.float32((h + w) * (h + w) if big is None else big)

    if g2 is None:
        g = nearest_seed_dist_1d(seeds, axis=0).astype(jnp.float32)
        g2 = g * g  # (H, W)

    n_chunks = -(-w // chunk)
    wp = n_chunks * chunk
    g2p = jnp.pad(g2, ((0, 0), (0, wp - w)), constant_values=big)

    # --- upper bound from sparse true candidates -------------------------
    upper = g2p
    for delta in (1, 4, 16, 64, 256, 1024):
        if delta >= w:
            break
        d2 = jnp.float32(delta * delta)
        upper = jnp.minimum(upper, _shift_cols(g2p, delta, big) + d2)
        upper = jnp.minimum(upper, _shift_cols(g2p, -delta, big) + d2)
    if band_mask is None:
        b_max = jnp.sqrt(jnp.max(upper[:, :w]))
    else:
        b_max = jnp.sqrt(jnp.max(jnp.where(
            jnp.asarray(band_mask, bool), upper[:, :w], 0.0)))
    max_off = jnp.minimum(
        (b_max / chunk).astype(jnp.int32) + 1, n_chunks - 1)

    # --- banded sweep over chunk offsets ---------------------------------
    g2c = jnp.moveaxis(g2p.reshape(h, n_chunks, chunk), 1, 0)  # (nc, H, C)
    a_out = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    b_in = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    ic = jnp.arange(n_chunks)

    def chunk_min(shifted, off2):
        # shifted: (nc, H, Cin); off2: (Cout, Cin) -> (nc, H, Cout)
        return jnp.min(shifted[:, :, None, :] + off2[None, None, :, :],
                       axis=-1)

    def gather_chunks(o):
        idx = ic + o
        valid = (idx >= 0) & (idx < n_chunks)
        taken = jnp.take(g2c, jnp.clip(idx, 0, n_chunks - 1), axis=0)
        return jnp.where(valid[:, None, None], taken, big)

    def off2_for(o):
        diff = (a_out - b_in - o * chunk).astype(jnp.float32)
        return diff * diff

    # o = 0 (own chunk) seeds the carry
    carry0 = chunk_min(g2c, off2_for(0))

    def banded(_):
        def cond(state):
            o, _ = state
            return o <= max_off

        def body(state):
            o, carry = state
            cand_p = chunk_min(gather_chunks(o), off2_for(o))
            cand_m = chunk_min(gather_chunks(-o), off2_for(-o))
            carry = jnp.minimum(carry, jnp.minimum(cand_p, cand_m))
            return o + 1, carry

        _, carry = jax.lax.while_loop(cond, body, (jnp.int32(1), carry0))
        return jnp.moveaxis(carry, 0, 1).reshape(h, wp)[:, :w]

    # Runtime-adaptive: the banded loop does (2*max_off+1) chunk passes;
    # past roughly half the width the classic wide-chunk full sweep is
    # cheaper (better arithmetic intensity). Both branches are exact.
    def full_branch(_):
        wide = 512
        nc_w = -(-w // wide)
        g2w = jnp.pad(g2, ((0, 0), (0, nc_w * wide - w)),
                      constant_values=big)
        cols = jnp.arange(w, dtype=jnp.float32)
        colp = jnp.pad(cols, (0, nc_w * wide - w),
                       constant_values=jnp.float32(-10 * w))
        blocks = jnp.moveaxis(g2w.reshape(h, nc_w, wide), 1, 0)
        colc = colp.reshape(nc_w, wide)

        def body(carry, inputs):
            g2_blk, col_blk = inputs
            off = (cols[None, :] - col_blk[:, None]) ** 2
            cand = jnp.min(g2_blk[:, :, None] + off[None, :, :], axis=1)
            return jnp.minimum(carry, cand), None

        init = jnp.full((h, w), big, jnp.float32)
        d2, _ = jax.lax.scan(body, init, (blocks, colc))
        return d2

    return jax.lax.cond(2 * max_off + 1 < n_chunks, banded, full_branch,
                        operand=None)


def edt(seeds: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Exact L2 distance to the nearest True seed. (H, W) float32."""
    return jnp.sqrt(squared_edt(seeds, chunk=chunk))


def edt_batch(seeds: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Exact L2 EDT over a (C, H, W) batch of seed masks.

    Channels run as separate programs (a Python loop, not vmap) so each
    channel's runtime-adaptive band chooses independently -- vmapping the
    inner ``lax.cond`` would execute BOTH branches per channel.
    """
    seeds = jnp.asarray(seeds, bool)
    # ONE batched associative scan for pass 1 (scan cost is depth-bound,
    # so C channels cost ~the same as one) ...
    g = nearest_seed_dist_1d(seeds, axis=1).astype(jnp.float32)
    g2 = g * g
    # ... then per-channel adaptive pass 2 (a Python loop, not vmap, so
    # each channel's runtime band chooses independently).
    outs = [jnp.sqrt(squared_edt(seeds[c], chunk=chunk, g2=g2[c]))
            for c in range(seeds.shape[0])]
    return jnp.stack(outs)


def _tile_candidates(ds: jnp.ndarray, k: int, tile: int = 8):
    """Near-max candidate samples of ``ds`` (H, ws) via a tile-max
    hierarchy instead of a flat ``top_k`` over all H*ws samples.

    ``lax.top_k`` lowers to a full sort on TPU (~0.65 ms at 1080x181);
    reducing to per-(tile x tile) maxes first shrinks the sort 64x
    (~0.05 ms, measured) while keeping the SAME coverage contract:
    every sample outside the selected tiles is <= ``kth_bound`` (the
    t-th best tile max bounds its tiles' samples), so the caller's
    guard ``kth_bound < m_low - slack`` proves the candidate set
    contains every sample within the Lipschitz slack of the max.

    Returns (kth_bound f32, flat int32 (t*tile*tile,) candidate sample
    indices, exhaustive bool). Padded/clipped positions duplicate real
    samples (harmless: refinement takes a min over first-occurrence
    indices). ``exhaustive`` is True when every tile was selected --
    the candidate set then covers ALL samples and coverage holds
    regardless of the bound.
    """
    hh, ws = ds.shape
    t = max(1, -(-k // (tile * tile)))
    nr, ncs = -(-hh // tile), -(-ws // tile)
    exhaustive = t >= nr * ncs
    t = min(t, nr * ncs)
    dp = jnp.pad(ds, ((0, nr * tile - hh), (0, ncs * tile - ws)),
                 constant_values=-1.0)
    tmax = dp.reshape(nr, tile, ncs, tile).max(axis=(1, 3))
    tvals, tidx = jax.lax.top_k(tmax.ravel(), t)
    tr, tc = tidx // ncs, tidx % ncs
    dd = jnp.arange(tile, dtype=jnp.int32)
    rows = jnp.clip(tr[:, None] * tile + dd[None, :], 0, hh - 1)
    cidx = jnp.clip(tc[:, None] * tile + dd[None, :], 0, ws - 1)
    flat = (rows[:, :, None] * ws + cidx[:, None, :]).reshape(-1)
    return tvals[t - 1], flat.astype(jnp.int32), exhaustive


@functools.partial(jax.jit, static_argnames=("stride", "k", "chunk"))
def edt_max_argmax(seeds: jnp.ndarray, g2: jnp.ndarray | None = None,
                   stride: int = 16, k: int = 1024, chunk: int = 512):
    """Exact ``(max, argmax)`` of ``edt(seeds)`` WITHOUT the pass-2 field.

    Several consumers only need the global max of a wide distance field
    -- the |sdf| normalizer consumes ``max(dist_outside)``
    (grasp_point_selector.py:538), the isolation normalizers consume
    ``np.max(dist_close/wide)`` (grasp_point_selector.py:612-617), and
    the leaf scorer consumes only ``argmax`` of the global SDF
    (leaf_scorer.py:70-76). Those fields are the WIDE ones (hundreds of
    pixels), exactly where the banded sweep degrades to the full
    O(H*W*W) sweep; this computes the same scalars at ~1/stride of that
    cost.

    Method (exact, all integer-valued f32 arithmetic so bit-equal to
    ``jnp.max(edt(seeds))`` / first-occurrence ``jnp.argmax``):

    1. evaluate the exact envelope d(i, j) at every row but only at
       sampled columns (every ``stride``-th plus the last): a min-plus
       over ALL source columns, O(H * W/stride * W);
    2. d is 1-Lipschitz, so the true max M <= max(sampled) + stride/2
       and every pixel attaining M has its nearest sampled column
       scoring >= M - stride/2. A tile-max hierarchy
       (``_tile_candidates``) collects every such sample (guard
       below) without sorting all H*ws samples, and an exact
       re-evaluation of the +-stride/2 column windows around them
       recovers M and its first row-major attaining pixel;
    3. if the top-k could NOT have captured all candidates (k-th value
       within the Lipschitz slack of the sampled max -- e.g. adversarial
       near-max plateaus), fall back to the exact full sweep via
       ``lax.cond``. Seed-free and all-seed frames (constant fields)
       are exact in the primary branch and never fall back.

    Defaults stride=16/k=1024 (r5; was 8/2048): the result is exact at
    ANY stride/k (the guard falls back to the full sweep when coverage
    can't be proven), so the knobs only trade envelope-scan cost
    against refinement cost and fallback likelihood.  The guard-margin
    probe over every (leaf, channel) of the three bench families
    measured 0/63 fallbacks with worst margin +15 px at this setting
    (k=512 DOES fall back on a sparse-family 70-sample near-max ridge;
    stride 8/k 2048 pays ~2x the envelope scan), and the coarser
    envelope A/B'd faster end to end (PERF.md roadmap 12b).

    Returns (max_dist f32 scalar, argmax flat row-major index int32).
    """
    seeds = jnp.asarray(seeds, bool)
    h, w = seeds.shape
    if g2 is None:
        g = nearest_seed_dist_1d(seeds, axis=0).astype(jnp.float32)
        g2 = g * g

    js = np.unique(np.concatenate([np.arange(0, w, stride),
                                   [w - 1]])).astype(np.int32)
    ws = int(js.size)
    slack = stride // 2     # max col distance from any pixel to a sample
    jsf = jnp.asarray(js, jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)

    # --- pass A: exact envelope at sampled columns (H, ws) --------------
    nc = -(-w // chunk)
    big = jnp.float32((h + w) * (h + w))
    g2p = jnp.pad(g2, ((0, 0), (0, nc * chunk - w)), constant_values=big)
    colp = jnp.pad(cols, (0, nc * chunk - w),
                   constant_values=jnp.float32(-10 * w))
    blocks = jnp.moveaxis(g2p.reshape(h, nc, chunk), 1, 0)
    colc = colp.reshape(nc, chunk)

    def body(carry, inputs):
        g2_blk, col_blk = inputs            # (H, C), (C,)
        off = (jsf[:, None] - col_blk[None, :]) ** 2        # (ws, C)
        cand = jnp.min(g2_blk[:, None, :] + off[None, :, :], axis=-1)
        return jnp.minimum(carry, cand), None

    init = jnp.full((h, ws), big, jnp.float32)
    d2s, _ = jax.lax.scan(body, init, (blocks, colc))
    ds = jnp.sqrt(d2s)
    m_low = jnp.max(ds)

    kth_bound, flat, exhaustive = _tile_candidates(ds, k)
    if exhaustive:
        covered = jnp.bool_(True)
    else:
        covered = kth_bound < m_low - (slack + 0.01)
        # constant fields (no seeds / all seeds) are exact regardless of
        # which ties the tile selection kept
        covered = covered | ~jnp.any(seeds) | jnp.all(seeds)

    # --- pass B: exact refinement of +-slack windows --------------------
    def refined(_):
        rows = flat // ws                                     # (kk,)
        scols = jnp.asarray(js, jnp.int32)[flat % ws]
        win = jnp.arange(-slack, slack + 1, dtype=jnp.int32)
        jwin = jnp.clip(scols[:, None] + win[None, :], 0, w - 1)
        g2rows = jnp.take(g2, rows, axis=0)                   # (kk, W)
        offr = (jwin[:, :, None].astype(jnp.float32)
                - cols[None, None, :]) ** 2                   # (kk, win, W)
        d2r = jnp.min(g2rows[:, None, :] + offr, axis=-1)
        dr = jnp.sqrt(d2r)
        mx = jnp.max(dr)
        flat_pix = rows[:, None] * w + jwin
        amax = jnp.min(jnp.where(dr == mx, flat_pix, jnp.int32(h * w)))
        return mx, amax.astype(jnp.int32)

    def full_sweep(_):
        d = jnp.sqrt(squared_edt_full(seeds))
        return jnp.max(d), jnp.argmax(d).astype(jnp.int32)

    return jax.lax.cond(covered, refined, full_sweep, operand=None)


@functools.partial(jax.jit, static_argnames=("hq", "wq", "chunk"))
def squared_edt_window(g2: jnp.ndarray, r0, c0, hq: int, wq: int,
                       chunk: int = 512) -> jnp.ndarray:
    """Exact squared EDT evaluated ONLY on the query window rows
    [r0, r0+hq) x cols [c0, c0+wq); sources span the full frame.

    g2 is the pass-1 squared vertical field (``directional`` /
    ``nearest_seed_dist_1d`` squared), (H, W) or a channel stack
    (C, H, W) -- rows are independent in pass 2, so channels fold into
    the row axis of ONE min-plus scan and share the window. r0/c0 are
    dynamic and must be pre-clipped to [0, H-hq] x [0, W-wq]. Cost
    O(C*hq*wq*W) regardless of how WIDE the field is -- the per-leaf
    grasp fields (grasp_point_selector.py:266,611-628) are consumed
    only inside the leaf bbox, where the banded sweep's band collapses
    to full width exactly when the leaf is isolated; this path's cost
    is set by the bbox instead. Returns the (hq, wq) / (C, hq, wq)
    block(s).
    """
    squeeze = g2.ndim == 2
    if squeeze:
        g2 = g2[None]
    c, h, w = g2.shape
    hq, wq = min(hq, h), min(wq, w)
    big = jnp.float32((h + w) * (h + w))
    r0 = jnp.asarray(r0, jnp.int32)
    c0 = jnp.asarray(c0, jnp.int32)
    g2r = jax.lax.dynamic_slice(g2, (jnp.int32(0), r0, jnp.int32(0)),
                                (c, hq, w)).reshape(c * hq, w)

    n_chunks = -(-w // chunk)
    pad = n_chunks * chunk - w
    g2p = jnp.pad(g2r, ((0, 0), (0, pad)), constant_values=big)
    colp = jnp.pad(jnp.arange(w, dtype=jnp.float32), (0, pad),
                   constant_values=jnp.float32(-10 * w))
    qcols = c0.astype(jnp.float32) + jnp.arange(wq, dtype=jnp.float32)
    blocks = jnp.moveaxis(g2p.reshape(c * hq, n_chunks, chunk), 1, 0)
    colc = colp.reshape(n_chunks, chunk)

    def body(carry, inputs):
        g2_blk, col_blk = inputs                  # (C*hq, Ck), (Ck,)
        off = (qcols[None, :] - col_blk[:, None]) ** 2      # (Ck, wq)
        cand = jnp.min(g2_blk[:, :, None] + off[None, :, :], axis=1)
        return jnp.minimum(carry, cand), None

    init = jnp.full((c * hq, wq), big, jnp.float32)
    d2, _ = jax.lax.scan(body, init, (blocks, colc))
    d2 = d2.reshape(c, hq, wq)
    return d2[0] if squeeze else d2


def squared_edt_window_src(g2: jnp.ndarray, r0, c0, hq: int, wq: int,
                           src_pad: int, chunk: int = 512) -> jnp.ndarray:
    """``squared_edt_window`` with SOURCES restricted to the columns
    [c0 - src_pad, c0 + wq + src_pad) (clipped to the frame).

    EXACT iff every query pixel's true distance is < ``src_pad``
    (1-Lipschitz: the winning source column then lies within the pad).
    The grasp scorer proves this bound before choosing this path: the
    interference fields' exact full-frame maxes are already computed
    (edt_max_argmax_batch), and the leaf-interior field is bounded by
    half the leaf bbox's smaller side. Cost O(C*hq*wq*(wq+2*src_pad))
    vs O(C*hq*wq*W) for the full-source sweep -- the crowded-frame
    win (roadmap item 11c).
    """
    squeeze = g2.ndim == 2
    if squeeze:
        g2 = g2[None]
    c, h, w = g2.shape
    hq, wq = min(hq, h), min(wq, w)
    sw = min(wq + 2 * src_pad, w)
    big = jnp.float32((h + w) * (h + w))
    r0 = jnp.asarray(r0, jnp.int32)
    c0 = jnp.asarray(c0, jnp.int32)
    s0 = jnp.clip(c0 - src_pad, 0, w - sw)
    g2r = jax.lax.dynamic_slice(g2, (jnp.int32(0), r0, s0),
                                (c, hq, sw)).reshape(c * hq, sw)

    n_chunks = -(-sw // chunk)
    pad = n_chunks * chunk - sw
    g2p = jnp.pad(g2r, ((0, 0), (0, pad)), constant_values=big)
    colp = jnp.pad(s0.astype(jnp.float32)
                   + jnp.arange(sw, dtype=jnp.float32), (0, pad),
                   constant_values=jnp.float32(-10 * w))
    qcols = c0.astype(jnp.float32) + jnp.arange(wq, dtype=jnp.float32)
    blocks = jnp.moveaxis(g2p.reshape(c * hq, n_chunks, chunk), 1, 0)
    colc = colp.reshape(n_chunks, chunk)

    def body(carry, inputs):
        g2_blk, col_blk = inputs
        off = (qcols[None, :] - col_blk[:, None]) ** 2
        cand = jnp.min(g2_blk[:, :, None] + off[None, :, :], axis=1)
        return jnp.minimum(carry, cand), None

    init = jnp.full((c * hq, wq), big, jnp.float32)
    d2, _ = jax.lax.scan(body, init, (blocks, colc))
    d2 = d2.reshape(c, hq, wq)
    return d2[0] if squeeze else d2


@functools.partial(jax.jit, static_argnames=("stride", "k", "chunk"))
def edt_max_argmax_batch(g2: jnp.ndarray, stride: int = 16,
                         k: int = 1024, chunk: int = 512,
                         constant_field: jnp.ndarray | None = None):
    """Per-channel exact ``(max, argmax)`` of the EDTs whose pass-1
    squared fields are ``g2``: (C, H, W) -> ((C,) f32, (C,) int32).

    Same sampled-envelope + Lipschitz-refinement method as
    ``edt_max_argmax`` (see there for the exactness argument), but ONE
    shared min-plus scan evaluates all channels' envelopes (rows are
    independent, so channels stack into the row axis), amortizing the
    scan overhead across the union mode's three wide fields
    (dist_outside + the two interference fields,
    grasp_point_selector.py:538,611-617). Seed masks are not needed:
    the constant-field guards derive from g2 (all-seed <=> g2 == 0
    everywhere; seedless <=> no column anywhere holds a seed).

    constant_field: optional (C,) bool -- channels the CALLER knows
    produce a constant field (e.g. seedless interference channels on a
    single-leaf frame, where a shifted-sentinel g2 defeats the derived
    guard). True skips the exact-fallback for that channel; the
    primary branch is exact on constants regardless of top-k ties.
    """
    c, h, w = g2.shape
    g2 = jnp.asarray(g2, jnp.float32)

    js = np.unique(np.concatenate([np.arange(0, w, stride),
                                   [w - 1]])).astype(np.int32)
    ws = int(js.size)
    slack = stride // 2
    jsf = jnp.asarray(js, jnp.float32)
    cols = jnp.arange(w, dtype=jnp.float32)

    # --- shared pass A: envelopes at sampled columns (C*H, ws) ----------
    nc = -(-w // chunk)
    big = jnp.float32((h + w) * (h + w))
    flat = g2.reshape(c * h, w)
    g2p = jnp.pad(flat, ((0, 0), (0, nc * chunk - w)),
                  constant_values=big)
    colp = jnp.pad(cols, (0, nc * chunk - w),
                   constant_values=jnp.float32(-10 * w))
    blocks = jnp.moveaxis(g2p.reshape(c * h, nc, chunk), 1, 0)
    colc = colp.reshape(nc, chunk)

    def body(carry, inputs):
        g2_blk, col_blk = inputs
        off = (jsf[:, None] - col_blk[None, :]) ** 2
        cand = jnp.min(g2_blk[:, None, :] + off[None, :, :], axis=-1)
        return jnp.minimum(carry, cand), None

    init = jnp.full((c * h, ws), big, jnp.float32)
    d2s, _ = jax.lax.scan(body, init, (blocks, colc))
    ds = jnp.sqrt(d2s).reshape(c, h, ws)

    # --- per-channel coverage check + refinement / exact fallback -------
    win = jnp.arange(-slack, slack + 1, dtype=jnp.int32)
    jsi = jnp.asarray(js, jnp.int32)
    maxes, argmaxes = [], []
    for ci in range(c):
        dsc = ds[ci]
        g2c = g2[ci]
        m_low = jnp.max(dsc)
        kth_bound, flat_idx, exhaustive = _tile_candidates(dsc, k)
        if exhaustive:
            covered = jnp.bool_(True)
        else:
            covered = kth_bound < m_low - (slack + 0.01)
            # constant fields (seedless / all-seed) are exact in the
            # primary branch regardless of which ties the tile
            # selection kept
            seedless = ~jnp.any(g2c < big)
            all_seed = ~jnp.any(g2c > 0)
            covered = covered | seedless | all_seed
            if constant_field is not None:
                covered = covered | constant_field[ci]

        def refined(_, dsc=dsc, g2c=g2c, flat_idx=flat_idx):
            rows = flat_idx // ws
            scols = jsi[flat_idx % ws]
            jwin = jnp.clip(scols[:, None] + win[None, :], 0, w - 1)
            g2rows = jnp.take(g2c, rows, axis=0)
            offr = (jwin[:, :, None].astype(jnp.float32)
                    - cols[None, None, :]) ** 2
            d2r = jnp.min(g2rows[:, None, :] + offr, axis=-1)
            dr = jnp.sqrt(d2r)
            mx = jnp.max(dr)
            flat_pix = rows[:, None] * w + jwin
            amax = jnp.min(jnp.where(dr == mx, flat_pix,
                                     jnp.int32(h * w)))
            return mx, amax.astype(jnp.int32)

        def full_sweep(_, g2c=g2c):
            d = jnp.sqrt(squared_edt_full(
                jnp.zeros((h, w), bool), g2=g2c))
            return jnp.max(d), jnp.argmax(d).astype(jnp.int32)

        mx, am = jax.lax.cond(covered, refined, full_sweep, operand=None)
        maxes.append(mx)
        argmaxes.append(am)
    return jnp.stack(maxes), jnp.stack(argmaxes)


def signed_edt(mask: jnp.ndarray, chunk: int = 128) -> jnp.ndarray:
    """Signed distance field: positive inside `mask`, negative outside.

    Matches the reference's ``dist_inside - dist_outside`` construction
    (grasp_point_selector.py:529-531).
    """
    mask = jnp.asarray(mask, dtype=bool)
    dist_inside = edt(~mask, chunk=chunk)   # distance to nearest 0-pixel
    dist_outside = edt(mask, chunk=chunk)   # distance to nearest 1-pixel
    return jnp.where(mask, dist_inside, -dist_outside)
