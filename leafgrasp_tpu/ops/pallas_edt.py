"""Pallas TPU kernels for the EDT min-plus pass.

Pass 2 of the exact EDT (see ops/edt.py):
    D2[i, j] = min_{j'} ( G2[i, j'] + (j - j')^2 )
is a min-plus contraction along the row axis.  Two kernels:

* ``squared_edt_pass2`` -- full O(W^2) sweep: each 8-row stripe of G2
  stays resident in VMEM and a ``fori_loop`` walks every 128-column
  candidate chunk (the original kernel; kept as the grid/layout
  baseline).
* ``squared_edt_pass2_banded`` -- PER-TILE banded sweep: a cheap JAX
  prepass computes, for every (8, 128) output tile, the chunk radius
  that provably contains its nearest seeds (same upper-bound argument
  as ops/edt.squared_edt, but per tile instead of per frame); the
  radii are scalar-prefetched into SMEM and each tile's ``fori_loop``
  visits only [t - nb, t + nb].  Near-seed tiles (most of a leaf
  frame) do 1-3 chunk passes instead of W/128.

Grid: (C, H/8, W/128); block = full-width stripe (1, 8, Wp) in VMEM.
Wp (width padded to a lane multiple) stays < 2k columns -> stripe is
8 * Wp * 4B < 64 KB, far under the ~16 MB VMEM budget.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["squared_edt_pass2", "squared_edt_pass2_banded",
           "squared_edt_rowband", "edt_batch_rowband", "edt_pallas",
           "edt_batch_pallas"]

_ROWS = 8      # f32 sublane tile
_COLS = 128    # lane tile


def _pass2_kernel(g2_ref, out_ref):
    """g2_ref: (1, 8, Wp) stripe; out_ref: (1, 8, 128) tile."""
    j_tile = pl.program_id(2)
    wp = g2_ref.shape[2]
    n_chunks = wp // _COLS

    out_cols = (j_tile * _COLS
                + jax.lax.broadcasted_iota(jnp.int32, (_COLS, _COLS), 0)
                ).astype(jnp.float32)

    def body(c, acc):
        g2_chunk = g2_ref[0, :, pl.ds(c * _COLS, _COLS)]       # (8, C)
        in_cols = (c * _COLS
                   + jax.lax.broadcasted_iota(jnp.int32, (_COLS, _COLS),
                                              1)).astype(jnp.float32)
        off = (out_cols - in_cols) ** 2                        # (out, in)
        cand = jnp.min(g2_chunk[:, None, :] + off[None, :, :], axis=2)
        return jnp.minimum(acc, cand)

    init = jnp.full((_ROWS, _COLS), jnp.float32(jnp.inf))
    out_ref[0, :, :] = jax.lax.fori_loop(0, n_chunks, body, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def squared_edt_pass2(g2: jnp.ndarray, interpret: bool = False
                      ) -> jnp.ndarray:
    """(C, H, W) per-column squared distances -> exact squared EDT."""
    c, h, w = g2.shape
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _COLS) * _COLS
    big = jnp.float32((h + w) * (h + w))
    g2p = jnp.pad(g2, ((0, 0), (0, hp - h), (0, wp - w)),
                  constant_values=big)

    out = pl.pallas_call(
        _pass2_kernel,
        grid=(c, hp // _ROWS, wp // _COLS),
        in_specs=[pl.BlockSpec((1, _ROWS, wp),
                               lambda ci, i, j: (ci, i, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, _ROWS, _COLS),
                               lambda ci, i, j: (ci, i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(g2p)
    return out[:, :h, :w]


def _banded_kernel(nb_ref, g2_ref, out_ref, *, n_chunks: int,
                   n_row_tiles: int):
    """Per-tile banded min-plus: nb_ref holds the chunk radius for every
    (channel, row-tile, col-tile), flattened; the loop visits only the
    chunks whose candidates can win for this tile."""
    ci = pl.program_id(0)
    i = pl.program_id(1)
    t = pl.program_id(2)
    nb = nb_ref[(ci * n_row_tiles + i) * n_chunks + t]
    lo = jnp.maximum(t - nb, 0)
    hi = jnp.minimum(t + nb, n_chunks - 1)

    out_cols = (t * _COLS
                + jax.lax.broadcasted_iota(jnp.int32, (_COLS, _COLS), 0)
                ).astype(jnp.float32)
    in_iota = jax.lax.broadcasted_iota(jnp.int32, (_COLS, _COLS), 1)

    def body(c, acc):
        g2_chunk = g2_ref[0, :, pl.ds(c * _COLS, _COLS)]       # (8, C)
        in_cols = (c * _COLS + in_iota).astype(jnp.float32)
        off = (out_cols - in_cols) ** 2                        # (out, in)
        cand = jnp.min(g2_chunk[:, None, :] + off[None, :, :], axis=2)
        return jnp.minimum(acc, cand)

    init = jnp.full((_ROWS, _COLS), jnp.float32(jnp.inf))
    out_ref[0, :, :] = jax.lax.fori_loop(lo, hi + 1, body, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def squared_edt_pass2_banded(g2: jnp.ndarray, interpret: bool = False
                             ) -> jnp.ndarray:
    """(C, H, W) per-column squared distances -> exact squared EDT,
    visiting only the per-tile chunk band.

    Exactness (per tile): U[p] = min over sparse shifts d of
    g2[p + d] + d^2 is a pointwise upper bound built from true
    candidates, and each witness shift satisfies |d| <= sqrt(U) (since
    U >= d^2).  Any candidate farther than B_t = max over the tile of
    sqrt(U) costs more than B_t^2 >= U >= D2 from its column offset
    alone, so chunks beyond ceil(B_t / 128) + 1 can never win.
    """
    c, h, w = g2.shape
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _COLS) * _COLS
    big = jnp.float32((h + w) * (h + w))
    g2p = jnp.pad(g2, ((0, 0), (0, hp - h), (0, wp - w)),
                  constant_values=big)

    # --- per-tile band radii from sparse-shift upper bounds --------------
    upper = g2p
    for delta in (1, 4, 16, 64, 256, 1024):
        if delta >= w:
            break
        d2 = jnp.float32(delta * delta)
        shift_p = jnp.pad(g2p[:, :, delta:], ((0, 0), (0, 0), (0, delta)),
                          constant_values=big) + d2
        shift_m = jnp.pad(g2p[:, :, :-delta], ((0, 0), (0, 0), (delta, 0)),
                          constant_values=big) + d2
        upper = jnp.minimum(upper, jnp.minimum(shift_p, shift_m))
    n_row_tiles = hp // _ROWS
    n_chunks = wp // _COLS
    tile_max = jnp.max(upper.reshape(c, n_row_tiles, _ROWS,
                                     n_chunks, _COLS), axis=(2, 4))
    nb = jnp.minimum(
        (jnp.sqrt(tile_max) / _COLS).astype(jnp.int32) + 1,
        n_chunks - 1).reshape(-1)                     # (c*rt*nc,) int32

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, n_row_tiles, n_chunks),
        in_specs=[pl.BlockSpec((1, _ROWS, wp),
                               lambda ci, i, j, nb_ref: (ci, i, 0))],
        out_specs=pl.BlockSpec((1, _ROWS, _COLS),
                               lambda ci, i, j, nb_ref: (ci, i, j)),
    )
    out = pl.pallas_call(
        functools.partial(_banded_kernel, n_chunks=n_chunks,
                          n_row_tiles=n_row_tiles),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(nb, g2p)
    return out[:, :h, :w]


def _rowband_kernel(nb_ref, g2r_ref, out_ref, *, hp: int):
    """Row-major min-plus: for an (8, 128) output tile, walk the banded
    range of input ROWS; each step is a sublane broadcast + two VPU ops
    on a native (8, 128) vreg -- no lane reductions, no transposes.

    g2r_ref: (1, Hp, 128) column stripe (resident across the row-tile
    loop); nb_ref: per-tile row radius (flattened, grid order)."""
    ci = pl.program_id(0)
    jc = pl.program_id(1)
    ir = pl.program_id(2)
    n_col_tiles = pl.num_programs(1)
    n_row_tiles = pl.num_programs(2)
    nb = nb_ref[(ci * n_col_tiles + jc) * n_row_tiles + ir]

    row_base = ir * _ROWS
    # visit whole 8-row blocks (supersets of true candidates are always
    # exact); one dynamic slice + 8 static sublane broadcasts per block
    # amortizes the loop overhead that dominated a row-at-a-time loop.
    lo_blk = jnp.maximum(row_base - nb, 0) // _ROWS
    hi_blk = jnp.minimum(row_base + _ROWS - 1 + nb, hp - 1) // _ROWS

    out_rows = (row_base
                + jax.lax.broadcasted_iota(jnp.int32, (_ROWS, _COLS), 0)
                ).astype(jnp.float32)

    def body(b, acc):
        r0 = b * _ROWS
        blk = g2r_ref[0, pl.ds(r0, _ROWS), :]               # (8, 128)
        r0f = r0.astype(jnp.float32)
        for k in range(_ROWS):
            row = blk[k:k + 1, :]                           # (1, 128)
            off = (out_rows - (r0f + k)) ** 2
            acc = jnp.minimum(acc, row + off)
        return acc

    init = jnp.full((_ROWS, _COLS), jnp.float32(jnp.inf))
    out_ref[0, :, :] = jax.lax.fori_loop(lo_blk, hi_blk + 1, body, init)


@functools.partial(jax.jit, static_argnames=("interpret",))
def squared_edt_rowband(g2r: jnp.ndarray, interpret: bool = False
                        ) -> jnp.ndarray:
    """(C, H, W) per-ROW squared distances -> exact squared EDT.

    The min-plus runs along the row (sublane) axis:
        D2[i, j] = min_{i'} ( G2r[i', j] + (i - i')^2 ),
    so each candidate row is one native (8, 128) broadcast-add-min --
    the layout XLA's fused reduce uses, but with a PER-TILE row band
    (the same upper-bound argument as squared_edt_pass2_banded, along
    rows) instead of a frame-global one.
    """
    c, h, w = g2r.shape
    hp = -(-h // _ROWS) * _ROWS
    wp = -(-w // _COLS) * _COLS
    big = jnp.float32((h + w) * (h + w))
    g2p = jnp.pad(g2r, ((0, 0), (0, hp - h), (0, wp - w)),
                  constant_values=big)

    # --- per-tile row-band radii from a COARSE min-plus upper bound ------
    # Pool g2r to 8-row blocks (min keeps each value a true candidate)
    # and solve the min-plus at 1/8 row resolution with a +1-block slack
    # in the offset: for a candidate row i* in block I',
    # |i - i*| <= 8(|I - I'| + 1) for any output row i in block I, so
    # U[I, j] = min_I' g2c[I', j] + (8(|I-I'|+1))^2 >= D2[i, j]
    # pointwise.  Any pointwise upper bound gives an exact band: the
    # argmin row i* satisfies (i - i*)^2 <= D2 <= U <= nb^2.
    # This bound tracks the true distance to within ~8 rows, unlike a
    # sparse shift ladder whose gaps inflate nb by up to the gap ratio.
    n_row_tiles = hp // _ROWS
    n_col_tiles = wp // _COLS
    g2c = jnp.min(g2p.reshape(c, n_row_tiles, _ROWS, wp), axis=2)
    blk_idx = jnp.arange(n_row_tiles, dtype=jnp.int32)
    offc = (jnp.abs(blk_idx[:, None] - blk_idx[None, :]) + 1) * _ROWS
    offc = (offc * offc).astype(jnp.float32)           # (rt, rt)
    upper_c = jnp.min(g2c[:, None, :, :] + offc[None, :, :, None],
                      axis=2)                          # (c, rt, wp)
    tile_max = jnp.max(upper_c.reshape(c, n_row_tiles,
                                       n_col_tiles, _COLS), axis=3)
    nb = jnp.minimum(jnp.sqrt(tile_max).astype(jnp.int32) + 1,
                     hp)                               # (c, rt, ct) rows
    nb = jnp.transpose(nb, (0, 2, 1)).reshape(-1)      # grid (ci, jc, ir)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(c, n_col_tiles, n_row_tiles),
        in_specs=[pl.BlockSpec((1, hp, _COLS),
                               lambda ci, jc, ir, nb_ref: (ci, 0, jc))],
        out_specs=pl.BlockSpec((1, _ROWS, _COLS),
                               lambda ci, jc, ir, nb_ref: (ci, ir, jc)),
    )
    out = pl.pallas_call(
        functools.partial(_rowband_kernel, hp=hp),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((c, hp, wp), jnp.float32),
        interpret=interpret,
    )(nb, g2p)
    return out[:, :h, :w]


def edt_batch_rowband(seeds: jnp.ndarray,
                      interpret: bool | None = None) -> jnp.ndarray:
    """Exact L2 EDT over (C, H, W) seed masks via the row-banded Pallas
    kernel (pass 1 = horizontal associative scans)."""
    from leafgrasp_tpu.ops.edt import nearest_seed_dist_1d
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    seeds = jnp.asarray(seeds, bool)
    squeeze = seeds.ndim == 2
    if squeeze:
        seeds = seeds[None]
    # Horizontal 1D distances via a scan over the SUBLANE axis of the
    # transposed layout: lane-axis associative scans measured ~8x slower
    # than sublane-axis ones; two transposes cost far less.
    g = nearest_seed_dist_1d(jnp.swapaxes(seeds, 1, 2), axis=1)
    g = jnp.swapaxes(g, 1, 2).astype(jnp.float32)
    d = jnp.sqrt(squared_edt_rowband(g * g, interpret=interpret))
    return d[0] if squeeze else d


def edt_pallas(seeds: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """Exact L2 EDT of a (H, W) or (C, H, W) seed mask via the Pallas
    pass-2 kernel (pass 1 stays as log-depth associative scans)."""
    from leafgrasp_tpu.ops.edt import nearest_seed_dist_1d
    seeds = jnp.asarray(seeds, bool)
    squeeze = seeds.ndim == 2
    if squeeze:
        seeds = seeds[None]
    g = jax.vmap(lambda s: nearest_seed_dist_1d(s, axis=0))(seeds)
    g = g.astype(jnp.float32)
    d2 = squared_edt_pass2(g * g, interpret=interpret)
    d = jnp.sqrt(d2)
    return d[0] if squeeze else d


def edt_batch_pallas(seeds: jnp.ndarray,
                     interpret: bool = False) -> jnp.ndarray:
    return edt_pallas(seeds, interpret=interpret)
