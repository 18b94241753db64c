"""Pallas TPU kernel for the EDT min-plus pass.

Pass 2 of the exact EDT (see ops/edt.py):
    D2[i, j] = min_{j'} ( G2[i, j'] + (j - j')^2 )
is a min-plus contraction along the row axis.  The pure-JAX version
scans chunk-wise through HBM; this kernel keeps each 8-row stripe of G2
resident in VMEM and walks the 128-column candidate chunks with a
``fori_loop``, so every output tile costs one HBM read of its stripe.

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

__all__ = ["squared_edt_pass2", "edt_pallas", "edt_batch_pallas"]

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
