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

import jax
import jax.numpy as jnp

__all__ = ["nearest_seed_dist_1d", "squared_edt", "edt", "signed_edt"]


def nearest_seed_dist_1d(seeds: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """1D distance (in pixels) along `axis` to the nearest True seed.

    Uses running-max of seed indices in both directions via
    ``lax.associative_scan`` -> O(log n) depth, no host loop.
    Positions with no seed anywhere along the line get a large finite
    sentinel (n_axis0 + n_axis1), which squares safely in float32.
    """
    seeds = jnp.asarray(seeds, dtype=bool)
    n = seeds.shape[axis]
    big = jnp.int32(sum(seeds.shape))  # > any achievable pixel distance

    idx_shape = [1] * seeds.ndim
    idx_shape[axis] = n
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

    return jnp.minimum(d_before, d_after)


@functools.partial(jax.jit, static_argnames=("chunk",))
def squared_edt(seeds: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Exact squared L2 distance from every pixel to the nearest True seed.

    seeds : (H, W) bool. Returns (H, W) float32. Pixels on a seed -> 0.
    If no seed exists the result is a large finite sentinel everywhere.
    """
    seeds = jnp.asarray(seeds, dtype=bool)
    h, w = seeds.shape

    # Pass 1: per-column vertical distances.
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


def edt(seeds: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Exact L2 distance to the nearest True seed. (H, W) float32."""
    return jnp.sqrt(squared_edt(seeds, chunk=chunk))


def edt_batch(seeds: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Exact L2 EDT over a (C, H, W) batch of seed masks in one fused
    program (the grasp scorer needs 4 fields per frame; batching them
    amortizes pass-2's scan)."""
    import functools as _ft
    f = _ft.partial(squared_edt, chunk=chunk)
    return jnp.sqrt(jax.vmap(f)(jnp.asarray(seeds, bool)))


def signed_edt(mask: jnp.ndarray, chunk: int = 512) -> jnp.ndarray:
    """Signed distance field: positive inside `mask`, negative outside.

    Matches the reference's ``dist_inside - dist_outside`` construction
    (grasp_point_selector.py:529-531).
    """
    mask = jnp.asarray(mask, dtype=bool)
    dist_inside = edt(~mask, chunk=chunk)   # distance to nearest 0-pixel
    dist_outside = edt(mask, chunk=chunk)   # distance to nearest 1-pixel
    return jnp.where(mask, dist_inside, -dist_outside)
