"""Single-frame spatial parallelism: image rows sharded across chips.

SURVEY.md 5.7: the reference has no sequence models, so "context
parallelism" maps to spatial extent -- shard the 1080-row frame across
the mesh's data axis and keep all cross-device movement on ICI
collectives.  The EDT decomposes cleanly:

* pass 1 (per-column distance to the nearest seed) is an associative
  scan along rows -> local scans + one ``all_gather`` of per-shard
  boundary summaries (the classic two-level scan);
* pass 2 (the min-plus parabola sweep) is ROW-LOCAL -> embarrassingly
  parallel across shards;
* morphology row-shifts exchange a <= kernel/2-row halo via ppermute
  semantics (expressed with all_gather of the thin boundary strips).

Everything is expressed with ``shard_map`` so XLA emits the collectives.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

__all__ = ["sharded_nearest_seed_rows", "sharded_squared_edt",
           "sharded_edt", "sharded_shift_rows"]


def _local_nearest_above(seeds, row0):
    """Distance to nearest seed at-or-above within the shard, plus the
    per-column index of the shard's last seed (global coords)."""
    n = seeds.shape[0]
    idx = jax.lax.broadcasted_iota(jnp.int32, seeds.shape, 0) + row0
    before = jnp.where(seeds, idx, jnp.int32(-1))
    before = jax.lax.associative_scan(jnp.maximum, before, axis=0)
    return before  # (rows, W) global index of nearest seed at-or-above


def _local_nearest_below(seeds, row0):
    n = seeds.shape[0]
    big = jnp.int32(2 ** 30)
    idx = jax.lax.broadcasted_iota(jnp.int32, seeds.shape, 0) + row0
    after = jnp.where(seeds, idx, big)
    after = jax.lax.associative_scan(jnp.minimum, after, axis=0,
                                     reverse=True)
    return after


def sharded_nearest_seed_rows(seeds: jnp.ndarray, mesh: Mesh,
                              axis: str = "data") -> jnp.ndarray:
    """Vertical nearest-seed distance with rows sharded over `axis`.

    Two-level scan: local associative scans + all_gather of each shard's
    boundary summary (one (W,) vector per shard over ICI).
    """
    h, w = seeds.shape
    n_shards = mesh.shape[axis]
    assert h % n_shards == 0, "rows must divide the mesh axis"
    rows_per = h // n_shards
    big = jnp.int32(2 ** 30)

    def body(local_seeds):
        shard = jax.lax.axis_index(axis)
        row0 = shard * rows_per

        before_local = _local_nearest_above(local_seeds, row0)
        after_local = _local_nearest_below(local_seeds, row0)

        # shard summaries: nearest seed at-or-above the shard's last row /
        # at-or-below the shard's first row (global indices)
        last_above = before_local[-1]            # (W,)
        first_below = after_local[0]             # (W,)

        all_last = jax.lax.all_gather(last_above, axis)    # (S, W)
        all_first = jax.lax.all_gather(first_below, axis)  # (S, W)

        # exclusive combine over preceding shards (above direction)
        shard_ids = jax.lax.broadcasted_iota(jnp.int32, all_last.shape, 0)
        prev_mask = shard_ids < shard
        carry_above = jnp.max(jnp.where(prev_mask, all_last, -1), axis=0)
        next_mask = shard_ids > shard
        carry_below = jnp.min(jnp.where(next_mask, all_first, big),
                              axis=0)

        before = jnp.maximum(before_local, carry_above[None, :])
        after = jnp.minimum(after_local, carry_below[None, :])

        rows = jax.lax.broadcasted_iota(jnp.int32, local_seeds.shape, 0) \
            + row0
        sentinel = jnp.int32(h + w)
        d_above = jnp.where(before >= 0, rows - before, sentinel)
        d_below = jnp.where(after < big, after - rows, sentinel)
        return jnp.minimum(d_above, d_below)

    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return fn(jnp.asarray(seeds, bool))


def sharded_squared_edt(seeds: jnp.ndarray, mesh: Mesh,
                        axis: str = "data", chunk: int = 128
                        ) -> jnp.ndarray:
    """Exact squared EDT with rows sharded: two-level scan pass 1 + the
    row-local min-plus pass 2 running independently per shard."""
    h, w = seeds.shape
    g = sharded_nearest_seed_rows(seeds, mesh, axis).astype(jnp.float32)
    g2 = g * g

    def pass2(local_g2):
        # row-local: reuse the single-device pass 2 on the shard's rows
        cols = jnp.arange(w, dtype=jnp.float32)
        n_chunks = -(-w // chunk)
        pad = n_chunks * chunk - w
        big = jnp.float32((h + w) * (h + w))
        g2p = jnp.pad(local_g2, ((0, 0), (0, pad)), constant_values=big)
        colp = jnp.pad(cols, (0, pad),
                       constant_values=jnp.float32(-10 * w))
        g2c = jnp.moveaxis(g2p.reshape(local_g2.shape[0], n_chunks, chunk),
                           1, 0)
        colc = colp.reshape(n_chunks, chunk)

        def body(carry, inputs):
            g2_blk, col_blk = inputs
            off = (cols[None, :] - col_blk[:, None]) ** 2
            cand = jnp.min(g2_blk[:, :, None] + off[None, :, :], axis=1)
            return jnp.minimum(carry, cand), None

        # derive the carry from the (axis-varying) input so shard_map's
        # varying-axis typing matches between carry in/out
        init = jnp.full_like(local_g2, big)
        d2, _ = jax.lax.scan(body, init, (g2c, colc))
        return d2

    fn = shard_map(pass2, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return fn(g2)


def sharded_edt(seeds: jnp.ndarray, mesh: Mesh, axis: str = "data",
                chunk: int = 128) -> jnp.ndarray:
    return jnp.sqrt(sharded_squared_edt(seeds, mesh, axis, chunk))


def sharded_shift_rows(arr: jnp.ndarray, dy: int, fill, mesh: Mesh,
                       axis: str = "data") -> jnp.ndarray:
    """Row shift with cross-shard halo (for sharded morphology):
    out[y] = arr[y + dy], `fill` rows out of bounds. |dy| must be <= the
    per-shard row count."""
    h, w = arr.shape
    n_shards = mesh.shape[axis]
    rows_per = h // n_shards
    assert abs(dy) <= rows_per

    def body(local):
        shard = jax.lax.axis_index(axis)
        # exchange boundary strips with neighbors via collective permute
        if dy > 0:
            # need the first dy rows of the shard below
            strip = local[:dy]
            recv = jax.lax.ppermute(
                strip, axis,
                [(s, s - 1) for s in range(1, n_shards)])
            # bottom shard has no donor -> fill
            is_last = shard == n_shards - 1
            recv = jnp.where(is_last, jnp.full_like(recv, fill), recv)
            return jnp.concatenate([local[dy:], recv], axis=0)
        if dy < 0:
            strip = local[dy:]
            recv = jax.lax.ppermute(
                strip, axis,
                [(s, s + 1) for s in range(n_shards - 1)])
            is_first = shard == 0
            recv = jnp.where(is_first, jnp.full_like(recv, fill), recv)
            return jnp.concatenate([recv, local[:dy]], axis=0)
        return local

    fn = shard_map(body, mesh=mesh, in_specs=P(axis, None),
                   out_specs=P(axis, None))
    return fn(arr)
