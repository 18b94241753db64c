#!/usr/bin/env python3
"""Substage split of edt_max_argmax_batch (the 11.6 ms envelope stage).

PERF.md's stage table shows the 3-channel envelope-max pass as the
largest standalone stage; 11b's stride/k ladder measured FLAT, so the
binding substage is unknown. This times, interleaved in one process:

  A. pass-A min-plus scan alone (the (C*H, ws) envelope)
  B. _tile_candidates alone (tile-max + top_k), per channel
  C. refinement alone (top-k window min-plus), per channel
  D. the full edt_max_argmax_batch
  E. leaf_stats (for the median-rounds question), plus a
     reduced-rounds bisection variant's cost shape

plus the same with k=512 and stride=16 so the ladder story can be
re-checked at substage grain.

Run on the chip: python tools/micro_bench_envelope.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import functools
import numpy as np
import jax
import jax.numpy as jnp


def timeit(fn, n=30):
    """Dispatch n, fetch last (the only honest barrier on axon)."""
    np.asarray(jax.tree.leaves(fn())[0])        # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        res = None
        for _ in range(n):
            res = fn()
        np.asarray(jax.tree.leaves(res)[0])
        best = min(best, (time.perf_counter() - t0) / n)
    return best * 1e3


def main():
    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.ops.edt import (directional_seed_dist_1d,
                                       edt_max_argmax_batch,
                                       _tile_candidates)
    from leafgrasp_tpu.ops.morphology import (dilated_vertical_dist_multi,
                                              elliptical_kernel)
    from leafgrasp_tpu.ops.components import leaf_stats

    cfg = DEFAULT_CONFIG
    h, w = cfg.frame.height, cfg.frame.width
    mask, depth = make_leaf_scene(h, w, num_leaves=12, seed=3, margin=60)
    mask = jnp.asarray(mask)
    m = mask == 5
    other = (mask > 0) & ~m

    @jax.jit
    def build_g2(m, other):
        d3u, d3d = directional_seed_dist_1d(jnp.stack([~m, m, other]),
                                            axis=1)
        g = jnp.minimum(d3u[:2], d3d[:2]).astype(jnp.float32)
        gc, gw = (x.astype(jnp.float32) for x in
                  dilated_vertical_dist_multi(
                      d3u[2], d3d[2],
                      (elliptical_kernel(cfg.grasp.isolation_close_kernel),
                       elliptical_kernel(cfg.grasp.isolation_wide_kernel))))
        return jnp.stack([g[1] * g[1], gc * gc, gw * gw])

    g2 = jax.jit(build_g2)(m, other)
    g2.block_until_ready()
    _ = np.asarray(g2[0, 0, 0])

    # ---- A: pass-A scan alone ------------------------------------------
    def make_pass_a(stride, chunk=512):
        js = np.unique(np.concatenate([np.arange(0, w, stride),
                                       [w - 1]])).astype(np.int32)
        jsf = jnp.asarray(js, jnp.float32)
        ws = int(js.size)

        @jax.jit
        def pass_a(g2):
            c = g2.shape[0]
            nc = -(-w // chunk)
            big = jnp.float32((h + w) * (h + w))
            flat = g2.reshape(c * h, w)
            g2p = jnp.pad(flat, ((0, 0), (0, nc * chunk - w)),
                          constant_values=big)
            colp = jnp.pad(jnp.arange(w, dtype=jnp.float32),
                           (0, nc * chunk - w),
                           constant_values=jnp.float32(-10 * w))
            blocks = jnp.moveaxis(g2p.reshape(c * h, nc, chunk), 1, 0)
            colc = colp.reshape(nc, chunk)

            def body(carry, inputs):
                g2_blk, col_blk = inputs
                off = (jsf[:, None] - col_blk[None, :]) ** 2
                cand = jnp.min(g2_blk[:, None, :] + off[None, :, :],
                               axis=-1)
                return jnp.minimum(carry, cand), None

            init = jnp.full((c * h, ws), big, jnp.float32)
            d2s, _ = jax.lax.scan(body, init, (blocks, colc))
            return jnp.sqrt(d2s).reshape(c, h, ws)

        return pass_a, ws

    for stride in (8, 16):
        pass_a, ws = make_pass_a(stride)
        t_a = timeit(lambda: pass_a(g2))
        print(f"A. pass-A scan stride={stride} (ws={ws}): {t_a:.2f} ms",
              flush=True)
        ds = pass_a(g2)

        for k in (2048, 512):
            tile_fn = jax.jit(functools.partial(
                lambda d, k: _tile_candidates(d, k)[:2], k=k))
            t_b = timeit(lambda: tile_fn(ds[0]))
            print(f"B. tile_candidates k={k} x1ch: {t_b:.2f} ms",
                  flush=True)

    # ---- D: the full batch call, stock vs variants ---------------------
    cf = jnp.array([False, False, False])
    stock = jax.jit(lambda g: edt_max_argmax_batch(g, constant_field=cf))
    t_d = timeit(lambda: stock(g2))
    print(f"D. edt_max_argmax_batch stock (stride 8, k 2048): "
          f"{t_d:.2f} ms", flush=True)
    v512 = jax.jit(lambda g: edt_max_argmax_batch(g, k=512,
                                                  constant_field=cf))
    t_d5 = timeit(lambda: v512(g2))
    print(f"D. edt_max_argmax_batch k=512: {t_d5:.2f} ms", flush=True)
    v16 = jax.jit(lambda g: edt_max_argmax_batch(g, stride=16, k=512,
                                                 constant_field=cf))
    t_d16 = timeit(lambda: v16(g2))
    print(f"D. edt_max_argmax_batch stride=16 k=512: {t_d16:.2f} ms",
          flush=True)
    s1 = np.asarray(stock(g2)[0])
    s2 = np.asarray(v512(g2)[0])
    s3 = np.asarray(v16(g2)[0])
    print(f"   maxes agree: {np.allclose(s1, s2)} {np.allclose(s1, s3)}",
          flush=True)

    # ---- E: leaf_stats and its median rounds ---------------------------
    dep = jnp.asarray(depth)
    ls = jax.jit(functools.partial(leaf_stats, max_leaves=8))
    t_e = timeit(lambda: ls(mask, dep, jnp.float32(707.9),
                            jnp.float32(494.1), jnp.float32(1750.7)))
    print(f"E. leaf_stats (18-round bisection medians): {t_e:.2f} ms",
          flush=True)


if __name__ == "__main__":
    main()
