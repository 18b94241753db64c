#!/usr/bin/env python3
"""Fresh per-stage budget of the frame program (r2b refresh of the
PERF.md stage table, whose rows are r1-era measurements).

Times standalone jits of each stage on the crowded bench scene,
interleaved in one process; the full frame programs (parity + enhanced,
CNN on) anchor the totals. Stage numbers are STANDALONE costs: inside
the fused frame program XLA overlaps/fuses some of this work, so
stages sum to >= the program total.

Run on the chip: python tools/micro_bench_stages.py
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


def main():
    from leafgrasp_tpu.config import DEFAULT_CONFIG, GraspScoringConfig
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf
    from leafgrasp_tpu.geometry.grasp_scorer import compute_grasp_scores
    from leafgrasp_tpu.ops.pca import min_area_rect
    from leafgrasp_tpu.ops.edt import (directional_seed_dist_1d,
                                       nearest_seed_dist_1d,
                                       edt_max_argmax_batch,
                                       squared_edt_window)
    from leafgrasp_tpu.ops.components import leaf_stats
    from leafgrasp_tpu.ops.morphology import (dilated_vertical_dist,
                                              elliptical_kernel)
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn

    cfg = DEFAULT_CONFIG
    h, w = cfg.frame.height, cfg.frame.width
    cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)
    mask, depth = make_leaf_scene(h, w, num_leaves=12, seed=3, margin=60)
    ids = np.unique(mask); ids = ids[ids > 0]
    areas = [(mask == i).sum() for i in ids]
    leaf = mask == ids[int(np.argmax(areas))]
    other = (mask > 0) & ~leaf
    md = jax.device_put(mask)
    dd = jax.device_put(depth)
    ld = jax.device_put(leaf)
    od = jax.device_put(other)
    ad = jax.device_put(mask > 0)
    kc = elliptical_kernel(cfg.grasp.isolation_close_kernel)
    kw_ = elliptical_kernel(cfg.grasp.isolation_wide_kernel)

    def t(name, fn, *args, n=25):
        r = fn(*args)
        jax.tree.map(np.asarray, r)
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            rs = [fn(*args) for _ in range(n)]
            np.asarray(jax.tree.leaves(rs[-1])[0])
            best = min(best, (time.perf_counter() - t0) / n)
        print(f"{name:44s} {best*1e3:7.2f} ms")
        return best

    @jax.jit
    def stage_leaf_stats(m, d):
        return leaf_stats(m, d, cfg.frame.max_leaves, cx, cy, f)

    @jax.jit
    def stage_leaf_select(m, d):
        return select_optimal_leaf(m, d, cx, cy, f, cfg.leaf, cfg.frame)

    @jax.jit
    def stage_orientation(lm):
        return min_area_rect(lm)

    @jax.jit
    def stage_pass1(lm):
        g = nearest_seed_dist_1d(jnp.stack([~lm, lm]), axis=1)
        return g.sum()

    @jax.jit
    def stage_dvd(o):
        du, dn = directional_seed_dist_1d(o, axis=0)
        gc = dilated_vertical_dist(du, dn, kc)
        gw = dilated_vertical_dist(du, dn, kw_)
        return gc.sum() + gw.sum()

    @jax.jit
    def stage_env_maxes(lm, o):
        du, dn = directional_seed_dist_1d(o, axis=0)
        gc = dilated_vertical_dist(du, dn, kc).astype(jnp.float32)
        gw = dilated_vertical_dist(du, dn, kw_).astype(jnp.float32)
        g = nearest_seed_dist_1d(lm, axis=1).astype(jnp.float32)
        mx, _ = edt_max_argmax_batch(
            jnp.stack([g * g, gc * gc, gw * gw]))
        return mx

    @jax.jit
    def stage_window(lm):
        g = nearest_seed_dist_1d(jnp.stack([~lm, lm]),
                                 axis=1).astype(jnp.float32)
        rows = jnp.any(lm, axis=1)
        cols = jnp.any(lm, axis=0)
        r0 = jnp.clip(jnp.argmax(rows).astype(jnp.int32), 0, h - 320)
        c0 = jnp.clip(jnp.argmax(cols).astype(jnp.int32), 0, w - 320)
        return squared_edt_window(g * g, r0, c0, 320, 320).sum()

    @functools.partial(jax.jit, static_argnames=("mode",))
    def stage_scores(lm, am, d, mode):
        g = GraspScoringConfig(isolation_context=mode)
        return compute_grasp_scores(lm, am, d, cx, cy, f, cfg=g)

    _, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    variables = jax.device_put(variables)
    fn_par = make_frame_fn(cfg.replace(grasp=GraspScoringConfig(
        isolation_context="reference_self")), with_cnn=True)
    fn_enh = make_frame_fn(cfg, with_cnn=True)

    t("leaf_stats (areas/centroids/medians)", stage_leaf_stats, md, dd)
    t("select_optimal_leaf (full leaf stage)", stage_leaf_select, md, dd)
    t("orientation: exact minAreaRect", stage_orientation, ld)
    t("EDT pass-1 (2ch batched scans)", stage_pass1, ld)
    t("dilated_vertical_dist close+wide", stage_dvd, od)
    t("envelope maxes (3 wide fields)", stage_env_maxes, ld, od)
    t("window pass-2 (320^2, 2ch)", stage_window, ld)
    t("grasp scores: reference_self", stage_scores, ld, ad, dd, "reference_self")
    t("grasp scores: union", stage_scores, ld, ad, dd, "union")
    t("FULL frame program: parity + CNN",
      lambda m, d: fn_par(m, d, cx, cy, f, variables), md, dd)
    t("FULL frame program: enhanced + CNN",
      lambda m, d: fn_enh(m, d, cx, cy, f, variables), md, dd)


if __name__ == "__main__":
    main()
