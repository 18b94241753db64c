#!/usr/bin/env python3
"""Stage-level A/B micro-bench for the post-edt_max_argmax enhanced mode.

Interleaves variants in ONE process (tunnel timings drift 2-3x between
runs; PERF.md "measurement caveat"). Barrier = fetch of a tiny reduction
of the last dispatched result.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.config import DEFAULT_CONFIG, GraspScoringConfig
from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.ops.edt import (edt_max_argmax, nearest_seed_dist_1d,
                                   squared_edt)
from leafgrasp_tpu.ops.morphology import dilate, elliptical_kernel
from leafgrasp_tpu.geometry.grasp_scorer import compute_grasp_scores
from leafgrasp_tpu.geometry.leaf_scorer import select_optimal_leaf
from leafgrasp_tpu.pipeline.frame import make_frame_fn
from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn

cfg = DEFAULT_CONFIG
gcfg = cfg.grasp
H, W = cfg.frame.height, cfg.frame.width
mask, depth = make_leaf_scene(H, W, num_leaves=6, seed=8)
cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)

mask_d = jax.device_put(mask)
depth_d = jax.device_put(depth)

sel = select_optimal_leaf(mask_d, depth_d, cx, cy, f, cfg=cfg.leaf,
                          frame=cfg.frame)
leaf = jax.device_put(np.asarray(mask == int(sel.best_leaf_id)))
allm = jax.device_put(np.asarray(mask > 0))
other = jax.device_put(np.asarray(
    (mask > 0) & (mask != int(sel.best_leaf_id))))

kc = elliptical_kernel(gcfg.isolation_close_kernel)
kw = elliptical_kernel(gcfg.isolation_wide_kernel)


@jax.jit
def stage_dilates(o):
    return dilate(o, kc).sum() + dilate(o, kw).sum()


@jax.jit
def stage_pass1_4ch(m, o):
    seeds = jnp.stack([~m, m, dilate(o, kc), dilate(o, kw)])
    g = nearest_seed_dist_1d(seeds, axis=1).astype(jnp.float32)
    return (g * g).sum()


@jax.jit
def stage_din(m):
    return squared_edt(~m).sum()


@jax.jit
def stage_maxdout(m):
    mx, am = edt_max_argmax(m)
    return mx + am


@jax.jit
def stage_iso_banded(m, o):
    sc = dilate(o, kc)
    sw = dilate(o, kw)
    seeds = jnp.stack([sc, sw])
    g = nearest_seed_dist_1d(seeds, axis=1).astype(jnp.float32)
    g2 = g * g
    dc = squared_edt(sc, g2=g2[0], band_mask=m)
    dw = squared_edt(sw, g2=g2[1], band_mask=m)
    return dc.sum() + dw.sum()


@jax.jit
def stage_iso_maxes(m, o):
    sc = dilate(o, kc)
    sw = dilate(o, kw)
    seeds = jnp.stack([sc, sw])
    g = nearest_seed_dist_1d(seeds, axis=1).astype(jnp.float32)
    g2 = g * g
    c, _ = edt_max_argmax(sc, g2=g2[0])
    w_, _ = edt_max_argmax(sw, g2=g2[1])
    return c + w_


def scores_fn(mode):
    g = GraspScoringConfig(isolation_context=mode)

    @jax.jit
    def fn(lm, am, d):
        s = compute_grasp_scores(lm, am, d, cx, cy, f, cfg=g,
                                 use_pallas=True)
        return s.traditional_score.sum() + s.isolation_map.sum()
    return fn


sc_ref = scores_fn("reference_self")
sc_uni = scores_fn("union")

_, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
variables = jax.device_put(variables)
fn_ref = make_frame_fn(cfg.replace(grasp=GraspScoringConfig(
    isolation_context="reference_self")), with_cnn=True)
fn_uni = make_frame_fn(cfg, with_cnn=True)

variants = {
    "dilates_only": lambda: stage_dilates(other),
    "pass1_4ch": lambda: stage_pass1_4ch(leaf, other),
    "din_banded": lambda: stage_din(leaf),
    "maxdout": lambda: stage_maxdout(leaf),
    "iso_banded_pair": lambda: stage_iso_banded(leaf, other),
    "iso_maxes_pair": lambda: stage_iso_maxes(leaf, other),
    "scores_reference_self": lambda: sc_ref(leaf, allm, depth_d),
    "scores_union": lambda: sc_uni(leaf, allm, depth_d),
    "frame_reference_self": lambda: fn_ref(mask_d, depth_d, cx, cy, f,
                                           variables).grasp_uv,
    "frame_union": lambda: fn_uni(mask_d, depth_d, cx, cy, f,
                                  variables).grasp_uv,
}

# compile + warmup
for name, v in variants.items():
    r = v()
    np.asarray(r)

N = 20
REPS = 3
best = {k: float("inf") for k in variants}
for _ in range(REPS):
    for name, v in variants.items():
        t0 = time.perf_counter()
        rs = [v() for _ in range(N)]
        np.asarray(rs[-1])
        dt = (time.perf_counter() - t0) / N
        best[name] = min(best[name], dt)

for name, dt in best.items():
    print(f"{name:28s} {dt * 1e3:8.2f} ms")
