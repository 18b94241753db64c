"""Single-chip throughput A/B: pipelined single-frame dispatches vs a
vmapped frame batch (interleaved in one process; compare mins)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.config import DEFAULT_CONFIG, GraspScoringConfig
from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
from leafgrasp_tpu.pipeline.frame import make_frame_fn, select_grasp

cfg = DEFAULT_CONFIG.replace(
    grasp=GraspScoringConfig(isolation_context="reference_self"))
H, W = cfg.frame.height, cfg.frame.width
mask, depth = make_leaf_scene(H, W, num_leaves=6, seed=8)
cx, cy, f = np.float32(707.87), np.float32(494.07), np.float32(1750.68)
_, variables = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
variables = jax.device_put(variables)

N = 16
masks = [jax.device_put(np.roll(mask, 3 * i, axis=1)) for i in range(N)]
depths = [jax.device_put(np.roll(depth, 3 * i, axis=1)) for i in range(N)]

single = make_frame_fn(cfg, with_cnn=True)  # pallas on chip

from leafgrasp_tpu.models.grasp_cnn import GraspPointCNN
model = GraspPointCNN(cfg.model)


def cnn_apply(v, feats):
    return model.apply(v, feats, train=False)


def one(m, d, v, use_pallas):
    return select_grasp(m, d, cx, cy, f, cnn_variables=v,
                        cnn_apply=cnn_apply, cfg=cfg,
                        use_pallas=use_pallas)


# variants: (batch size, use_pallas scoring kernel)
batched_fns = {}
for B, up in ((2, False), (4, False), (8, False), (4, True)):
    try:
        fn = jax.jit(jax.vmap(
            lambda m, d, v, _up=up: one(m, d, v, _up),
            in_axes=(0, 0, None)))
        mb = jnp.stack([np.asarray(masks[i]) for i in range(B)])
        db = jnp.stack([np.asarray(depths[i]) for i in range(B)])
        out = fn(mb, db, variables)
        _ = np.asarray(out.grasp_uv)
        batched_fns[f"batch{B}_pallas{int(up)}"] = (fn, mb, db, B)
        print(f"compiled batch{B} pallas={up}", flush=True)
    except Exception as e:
        print(f"batch{B} pallas={up} FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)

# warm single
r = single(masks[0], depths[0], cx, cy, f, variables)
_ = np.asarray(r.grasp_uv)

REPS = 16
results = {k: [] for k in ["single"] + list(batched_fns)}
for trial in range(5):
    t0 = time.perf_counter()
    for i in range(REPS):
        out = single(masks[i % N], depths[i % N], cx, cy, f, variables)
    _ = np.asarray(out.grasp_uv)
    results["single"].append((time.perf_counter() - t0) / REPS * 1e3)

    for name, (fn, mb, db, B) in batched_fns.items():
        t0 = time.perf_counter()
        reps = max(1, REPS // B)
        for _ in range(reps):
            out = fn(mb, db, variables)
        _ = np.asarray(out.grasp_uv)
        results[name].append((time.perf_counter() - t0) / (reps * B) * 1e3)

for name, v in results.items():
    print(f"{name:20s} min {min(v):7.2f} ms/frame  ({1000/min(v):6.1f} fps)",
          flush=True)
