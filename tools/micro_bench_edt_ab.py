"""Interleaved A/B benchmark of EDT paths (cancels environment drift)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import time
import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.io.scenes import make_leaf_scene
from leafgrasp_tpu.ops.edt import edt_batch, nearest_seed_dist_1d
from leafgrasp_tpu.ops.pallas_edt import (edt_batch_rowband,
                                          squared_edt_rowband)

H, W = 1080, 1440
mask, depth = make_leaf_scene(H, W, num_leaves=6, seed=8)
leaf3 = mask == 3
seeds3 = jnp.asarray(np.stack([mask == 0, mask > 0, ~leaf3]))

jit_xla = jax.jit(edt_batch)
jit_row = jax.jit(lambda s: edt_batch_rowband(s, interpret=False))


@jax.jit
def pass1_t(seeds):
    g = nearest_seed_dist_1d(jnp.swapaxes(seeds, 1, 2), axis=1)
    return jnp.swapaxes(g, 1, 2).astype(jnp.float32) ** 2


@jax.jit
def pass1_v(seeds):
    g = nearest_seed_dist_1d(seeds, axis=1).astype(jnp.float32)
    return g * g


g2r = jax.device_put(np.asarray(pass1_t(seeds3)))
jit_kernel = jax.jit(lambda g: squared_edt_rowband(g, interpret=False))

fns = {
    "xla_banded_x3": (jit_xla, seeds3),
    "rowband_x3": (jit_row, seeds3),
    "pass1_transposed_scan": (pass1_t, seeds3),
    "pass1_vertical_scan": (pass1_v, seeds3),
    "rowband_kernel_only(prepass+pallas)": (jit_kernel, g2r),
}
# warmup/compile
for name, (f, a) in fns.items():
    _ = np.asarray(jax.tree_util.tree_leaves(f(a))[0])

REPS = 20
results = {k: [] for k in fns}
for trial in range(5):
    for name, (f, a) in fns.items():
        t0 = time.perf_counter()
        for _ in range(REPS):
            out = f(a)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])
        results[name].append((time.perf_counter() - t0) / REPS * 1e3)

for name, v in results.items():
    print(f"{name:40s} min {min(v):7.3f}  med {sorted(v)[len(v)//2]:7.3f} ms",
          flush=True)
