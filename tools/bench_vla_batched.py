"""Standalone batched-rerank measurement for the 7B VLA (see
bench_vla.py for the sequential baseline)."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.vla.llava_jax import (LlavaJaxConfig,
                                         greedy_generate_llava)
from tools.bench_vla import build

n_text, n_new = 60, 10
import sys as _s
B = int(_s.argv[1]) if len(_s.argv) > 1 else 3
cfg = LlavaJaxConfig(dtype="bfloat16")
model, variables = build(cfg)
n_img = model.cfg.num_patches
ids = np.full((1, n_text + n_img), 7, np.int32)
ids[0, 2:2 + n_img] = cfg.image_token_index
idsb = jnp.asarray(np.repeat(ids, B, 0))
pad = jnp.zeros((B,), jnp.int32)
pxb = jnp.zeros((B, cfg.image_size, cfg.image_size, 3), jnp.float32)

def genb(v, i, p, pl):
    # no outer jit: greedy_generate_llava runs as two separately-jitted
    # programs (prefill + decode scan) so their HBM budgets don't stack
    return greedy_generate_llava(model, v, i, pixel_values=p,
                                 max_new_tokens=n_new, pad_lens=pl,
                                 decode_mode="steps")
t0 = time.perf_counter()
out = genb(variables, idsb, pxb, pad)
_ = np.asarray(out)
print(f"batched B={B} compiled+first in {time.perf_counter()-t0:.0f}s",
      flush=True)
best = float("inf")
for _ in range(4):
    t0 = time.perf_counter()
    out = genb(variables, idsb, pxb, pad)
    _ = np.asarray(out)
    best = min(best, time.perf_counter() - t0)
print(f"BATCHED {B}-candidate rerank: {best*1e3:.0f} ms/frame "
      f"({1.0/best:.2f} frames/s)", flush=True)
