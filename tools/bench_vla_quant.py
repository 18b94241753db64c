#!/usr/bin/env python3
"""Weight-only int8 VLA serving A/B at LLaVA-7B dims (vla/quant.py).

Decode is weight-HBM-bound (PERF.md 'VLA serving' roofline: bf16
weights cap batch-1 decode at ~58 tok/s on one v5e), so halving the
weight bytes should roughly halve the per-token step. This measures,
in ONE process (bf16 phase first, weights freed, then int8 -- the two
trees cannot coexist in 16 GB HBM at 7B dims):

  * steps-mode decode ms/step at batch 5 (the serving configuration);
  * batched 5-candidate rerank latency (prefill + 10-token decode);
  * int8 only: the FUSED scan decode, which OOMs in bf16 at batch 5
    (PERF.md memory trick 4) -- int8's ~7 GB of weights leave room for
    the scan's hoisted layout copies again.

Weights are randomized directly in their serving dtypes on device
(zero egress -> no real checkpoint; throughput is weight-agnostic).

Run: python tools/bench_vla_quant.py [--layers 16 --hidden 2048]
     (--full for real 7B dims)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.vla.llava_jax import (LlavaJax, LlavaJaxConfig,
                                         greedy_generate_llava,
                                         _generate_prefill,
                                         _generate_decode_step)
from bench_vla import build  # on-device randomized bf16 params


def build_quant(cfg: LlavaJaxConfig, seed: int = 0):
    """Materialize a quantized-model variables tree directly in its
    serving dtypes (int8 kernels + f32 scales + bf16 rest)."""
    model = LlavaJax(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids,
                            pixel_values=px)
    key = [jax.random.PRNGKey(seed)]

    def make(path, leaf):
        key[0], sub = jax.random.split(key[0])
        name = path[-1].key
        if name == "kernel_q":
            return jax.jit(lambda k: jax.random.randint(
                k, leaf.shape, -127, 128, jnp.int8))(sub)
        if name == "kernel_scale":
            # match the bf16 baseline's 0.02-normal magnitude:
            # max|w| over an in-dim column ~ 0.02 * 3.5
            return jnp.full(leaf.shape, 0.02 * 3.5 / 127.0, jnp.float32)
        dt = jnp.bfloat16 if leaf.dtype == jnp.float32 else leaf.dtype
        return jax.jit(lambda k: (0.02 * jax.random.normal(
            k, leaf.shape, jnp.float32)).astype(dt))(sub)

    variables = jax.tree_util.tree_map_with_path(make, shapes)
    return model, variables


def time_steps_decode(model, variables, b, t, steps=32):
    """ms/step of the per-token decode program at batch b (chained
    dispatches, one fetch barrier -- PERF.md measurement caveat)."""
    n_new = steps + 1
    ids = jnp.asarray(np.full((b, t), 7, np.int32))
    pad = jnp.zeros((b,), jnp.int32)
    last, caches = _generate_prefill(model, variables, ids, pad,
                                     None, None, n_new)
    last, caches = _generate_decode_step(model, variables, caches, last,
                                         pad, jnp.int32(0), t, n_new)
    np.asarray(last)
    best = float("inf")
    for _ in range(3):
        lastw, cachesw = _generate_prefill(model, variables, ids, pad,
                                           None, None, n_new)
        np.asarray(lastw)
        t0 = time.perf_counter()
        for i in range(1, steps):
            lastw, cachesw = _generate_decode_step(
                model, variables, cachesw, lastw, pad, jnp.int32(i),
                t, n_new)
        np.asarray(lastw)
        best = min(best, (time.perf_counter() - t0) / (steps - 1))
    return best


def time_rerank(model, variables, cfg, n_cand=5, n_new=10,
                decode_mode="steps"):
    """Batched n_cand rerank: prefill (576 image + 60 text tokens) +
    n_new-token greedy decode, ms/frame."""
    n_img = model.cfg.num_patches
    ids = np.full((n_cand, 60 + n_img), 7, np.int32)
    ids[:, 2:2 + n_img] = cfg.image_token_index
    ids = jnp.asarray(ids)
    px = jnp.zeros((n_cand, cfg.image_size, cfg.image_size, 3),
                   jnp.float32)
    pad = jnp.zeros((n_cand,), jnp.int32)

    def gen():
        return greedy_generate_llava(model, variables, ids,
                                     pixel_values=px,
                                     max_new_tokens=n_new, pad_lens=pad,
                                     decode_mode=decode_mode)

    np.asarray(gen())
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        out = gen()
        np.asarray(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--full", action="store_true")
    ap.add_argument("--batch", type=int, default=5)
    args = ap.parse_args()

    if args.full:
        base_cfg = LlavaJaxConfig(dtype="bfloat16")
    else:
        h = args.hidden
        base_cfg = LlavaJaxConfig(dtype="bfloat16", hidden=h,
                                  intermediate=int(3.5 * h),
                                  layers=args.layers,
                                  heads=h // 128,
                                  kv_heads=max(1, h // 512),
                                  vis_layers=2)
    qcfg = __import__("dataclasses").replace(base_cfg, quantized=True)
    b, t = args.batch, 64
    res = {}

    # ---- phase A: bf16 baseline (then freed) -------------------------
    model, variables = build(base_cfg)
    res["bf16_step_ms"] = time_steps_decode(model, variables, b, t)
    print(f"bf16  steps-decode B={b}: {res['bf16_step_ms']*1e3:7.3f} "
          f"ms/step", flush=True)
    res["bf16_rerank_ms"] = time_rerank(model, variables, base_cfg,
                                        n_cand=b)
    print(f"bf16  batched {b}-cand rerank: "
          f"{res['bf16_rerank_ms']*1e3:6.0f} ms/frame", flush=True)
    del model, variables

    # ---- phase B: weight-only int8 ------------------------------------
    qmodel, qvars = build_quant(qcfg)
    res["int8_step_ms"] = time_steps_decode(qmodel, qvars, b, t)
    print(f"int8  steps-decode B={b}: {res['int8_step_ms']*1e3:7.3f} "
          f"ms/step", flush=True)
    res["int8_rerank_ms"] = time_rerank(qmodel, qvars, qcfg, n_cand=b)
    print(f"int8  batched {b}-cand rerank: "
          f"{res['int8_rerank_ms']*1e3:6.0f} ms/frame", flush=True)
    try:
        res["int8_rerank_scan_ms"] = time_rerank(
            qmodel, qvars, qcfg, n_cand=b, decode_mode="scan")
        print(f"int8  batched rerank, FUSED scan decode: "
              f"{res['int8_rerank_scan_ms']*1e3:6.0f} ms/frame",
              flush=True)
    except Exception as e:
        res["int8_rerank_scan_ms"] = None
        print(f"int8 scan decode failed "
              f"({type(e).__name__}: {str(e)[:160]})", flush=True)

    res["step_speedup"] = round(res["bf16_step_ms"]
                                / res["int8_step_ms"], 3)
    res["rerank_speedup"] = round(res["bf16_rerank_ms"]
                                  / res["int8_rerank_ms"], 3)
    print(json.dumps({
        "metric": "vla_serving_int8_ab",
        **{k: (round(v * 1e3, 3) if k.endswith("_ms")
               and isinstance(v, float) else v)
           for k, v in res.items()},
        "dims": {"hidden": base_cfg.hidden, "layers": base_cfg.layers,
                 "batch": b, "full": args.full},
    }))


if __name__ == "__main__":
    main()
