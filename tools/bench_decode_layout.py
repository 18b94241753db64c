#!/usr/bin/env python3
"""Steps-mode decode with decode-optimal weight LAYOUTS (A/B).

PERF.md "VLA serving" item 4: per-token decode programs keep the
matvecs' transposed weight-layout copies transient (that is what lets
a batched 7B rerank fit on one 16 GB chip), at ~2 ms/step of re-copy
cost. The cleaner fix noted there: compile the decode-step program
with AUTO input formats (jax.experimental.layout), store the weights
in the layout the decode program PREFERS, and the per-step copies
disappear -- any relayout cost moves to load time.

This measures both variants, interleaved in one process:
  baseline  -- default-layout weights + the shipped
               _generate_decode_step program;
  opt       -- the same program compiled with Format(Layout.AUTO) on
               the weight pytree, weights device_put into the chosen
               formats once.

Run: python tools/bench_decode_layout.py [--layers 16 --hidden 2048]
     (--full for real 7B dims; weights are randomized on device)
"""
import argparse
import functools
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
from jax.experimental.layout import Format, Layout

from leafgrasp_tpu.vla.llava_jax import (LlavaJax, LlavaJaxConfig,
                                         _generate_prefill,
                                         _generate_decode_step)
from bench_vla import build  # on-device randomized bf16 params


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--layers", type=int, default=16)
    ap.add_argument("--hidden", type=int, default=2048)
    ap.add_argument("--full", action="store_true",
                    help="real 7B dims (long compile + 14 GB HBM)")
    ap.add_argument("--batch", type=int, default=5)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()

    if args.full:
        cfg = LlavaJaxConfig(dtype="bfloat16")
    else:
        h = args.hidden
        cfg = LlavaJaxConfig(dtype="bfloat16", hidden=h,
                             intermediate=int(3.5 * h),
                             layers=args.layers,
                             heads=h // 128, kv_heads=max(1, h // 512),
                             vis_layers=2)
    model, variables = build(cfg)

    b, t = args.batch, 64
    n_new = args.steps + 1
    ids = jnp.asarray(np.full((b, t), 7, np.int32))
    pad = jnp.zeros((b,), jnp.int32)
    last0, caches0 = _generate_prefill(model, variables, ids, pad,
                                       None, None, n_new)
    jax.block_until_ready; np.asarray(last0)  # fetch = barrier

    raw_step = _generate_decode_step.__wrapped__

    def run_steps(step_call, variables, tag):
        # fresh caches per run (donation consumes them)
        last, caches = _generate_prefill(model, variables, ids, pad,
                                         None, None, n_new)
        # warmup one step (compile)
        last, caches = step_call(variables, caches, last, pad,
                                 jnp.int32(0))
        np.asarray(last)
        best = float("inf")
        for _ in range(2):
            lastw, cachesw = _generate_prefill(model, variables, ids,
                                               pad, None, None, n_new)
            np.asarray(lastw)
            t0 = time.perf_counter()
            for i in range(1, args.steps):
                lastw, cachesw = step_call(variables, cachesw, lastw,
                                           pad, jnp.int32(i))
            np.asarray(lastw)   # ONE fetch bounds the chained dispatches
            best = min(best, (time.perf_counter() - t0) / (args.steps - 1))
        print(f"{tag:28s} {best*1e3:7.3f} ms/step")
        return best

    # ---- baseline: shipped program, default-layout weights ----------
    def baseline_call(v, c, l, p, i):
        return _generate_decode_step(model, v, c, l, p, i, t, n_new)

    # ---- opt: AUTO weight formats --------------------------------------
    def fn(v, c, l, p, i):
        return raw_step(model, v, c, l, p, i, t, n_new)

    auto_tree = jax.tree.map(lambda _: Format(Layout.AUTO), variables)
    jitted = jax.jit(fn, donate_argnums=(1,),
                     in_shardings=(auto_tree, None, None, None, None))
    lowered = jitted.lower(variables, caches0, last0, pad, jnp.int32(0))
    compiled = lowered.compile()
    fmts = compiled.input_formats[0][0]        # the variables subtree
    n_changed = 0
    flat_f, _ = jax.tree.flatten(fmts)
    flat_v, _ = jax.tree.flatten(variables)
    for f_, v_ in zip(flat_f, flat_v):
        dflt = np.asarray([])  # placeholder; compare via layout repr
        if "major_to_minor=(0, 1)" not in str(f_.layout) or \
                getattr(f_.layout, "tiling", None) is None:
            n_changed += 1
    vars_opt = jax.device_put(variables, fmts)

    def opt_call(v, c, l, p, i):
        return compiled(v, c, l, p, i)

    base = run_steps(baseline_call, variables, "baseline default layout")
    opt = run_steps(opt_call, vars_opt, "AUTO decode-format weights")
    base2 = run_steps(baseline_call, variables, "baseline (repeat)")

    print(json.dumps({
        "metric": "decode_step_ms",
        "baseline": round(min(base, base2) * 1e3, 3),
        "auto_layout": round(opt * 1e3, 3),
        "speedup": round(min(base, base2) / opt, 3),
        "dims": {"hidden": cfg.hidden, "layers": cfg.layers,
                 "batch": b, "full": args.full},
    }))


if __name__ == "__main__":
    main()
