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
    del caches0, last0
    fmts = compiled.input_formats[0][0]        # the variables subtree
    flat_f = jax.tree.leaves(fmts)
    flat_v = jax.tree.leaves(variables)
    n_changed = sum(
        1 for f_, v_ in zip(flat_f, flat_v)
        if f_.layout is not None
        and tuple(f_.layout.major_to_minor) != tuple(range(v_.ndim)))
    print(f"decode program requests non-default layouts on "
          f"{n_changed}/{len(flat_v)} weights")
    del flat_v, flat_f   # must NOT pin the original leaves: at --full the
                         # leaf-by-leaf relayout below relies on each
                         # replaced leaf being freed (14.1 GB + extras
                         # does not fit twice in 16 GB HBM)

    def opt_call(v, c, l, p, i):
        return compiled(v, c, l, p, i)

    # baseline first (at --full two weight copies cannot coexist in HBM)
    base = run_steps(baseline_call, variables, "baseline default layout")

    # relayout leaf-by-leaf, dropping each default-layout leaf as its
    # relaid copy lands (peak overhead = one leaf, ~263 MB at 7B dims)
    leaves, treedef = jax.tree.flatten(variables)
    fleaves = jax.tree.leaves(fmts)
    if args.full:
        del variables
    for i in range(len(leaves)):
        leaves[i] = jax.device_put(leaves[i], fleaves[i])
    vars_opt = jax.tree.unflatten(treedef, leaves)
    del leaves

    opt = run_steps(opt_call, vars_opt, "AUTO decode-format weights")
    if not args.full:
        base2 = run_steps(baseline_call, variables, "baseline (repeat)")
        base = min(base, base2)

    print(json.dumps({
        "metric": "decode_step_ms",
        "baseline": round(base * 1e3, 3),
        "auto_layout": round(opt * 1e3, 3),
        "speedup": round(base / opt, 3),
        "relayouted_weights": n_changed,
        "dims": {"hidden": cfg.hidden, "layers": cfg.layers,
                 "batch": b, "full": args.full},
    }))


if __name__ == "__main__":
    main()
