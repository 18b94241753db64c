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
    serving dtypes (int8/int4 kernels + f32 scales + bf16 rest)."""
    model = LlavaJax(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids,
                            pixel_values=px)
    key = [jax.random.PRNGKey(seed)]
    qmax = 127 if cfg.quant_bits == 8 else 7
    if cfg.quant_packed:
        qmax = 127        # packed bytes carry two random nibbles

    def make(path, leaf):
        key[0], sub = jax.random.split(key[0])
        name = path[-1].key
        if name == "kernel_q":
            dt = leaf.dtype
            return jax.jit(lambda k: jax.random.randint(
                k, leaf.shape, -qmax, qmax + 1, jnp.int8).astype(dt))(sub)
        if name == "kernel_scale":
            # match the bf16 baseline's 0.02-normal magnitude:
            # max|w| over an in-dim column/group ~ 0.02 * 3.5
            return jnp.full(leaf.shape, 0.02 * 3.5 / qmax, jnp.float32)
        dt = jnp.bfloat16 if leaf.dtype == jnp.float32 else leaf.dtype
        return jax.jit(lambda k: (0.02 * jax.random.normal(
            k, leaf.shape, jnp.float32)).astype(dt))(sub)

    variables = jax.tree_util.tree_map_with_path(make, shapes)
    return model, variables


def weight_hbm_gb():
    """Live device bytes right after a weights build (validates int4
    packing: XLA stores S4 two-per-byte on TPU; if it didn't, the int4
    build would report int8-sized residency). None when the backend
    exposes no memory_stats (the tunnelled axon backend doesn't --
    packing is then inferred from the decode step time instead)."""
    from leafgrasp_tpu.utils.device import live_buffer_bytes
    b = live_buffer_bytes()
    return round(b / 2**30, 3) if b else None


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
    ap.add_argument("--bits", type=int, default=8, choices=(8, 4),
                    help="weight-only quantization width for phase B")
    ap.add_argument("--storage", choices=("native", "packed"),
                    default="native",
                    help="int4 kernel storage: native jnp.int4 or "
                         "nibble-packed int8 (for backends without S4)")
    ap.add_argument("--skip-bf16", action="store_true",
                    help="skip phase A (compare against a recorded "
                         "bf16 baseline instead)")
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
    qcfg = __import__("dataclasses").replace(
        base_cfg, quantized=True, quant_bits=args.bits,
        quant_packed=(args.bits == 4 and args.storage == "packed"))
    b, t = args.batch, 64
    qn = f"int{args.bits}" + ("p" if qcfg.quant_packed else "")
    res = {}

    # ---- phase A: bf16 baseline (then freed) -------------------------
    if not args.skip_bf16:
        model, variables = build(base_cfg)
        res["bf16_weights_gb"] = weight_hbm_gb()
        print(f"bf16  weights resident: {res['bf16_weights_gb']} GiB",
              flush=True)
        res["bf16_step_ms"] = time_steps_decode(model, variables, b, t)
        print(f"bf16  steps-decode B={b}: "
              f"{res['bf16_step_ms']*1e3:7.3f} ms/step", flush=True)
        res["bf16_rerank_ms"] = time_rerank(model, variables, base_cfg,
                                            n_cand=b)
        print(f"bf16  batched {b}-cand rerank: "
              f"{res['bf16_rerank_ms']*1e3:6.0f} ms/frame", flush=True)
        del model, variables

    # ---- phase B: weight-only quantized -------------------------------
    qmodel, qvars = build_quant(qcfg)
    res[f"{qn}_weights_gb"] = weight_hbm_gb()
    print(f"{qn}  weights resident: {res[f'{qn}_weights_gb']} GiB",
          flush=True)
    res[f"{qn}_step_ms"] = time_steps_decode(qmodel, qvars, b, t)
    print(f"{qn}  steps-decode B={b}: {res[f'{qn}_step_ms']*1e3:7.3f} "
          f"ms/step", flush=True)
    res[f"{qn}_rerank_ms"] = time_rerank(qmodel, qvars, qcfg, n_cand=b)
    print(f"{qn}  batched {b}-cand rerank: "
          f"{res[f'{qn}_rerank_ms']*1e3:6.0f} ms/frame", flush=True)
    try:
        res[f"{qn}_rerank_scan_ms"] = time_rerank(
            qmodel, qvars, qcfg, n_cand=b, decode_mode="scan")
        print(f"{qn}  batched rerank, FUSED scan decode: "
              f"{res[f'{qn}_rerank_scan_ms']*1e3:6.0f} ms/frame",
              flush=True)
    except Exception as e:
        res[f"{qn}_rerank_scan_ms"] = None
        print(f"{qn} scan decode failed "
              f"({type(e).__name__}: {str(e)[:160]})", flush=True)

    if not args.skip_bf16:
        res["step_speedup"] = round(res["bf16_step_ms"]
                                    / res[f"{qn}_step_ms"], 3)
        res["rerank_speedup"] = round(res["bf16_rerank_ms"]
                                      / res[f"{qn}_rerank_ms"], 3)
    print(json.dumps({
        "metric": f"vla_serving_{qn}_ab",
        **{k: (round(v * 1e3, 3) if k.endswith("_ms")
               and isinstance(v, float) else v)
           for k, v in res.items()},
        "dims": {"hidden": base_cfg.hidden, "layers": base_cfg.layers,
                 "batch": b, "full": args.full},
    }))


if __name__ == "__main__":
    main()
