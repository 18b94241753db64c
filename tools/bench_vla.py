"""VLA serving benchmark: LLaVA-1.6-Mistral-7B-dims decode on one chip.

Measures the latency budget of the reference's VLA hot path
(llava_processor.py:78-101: greedy 10-token generate per candidate x 5
candidates per frame) on the JAX stack with randomized bf16 weights
(zero egress -> no real checkpoint; throughput is weight-agnostic).

Params are materialized directly in bf16 on device via eval_shape
(a standard f32 init of 7B params would need 28 GB).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from leafgrasp_tpu.vla.llava_jax import (LlavaJax, LlavaJaxConfig,
                                         greedy_generate_llava)


def build(cfg: LlavaJaxConfig, seed: int = 0):
    model = LlavaJax(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids,
                            pixel_values=px)

    key = [jax.random.PRNGKey(seed)]

    def make(leaf):
        key[0], sub = jax.random.split(key[0])
        dt = jnp.bfloat16 if leaf.dtype == jnp.float32 else leaf.dtype
        return jax.jit(lambda k: (0.02 * jax.random.normal(
            k, leaf.shape, jnp.float32)).astype(dt))(sub)

    variables = jax.tree.map(make, shapes)
    return model, variables


def build_quantized(cfg: LlavaJaxConfig, seed: int = 0):
    """int8-serving build that NEVER materializes the full bf16 tree:
    each LM projection kernel is initialized and quantized leaf by leaf
    (peak HBM = the int8 tree + ONE bf16 leaf, ~7.3 GB at 7B dims).
    build()-then-quantize instead peaks at the full 14.1 GB bf16 tree,
    which on a 16 GB chip leaves no headroom and intermittently
    RESOURCE_EXHAUSTs under any co-tenant."""
    import dataclasses
    import flax.traverse_util as tu
    from leafgrasp_tpu.vla.quant import (LM_PROJ_NAMES,
                                         _quantize_kernel_int8_device)

    model = LlavaJax(cfg)
    ids = jnp.zeros((1, 8), jnp.int32)
    px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3), jnp.float32)
    shapes = jax.eval_shape(model.init, jax.random.PRNGKey(0), ids,
                            pixel_values=px)

    key = [jax.random.PRNGKey(seed)]

    def make(leaf):
        key[0], sub = jax.random.split(key[0])
        dt = jnp.bfloat16 if leaf.dtype == jnp.float32 else leaf.dtype
        return jax.jit(lambda k: (0.02 * jax.random.normal(
            k, leaf.shape, jnp.float32)).astype(dt))(sub)

    out = {}
    for k, leaf in tu.flatten_dict(shapes).items():
        names = set(k)
        v = make(leaf)
        if (k[-1] == "kernel" and names & set(LM_PROJ_NAMES)
                and "vision_tower" not in names):
            q, s = _quantize_kernel_int8_device(v)
            del v
            out[k[:-1] + ("kernel_q",)] = q
            out[k[:-1] + ("kernel_scale",)] = s
        else:
            out[k] = v
    qmodel = LlavaJax(dataclasses.replace(cfg, quantized=True))
    return qmodel, tu.unflatten_dict(out)


def main():
    n_text = 60           # the reference prompt is ~100 tokens total
    n_new = 10            # llava_processor.py:78 max_new_tokens=10
    n_candidates = 5

    cfg = LlavaJaxConfig(dtype="bfloat16")   # full 7B dims
    try:
        model, variables = build(cfg)
        n_img = model.cfg.num_patches  # 576 for 336/14 (CLS dropped)
        ids = np.full((1, n_text + n_img), 7, np.int32)
        ids[0, 2:2 + n_img] = cfg.image_token_index
        ids = jnp.asarray(ids)
        px = jnp.zeros((1, cfg.image_size, cfg.image_size, 3),
                       jnp.float32)

        gen = jax.jit(lambda v, i, p: greedy_generate_llava(
            model, v, i, pixel_values=p, max_new_tokens=n_new))
        t0 = time.perf_counter()
        out = gen(variables, ids, px)
        _ = np.asarray(out)
        compile_s = time.perf_counter() - t0
        print(f"7B-dims bf16: compiled+first run in {compile_s:.1f}s",
              flush=True)

        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(n_candidates):
                out = gen(variables, ids, px)
            _ = np.asarray(out)
            best = min(best, time.perf_counter() - t0)
        per_cand = best / n_candidates
        seq = n_text + n_img
        print(f"prefill {seq} tok + decode {n_new} tok: "
              f"{per_cand * 1e3:.0f} ms/candidate", flush=True)
        print(f"5-candidate VLA rerank: {best * 1e3:.0f} ms/frame "
              f"({1.0 / best:.2f} frames/s)", flush=True)
        # decode-only rate: re-time with a longer decode to isolate it
        gen2 = jax.jit(lambda v, i, p: greedy_generate_llava(
            model, v, i, pixel_values=p, max_new_tokens=n_new + 30))
        out = gen2(variables, ids, px)
        _ = np.asarray(out)
        t0 = time.perf_counter()
        out = gen2(variables, ids, px)
        _ = np.asarray(out)
        longer = time.perf_counter() - t0
        tok_s = 30.0 / max(longer - per_cand, 1e-9)
        print(f"decode rate ~{tok_s:.1f} tok/s "
              f"(from +30-token delta)", flush=True)

        # batched rerank: all 5 candidates in ONE left-padded generate
        # (the LlavaJaxScorer serving path). decode_mode="steps" keeps
        # the decode's weight-layout copies transient -- the fused scan
        # cannot fit B=5 temps next to 14 GB of weights on one chip.
        idsb = jnp.asarray(np.repeat(np.asarray(ids), n_candidates, 0))
        pad = jnp.zeros((n_candidates,), jnp.int32)
        pxb = jnp.zeros((n_candidates, cfg.image_size, cfg.image_size, 3),
                        jnp.float32)

        def genb(v, i, p, pl):
            # no outer jit: prefill + per-step decode programs must keep
            # separate HBM budgets
            return greedy_generate_llava(model, v, i, pixel_values=p,
                                         max_new_tokens=n_new,
                                         pad_lens=pl,
                                         decode_mode="steps")

        out = genb(variables, idsb, pxb, pad)
        _ = np.asarray(out)
        bestb = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            out = genb(variables, idsb, pxb, pad)
            _ = np.asarray(out)
            bestb = min(bestb, time.perf_counter() - t0)
        print(f"BATCHED 5-candidate rerank: {bestb * 1e3:.0f} ms/frame "
              f"({1.0 / bestb:.2f} frames/s, "
              f"{best / bestb:.1f}x vs sequential)", flush=True)
    except Exception as e:
        print(f"7B-dims failed ({type(e).__name__}: {str(e)[:200]})",
              flush=True)


if __name__ == "__main__":
    main()
