#!/usr/bin/env python3
"""Measure batched-vs-sequential rerank STABILITY on the real chip.

The serving scorer left-pad-batches all 5 candidate prompts into ONE
generate (llava_runtime.LlavaJaxScorer) where the reference loops the
model per candidate (llava_processor.py:78-101). Masking makes the two
mathematically equivalent, but bf16 TPU matmul tiling varies with the
batch shape and can flip a greedy argmax on a near-tie. The r1/r2
docstring hedged this; this tool MEASURES it (VERDICT r2 item 3):

for N frames of randomized candidates (fixed token shapes, so each
program compiles once), run the scorer batch-5 and batch-1 over the
same prompts with the SAME randomized 7B-dims weights and report

* token flip rate: candidates whose generated token sequence differs;
* parsed-score flip rate: candidates whose parsed score differs (the
  decode stub maps token sequences to scores injectively via a stable
  hash, so score flips == sequence flips by construction -- with
  randomized weights real decimal parses are not available);
* first-step logits delta: max |logits_b5 - logits_b1| at the first
  decode position, in units of the logits' own std.

Runs bf16 and (--int8) weight-only int8. Randomized weights: zero
egress; tiling-induced divergence is a property of shapes/dtypes, not
of weight values.

Usage: python tools/bench_rerank_stability.py [--frames 20]
           [--layers 32 --hidden 4096 | --tiny] [--int8]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np


N_TEXT = 60   # fixed prompt token budget (reference prompt ~100 total)


class _FixedLenTok:
    """Deterministic byte tokenizer with a FIXED encode length (so every
    frame reuses one compiled (B, T) program through the tunnel) and an
    injective decode -> parsed-score mapping (stable int hash)."""

    def __init__(self, vocab: int):
        self.vocab = vocab

    def encode(self, text):
        ids = [b % (self.vocab - 8) + 3 for b in text.encode("utf-8")]
        ids = ids[:N_TEXT]
        return [1] + ids + [2] * (N_TEXT - 1 - len(ids))

    def decode(self, ids):
        key = 0
        for i in ids:
            key = (key * 1000003 + int(i) + 1) % (10 ** 9)
        return f"0.{key:09d}"


def make_candidates(rng, n=5):
    return [dict(x=int(rng.integers(0, 1440)),
                 y=int(rng.integers(0, 1080)),
                 geometric_score=float(rng.uniform(0, 1)),
                 clutter_score=float(rng.uniform(0, 1)),
                 distance_score=float(rng.uniform(0, 1)))
            for _ in range(n)]


def make_logits_fn(model):
    """Jitted last-position prefill logits, cached per (B, T) shape."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def fn(variables, ids, feats):
        logits, _ = model.apply(variables, ids, image_features=feats,
                                logits_last_only=True)
        return logits[:, -1].astype(jnp.float32)

    def call(variables, rows, feats):
        b = len(rows)
        t = max(len(r) for r in rows)
        ids = np.zeros((b, t), np.int32)
        for i, r in enumerate(rows):
            ids[i, t - len(r):] = r
        f = jnp.broadcast_to(feats, (b,) + feats.shape[1:])
        return np.asarray(fn(variables, jnp.asarray(ids), f))

    return call


def run_mode(tag, model, variables, frames, seed=0):
    import jax
    import jax.numpy as jnp
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
    from leafgrasp_tpu.vla.llava_jax import _VisionProject

    tok = _FixedLenTok(model.cfg.vocab_size)
    batched = LlavaJaxScorer(model, variables, tok, max_new_tokens=10,
                             decode_mode="steps")
    seq = LlavaJaxScorer(model, variables, tok, max_new_tokens=10,
                         decode_mode="steps", max_batch=1)

    # shared randomized image features (one encode, broadcast -- the
    # serving path; identical for both modes by construction)
    key = jax.random.PRNGKey(seed + 77)
    px = jax.random.normal(key, (1, model.cfg.image_size,
                                 model.cfg.image_size, 3), jnp.float32)
    feats = _VisionProject(model.cfg).apply(variables, px)

    rng = np.random.default_rng(seed)
    logits_fn = make_logits_fn(model)
    score_flips = total = 0
    max_rel_dlogit = 0.0
    from leafgrasp_tpu.vla.processor import build_prompt
    n_img = model.cfg.num_patches
    for fi in range(frames):
        cands = make_candidates(rng)
        # score() recomputes feats from an image; call the internals so
        # both modes share the exact same feature tensor
        rows = [batched._encode(build_prompt(c, "pick"), n_img)
                for c in cands]
        s_b = batched._score_batch(rows, feats)
        s_s = []
        for r in rows:
            s_s.extend(seq._score_batch([r], feats))
        for a, b in zip(s_b, s_s):
            total += 1
            if a != b:
                score_flips += 1   # injective decode: flip <=> tokens
        lb = logits_fn(variables, rows, feats)
        ls = np.concatenate([logits_fn(variables, [r], feats)
                             for r in rows])
        denom = max(float(lb.std()), 1e-9)
        max_rel_dlogit = max(max_rel_dlogit,
                             float(np.abs(lb - ls).max()) / denom)
        print(f"  [{tag}] frame {fi + 1}/{frames}: flips so far "
              f"{score_flips}/{total}, max dlogit/std "
              f"{max_rel_dlogit:.3e}", flush=True)
    return dict(tag=tag, candidates=total, score_flips=score_flips,
                flip_rate=score_flips / max(total, 1),
                max_first_step_dlogit_over_std=max_rel_dlogit)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=20)
    ap.add_argument("--layers", type=int, default=32)
    ap.add_argument("--hidden", type=int, default=4096)
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims smoke run (CPU-safe)")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--skip-bf16", action="store_true")
    args = ap.parse_args()

    import dataclasses
    import json
    from bench_vla import build
    from leafgrasp_tpu.vla.llava_jax import LlavaJaxConfig

    if args.tiny:
        cfg = LlavaJaxConfig(
            vis_hidden=16, vis_intermediate=32, vis_layers=1, vis_heads=2,
            image_size=28, patch_size=14, vocab_size=128, hidden=16,
            intermediate=32, layers=2, heads=2, kv_heads=1,
            image_token_index=100, dtype="bfloat16")
    else:
        cfg = LlavaJaxConfig(dtype="bfloat16", layers=args.layers,
                             hidden=args.hidden)
    results = []
    if args.skip_bf16 and args.int8:
        # leaf-streamed quantized build (bench_vla.build_quantized):
        # the full bf16 tree never materializes, so the int8 pass can't
        # inherit a deferred OOM from a 14.1 GB build on a shared chip
        from bench_vla import build_quantized
        qmodel, qvars = build_quantized(cfg)
        results.append(run_mode("int8", qmodel, qvars, args.frames))
    else:
        model, variables = build(cfg)
        if not args.skip_bf16:
            results.append(run_mode("bf16", model, variables,
                                    args.frames))
        if args.int8:
            from leafgrasp_tpu.vla.quant import \
                quantize_llava_variables_device
            from leafgrasp_tpu.vla.llava_jax import LlavaJax
            box = [variables]
            del variables
            qvars = quantize_llava_variables_device(box, bits=8)
            qmodel = LlavaJax(dataclasses.replace(cfg, quantized=True))
            results.append(run_mode("int8", qmodel, qvars, args.frames))
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
