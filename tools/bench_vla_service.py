#!/usr/bin/env python3
"""End-to-end VLA-ENHANCED service on one chip: the reference VLA node.

The reference's VLA node runs leaf selection -> candidate rerank ->
grasp selection per live frame in one process
(leaf_grasp_node_vla.py:97-146). The rebuild's halves were measured
separately (frame ~13-18 ms, int8 rerank ~489 ms); this tool runs them
as ONE GraspService on the real chip (VERDICT r2 item 4):

* GraspService(hybrid_selector=HybridGraspSelector(VLAProcessor(
  LlavaJaxScorer))) with randomized 7B-dims weights (zero egress;
  throughput is weight-agnostic) at --quantize int8 (serving default,
  PERF.md) or bf16;
* frames enter through on_mask/on_depth/on_rgb + process_pending --
  the full host path (framebus pair-matching, rate gate forced off);
* measures combined frames/sec, the per-stage split (select_grasp /
  vla_rerank / vla_reselect / finalize from the service StageTimer),
  and HBM co-residency of the frame program beside the VLA weights;
* A/B in ONE process (PERF.md measurement rules): serial
  (pipeline_depth=0, frame -> rerank -> finalize) vs overlapped
  (pipeline_depth=1: the next frame's grasp program is dispatched
  before the previous frame's host-driven rerank decode, VERDICT r3
  item 2), alternating batches, best-of per mode;
* degradation: after the measured frames, the scorer is broken
  (raises) and more frames are processed -- the service must keep
  publishing geometric results (leaf_grasp_node_vla.py:133-137).

A fixed-length stub tokenizer keeps every prompt at one (B, T) shape so
each program compiles once; its decode is an injective token->decimal
hash so VLA scores vary across candidates and the confidence ladder is
exercised (randomized weights cannot produce real decimals).

Usage: python tools/bench_vla_service.py [--frames 10]
           [--quantize int8|none] [--tiny] [--json]
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

N_TEXT = 60


class _FixedLenTok:
    """Fixed encode length (one compiled (B, T) program) + injective
    decode -> decimal (varied parsed scores from randomized weights)."""

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


def device_mem_gb():
    """(gb, method). The tunnelled axon backend's ``memory_stats()``
    returns None (no allocator telemetry crosses the tunnel), so fall
    back to summing live committed device buffers -- a real lower bound
    on HBM residency (it counts our weights/caches but not XLA's
    transient scratch). VERDICT r4 item 3."""
    try:
        import jax
        s = jax.devices()[0].memory_stats()
        if s is not None:
            return round(s.get("bytes_in_use", 0) / 2 ** 30, 2), \
                "allocator_bytes_in_use"
        live = sum(int(np.prod(a.shape)) * a.dtype.itemsize
                   for a in jax.live_arrays())
        return round(live / 2 ** 30, 2), "live_buffer_bytes"
    except Exception:
        return None, "unavailable"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=10)
    ap.add_argument("--quantize", choices=["none", "int8"],
                    default="int8")
    ap.add_argument("--tiny", action="store_true",
                    help="tiny dims smoke run (CPU-safe)")
    ap.add_argument("--anyres", action="store_true",
                    help="serve the v1.6 anyres tiling path (the "
                         "reference pipeline's mode, "
                         "llava_processor.py:18-46): ~2.3k image "
                         "tokens/frame instead of 576")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--out", default=None,
                    help="also write the record to this JSON file "
                         "(default: artifacts/vla_service_bench.json "
                         "for full-dims runs; bench.py surfaces it as "
                         "vla_service_fps)")
    args = ap.parse_args()

    import dataclasses
    import jax
    from bench_vla import build
    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.io.scenes import make_leaf_scene
    from leafgrasp_tpu.models.grasp_cnn import init_grasp_cnn
    from leafgrasp_tpu.pipeline.ingest import GraspService
    from leafgrasp_tpu.vla.hybrid import HybridGraspSelector
    from leafgrasp_tpu.vla.llava_jax import LlavaJax, LlavaJaxConfig
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
    from leafgrasp_tpu.vla.processor import VLAProcessor

    # anyres serving defaults (PERF.md "anyres serving", r5): flash
    # prefill (Pallas online-softmax kernel; engages on TPU only, so
    # --tiny CPU smokes take the chunked fall-back) -- the 2.4k-token
    # B=5 prefill is the binding stage and flash removes its f32 score
    # HBM round trips. Measured greedy-token-parity vs chunked.
    prefill_impl = "flash" if args.anyres else "chunked"
    if args.tiny:
        cfg_l = LlavaJaxConfig(
            vis_hidden=16, vis_intermediate=32, vis_layers=1, vis_heads=2,
            image_size=28, patch_size=14, vocab_size=128, hidden=16,
            intermediate=32, layers=2, heads=2, kv_heads=1,
            image_token_index=100, dtype="bfloat16",
            prefill_attn_impl=prefill_impl,
            image_grid_pinpoints=((28, 56), (56, 28), (56, 56))
            if args.anyres else None)
    else:
        cfg_l = LlavaJaxConfig(
            dtype="bfloat16", prefill_attn_impl=prefill_impl,
            image_grid_pinpoints=((336, 672), (672, 336), (672, 672),
                                  (1008, 336), (336, 1008))
            if args.anyres else None)   # full 7B dims

    t0 = time.monotonic()
    if args.quantize == "int8":
        from bench_vla import build_quantized
        model, variables = build_quantized(cfg_l)
    else:
        model, variables = build(cfg_l)
    if args.anyres:
        # build() randomizes the init shape-tree, which has no anyres
        # tile separator; real v1.6 safetensors carry it
        import jax.numpy as jnp
        variables["params"]["image_newline"] = jnp.asarray(
            0.02 * np.random.default_rng(7).standard_normal(
                cfg_l.hidden),
            variables["params"]["embed_tokens"]["embedding"].dtype)
    scorer = LlavaJaxScorer(model, variables,
                            _FixedLenTok(model.cfg.vocab_size),
                            max_new_tokens=10, decode_mode="steps",
                            anyres=args.anyres)
    t_build = time.monotonic() - t0
    mem_weights, mem_method = device_mem_gb()

    cfg = DEFAULT_CONFIG                      # enhanced union isolation
    _, cnn_vars = init_grasp_cnn(jax.random.PRNGKey(0), cfg.model)
    # per-service sinks so published counts don't conflate the A/B
    # modes (ADVICE r4); the recorded `stages` cover the SERIAL service
    # only (its timer is the one reset after rep 0)
    published = {"serial": [], "overlap": []}

    def make_svc(depth_n, sink):
        return GraspService(cfg, cnn_variables=cnn_vars,
                            hybrid_selector=HybridGraspSelector(
                                VLAProcessor(scorer)),
                            publish=published[sink].append,
                            min_interval_s=0.0,   # measure, don't gate
                            pipeline_depth=depth_n)

    svc = make_svc(0, "serial")               # serial: the r2/r3 mode
    svc_over = make_svc(1, "overlap")         # overlapped (VERDICT r3 #2)

    # mixed families (bench.py): leaf count + area drive the adaptive
    # EDT band and the window ladder
    fams = [(6, 8, 120), (12, 3, 60), (3, 5, 260)]
    scenes = [make_leaf_scene(cfg.frame.height, cfg.frame.width,
                              num_leaves=n, seed=s, margin=m)
              for n, s, m in fams]
    rgb = (np.random.default_rng(0)
           .uniform(0, 255, (cfg.frame.height, cfg.frame.width, 3))
           .astype(np.uint8))
    svc.on_rgb(rgb)
    svc_over.on_rgb(rgb)

    def feed(s, i):
        mask, depth = scenes[i % len(scenes)]
        s.on_mask(np.roll(mask, 3 * i, axis=1), stamp_us=i)
        s.on_depth(np.roll(depth, 3 * i, axis=1), stamp_us=i)

    # warmup: compile frame program + tower + prefill + decode steps
    feed(svc, 0)
    out = svc.process_pending(force=True)
    assert out is not None and out["found"], "warmup frame failed"
    print(f"warmup ok in {time.monotonic() - t0:.0f}s "
          f"(build {t_build:.0f}s); vla={out['vla'] is not None}",
          flush=True)
    feed(svc_over, 0)                         # its own frame fn compiles
    svc_over.process_pending(force=True)
    svc_over.flush()
    from leafgrasp_tpu.utils.profiler import StageTimer
    svc.timer = StageTimer()                  # drop warmup from stages

    def run_batch(s, n, i0):
        """Wall time for n frames through service s (drained)."""
        n_vla = 0
        t = time.monotonic()
        for i in range(i0, i0 + n):
            feed(s, i)
            out = s.process_pending(force=True)
            if out is not None:
                assert out["found"]
                n_vla += out["vla"] is not None
        for out in s.flush():
            assert out["found"]
            n_vla += out["vla"] is not None
        return time.monotonic() - t, n_vla

    # interleaved A/B batches, best-of per mode (PERF.md rules);
    # rep 0 also flushes any remaining lazy compiles (e.g. the first
    # VLA-disagreement reselect), so the stage timer resets after it
    # and the recorded stage means are steady-state
    half = max(2, args.frames // 2)
    walls = {"serial": [], "overlap": []}
    n_vla = 0
    for rep in range(3):
        w, v = run_batch(svc, half, 1 + 2 * rep * half)
        walls["serial"].append(w / half)
        n_vla += v
        w, v = run_batch(svc_over, half, 1 + (2 * rep + 1) * half)
        walls["overlap"].append(w / half)
        if rep == 0:
            svc.timer = StageTimer()
        print(f"rep {rep}: serial {walls['serial'][-1] * 1e3:.0f} "
              f"ms/frame, overlap {walls['overlap'][-1] * 1e3:.0f}",
              flush=True)
    best_serial = min(walls["serial"])
    best_over = min(walls["overlap"])
    mem_peak, _ = device_mem_gb()
    stages = {k: dict(mean_ms=round(v["mean_ms"], 1),
                      count=v["count"])
              for k, v in svc.timer.summary().items()}

    # degradation 1 (inner, llava_processor.py:35-36): the backend
    # raises -> VLAProcessor returns uniform 0.5 scores -> a choice
    # still comes back, strategy GEOMETRIC_ONLY at the low confidence
    class _Boom:
        def score(self, *a, **k):
            raise RuntimeError("backend failure injection")
    svc.hybrid_selector.processor.backend = _Boom()
    feed(svc, 10 * args.frames + 1)
    out1 = svc.process_pending(force=True)
    inner_ok = bool(out1 is not None and out1["found"]
                    and out1["vla"] is not None)
    inner_strategy = out1["vla"]["strategy"] if inner_ok else None

    # degradation 2 (outer, leaf_grasp_node_vla.py:133-137): the whole
    # selector raises (e.g. device OOM) -> GraspService catches and the
    # geometric result publishes with vla=None
    class _Raiser:
        def select_grasp_point(self, *a, **k):
            raise RuntimeError("selector failure injection (OOM)")
    svc.hybrid_selector = _Raiser()
    feed(svc, 10 * args.frames + 2)
    out2 = svc.process_pending(force=True)
    degraded_ok = bool(out2 is not None and out2["found"]
                       and out2["message"] and out2["vla"] is None)

    rec = dict(
        metric="vla_enhanced_service_frames_per_sec",
        frames=args.frames, value=round(1.0 / best_serial, 3),
        ms_per_frame=round(best_serial * 1e3, 1),
        overlap_fps=round(1.0 / best_over, 3),
        overlap_ms_per_frame=round(best_over * 1e3, 1),
        overlap_speedup=round(best_serial / best_over, 3),
        ab_ms_per_frame={k: [round(x * 1e3, 1) for x in v]
                         for k, v in walls.items()},
        vla_reranked_frames=n_vla,
        quantize=args.quantize, dims="tiny" if args.tiny else "7B",
        anyres=args.anyres,
        stages=stages,
        stages_note="stages cover the serial service only",
        published={k: len(v) for k, v in published.items()},
        hbm_gb_after_weights=mem_weights, hbm_gb_peak_seen=mem_peak,
        hbm_method=mem_method,
        inner_degradation_uniform_scores_ok=inner_ok,
        inner_degradation_strategy=inner_strategy,
        degraded_geometric_fallback_ok=degraded_ok)
    print(json.dumps(rec, indent=None if args.json else 2))

    out_path = args.out
    if out_path is None and not args.tiny:
        out_path = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "artifacts",
            "vla_service_bench.json")
    if out_path:
        rec["recorded_unix"] = int(time.time())
        rec["backend"] = jax.default_backend()
        try:
            import subprocess
            rec["git_rev"] = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"],
                capture_output=True, text=True, timeout=10,
                cwd=os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))),
            ).stdout.strip() or None
        except Exception:
            rec["git_rev"] = None
        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(rec, f, indent=2)
        print(f"wrote {out_path}", file=sys.stderr)


if __name__ == "__main__":
    main()
