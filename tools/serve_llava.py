#!/usr/bin/env python3
"""One-command LLaVA rerank serving from a checkpoint directory.

The reference's serving entry is the transformers pipeline inside
LLaVAProcessor (vla_system/llava_processor.py:18-51): point it at
``llava-hf/llava-v1.6-mistral-7b-hf`` and it loads + reranks leaf
candidates. This CLI is the self-contained JAX equivalent::

    python tools/serve_llava.py /path/to/checkpoint \
        [--dtype bfloat16] [--quantize int8|int4] [--anyres] \
        [--lora-rank 8 --adapter adapter.npz] \
        [--framelog run.flog | --seed 8] [--decode-mode steps]

Pipeline: checkpoint_io.load_llava_checkpoint (config.json +
safetensors + tokenizer.model, zero transformers/torch) ->
LlavaJaxScorer (batched rerank; --anyres enables the v1.6 tiling the
reference model actually uses) -> VLAProcessor -> HybridGraspSelector
-> per-candidate scores + fused choice for one frame: either a frame
from a recorded native framelog (io/framelog.py) or a synthetic scene.

Candidates come from the REAL leaf stage (select_grasp on the frame ->
leaf_candidates), so the printed rerank is the production VLA-node
flow (leaf_grasp_node_vla.py:97-146) end to end.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def build_scorer(args):
    from leafgrasp_tpu.vla.checkpoint_io import load_llava_checkpoint
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer

    quantize = args.quantize != "none"
    model, variables, tok = load_llava_checkpoint(
        args.checkpoint,
        lora_rank=args.lora_rank,
        dtype=args.dtype,
        quantize=quantize,
        quant_bits={"int8": 8, "int4": 4}.get(args.quantize, 8),
        quant_group=args.quant_group)
    if args.adapter:
        import flax.traverse_util as tu
        from leafgrasp_tpu.vla.lora import merge_lora_params
        data = np.load(os.path.expanduser(args.adapter))
        adapter = tu.unflatten_dict(
            {tuple(k.split("/")): v for k, v in data.items()})
        variables = {"params": merge_lora_params(variables["params"],
                                                 adapter)}
    impl = args.prefill_impl
    if impl == "auto":
        # anyres serving default (PERF.md "anyres serving"): the Pallas
        # flash prefill wins on the 2.4k-token anyres prompts and
        # engages on TPU only; single-tile prompts keep chunked
        impl = "flash" if args.anyres else "chunked"
    if impl != model.cfg.prefill_attn_impl:
        import dataclasses as _dc
        from leafgrasp_tpu.vla.llava_jax import LlavaJax
        model = LlavaJax(_dc.replace(model.cfg, prefill_attn_impl=impl))
    scorer = LlavaJaxScorer(
        model, variables, tok,
        max_new_tokens=args.max_new_tokens,
        max_batch=args.max_batch or None,
        decode_mode=args.decode_mode,
        decode_weight_layout=args.weight_layout,
        anyres=args.anyres)
    return scorer


def load_frame(args, cfg):
    """(mask, depth, rgb) from a framelog or a synthetic scene."""
    if args.framelog:
        from leafgrasp_tpu.io.framelog import FrameLogReader
        with FrameLogReader(args.framelog) as rd:
            if len(rd) == 0:
                raise SystemExit(f"framelog {args.framelog} is empty")
            mask, depth, _ = rd.frame(args.frame_index)
            mask, depth = np.array(mask), np.array(depth)
    else:
        from leafgrasp_tpu.io.scenes import make_leaf_scene
        margin = min(120, cfg.frame.height // 6, cfg.frame.width // 6)
        mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                      num_leaves=6, seed=args.seed,
                                      margin=margin)
    # grayscale stand-in RGB when no camera image is recorded: the
    # depth map rendered to [0, 255] (the scorer only needs an image)
    d = depth.astype(np.float32)
    rng = d.max() - d.min()
    rgb = np.zeros(d.shape + (3,), np.uint8) if rng <= 0 else (
        np.repeat(((d - d.min()) / rng * 255).astype(np.uint8)[..., None],
                  3, axis=-1))
    return mask, depth, rgb


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("checkpoint", help="HF-layout checkpoint dir "
                    "(config.json + safetensors + tokenizer.model)")
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--quantize", default="none",
                    choices=["none", "int8", "int4"],
                    help="weight-only quantized serving (vla/quant.py; "
                    "int8 measured 1.84x decode on one v5e, PERF.md)")
    ap.add_argument("--quant-group", type=int, default=128)
    ap.add_argument("--anyres", action="store_true",
                    help="LLaVA-NeXT (v1.6) grid-pinpoint tiling -- the "
                    "reference model's image path")
    ap.add_argument("--lora-rank", type=int, default=0)
    ap.add_argument("--adapter", default="",
                    help="LoRA adapter .npz (vla/lora.py save format)")
    ap.add_argument("--prefill-impl", default="auto",
                    choices=["auto", "chunked", "flash"],
                    help="prefill attention: 'flash' = Pallas "
                         "online-softmax kernel (TPU; the anyres "
                         "serving default), 'chunked' = query-chunk "
                         "scan; 'auto' picks flash for --anyres")
    ap.add_argument("--decode-mode", default="steps",
                    choices=["scan", "steps"],
                    help="steps fits a bf16 7B batch-5 rerank on one "
                    "16 GB chip (PERF.md memory trick 4)")
    ap.add_argument("--weight-layout", default="default",
                    choices=["default", "auto"])
    ap.add_argument("--max-new-tokens", type=int, default=10)
    ap.add_argument("--max-batch", type=int, default=0)
    ap.add_argument("--framelog", default="",
                    help="recorded native framelog to serve from")
    ap.add_argument("--frame-index", type=int, default=0)
    ap.add_argument("--seed", type=int, default=8,
                    help="synthetic scene seed when no framelog given")
    ap.add_argument("--candidates", type=int, default=5)
    ap.add_argument("--frame-size", nargs=2, type=int, default=None,
                    metavar=("H", "W"),
                    help="frame dims for the synthetic scene / leaf "
                    "stage (default: production 1080 1440)")
    ap.add_argument("--instruction",
                    default="Select the best leaf for grasping")
    ap.add_argument("--json", action="store_true",
                    help="emit one machine-readable JSON line")
    args = ap.parse_args(argv)

    from leafgrasp_tpu.config import DEFAULT_CONFIG
    from leafgrasp_tpu.pipeline.frame import make_frame_fn
    from leafgrasp_tpu.pipeline.ingest import leaf_candidates
    from leafgrasp_tpu.vla.processor import VLAProcessor
    from leafgrasp_tpu.vla.hybrid import HybridGraspSelector

    cfg = DEFAULT_CONFIG
    if args.frame_size:
        import dataclasses
        from leafgrasp_tpu.config import (FrameConfig,
                                          LeafSelectionConfig)
        from leafgrasp_tpu.config import CameraConfig
        h, w = args.frame_size
        cfg = dataclasses.replace(
            DEFAULT_CONFIG,
            frame=FrameConfig(height=h, width=w, max_leaves=8),
            camera=CameraConfig(fx=2.0 * w, cx=w / 2.0, cy=h / 2.0),
            leaf=LeafSelectionConfig(min_leaf_area=max(
                64, h * w // 200)))
    mask, depth, rgb = load_frame(args, cfg)

    t0 = time.monotonic()
    scorer = build_scorer(args)
    t_load = time.monotonic() - t0
    print(f"loaded {args.checkpoint} dtype={args.dtype} "
          f"quantize={args.quantize} anyres={args.anyres} "
          f"in {t_load:.1f}s", file=sys.stderr)

    # real leaf stage -> candidates (leaf_grasp_node_vla.py:148-182,
    # with the broken _calculate_all_scores call fixed by design)
    fn = make_frame_fn(cfg, with_cnn=False)
    res = fn(mask.astype(np.int32), depth.astype(np.float32),
             np.float32(cfg.camera.cx), np.float32(cfg.camera.cy),
             np.float32(cfg.camera.fx))
    cands = leaf_candidates(res.leaf_selection,
                            max_candidates=args.candidates)
    if not cands:
        raise SystemExit("no area-valid leaf candidates in this frame")

    t1 = time.monotonic()
    selector = HybridGraspSelector(VLAProcessor(scorer))
    best = selector.select_grasp_point(rgb, cands, args.instruction)
    t_rerank = time.monotonic() - t1

    if args.json:
        print(json.dumps(dict(
            candidates=cands, best=best, rerank_s=round(t_rerank, 3),
            load_s=round(t_load, 1))))
        return
    print(f"\n{len(cands)} candidates (leaf stage), "
          f"rerank {t_rerank * 1e3:.0f} ms:")
    for c in cands:
        tag = " <= selected" if best and c["leaf_id"] == best.get(
            "leaf_id") else ""
        print(f"  leaf {c['leaf_id']:2d} @({c['x']:7.1f},{c['y']:7.1f}) "
              f"geo={c['geometric_score']:.3f}{tag}")
    print(f"strategy={best['strategy']} "
          f"confidence={best['vla_confidence']:.3f}")


if __name__ == "__main__":
    main()
