#!/usr/bin/env python3
"""End-to-end VLA rerank quality on the HARD corpus through GraspService.

VERDICT r3 item 4: the VLA quality artifacts stopped at ranking metrics
on synthetic candidate lists; nothing showed the rerank changing (or
correctly not changing) grasp OUTCOMES through the full service path.
This runs GraspService twice over the hard production scenes -- once
geometric(+CNN)-only, once with hybrid_selector wired to the trained
LLaVA-arch LoRA scorer (tools/train_llava_lora.py artifacts:
llava_arch_base.npz + llava_arch_adapter.npz) -- the working analogue
of the reference's VLA node (scripts/leaf_grasp_node_vla.py:97-146)
next to its v3 node, and reports

  * leaf_agreement        -- fraction of frames choosing the same leaf
  * px_shift_mean/max     -- grasp-point distance when the leaf differs
                             (the rerank's outcome-level effect; the
                             reference's hybrid README rows
                             README.md:151-153 are the rig analogue)
  * strategy_distribution -- the confidence-ladder regimes actually
                             exercised (vla/hybrid.py ladder)
  * vla_fallback_frames   -- frames where the scorer failed/was skipped
                             and the service degraded geometrically

Writes artifacts/system_accuracy_vla.json; one summary line to stdout.
Scenes carry a rendered RGB composite (mask palette + depth shading)
so the tiny scorer sees an image correlated with the geometry.
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(
    os.path.abspath(__file__)), ".."))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_tpu"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import numpy as np

# the tiny LLaVA-architecture config train_llava_lora.py pretrains
# (must match the shipped base/adapters exactly)
_ARCH = dict(vis_hidden=64, vis_intermediate=128, vis_layers=2,
             vis_heads=4, image_size=28, patch_size=14, vocab_size=272,
             hidden=128, intermediate=256, layers=3, heads=4,
             kv_heads=2, image_token_index=264)


def load_arch_scorer(vla_dir: str, max_new_tokens: int = 6):
    """Rebuild the trained LLaVA-arch LoRA scorer from the shipped
    base + adapter npz artifacts."""
    import jax
    import jax.numpy as jnp
    import flax.traverse_util as tu
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax, LlavaJaxConfig,
                                             attach_lora)
    from leafgrasp_tpu.vla.lora import merge_lora_params
    from leafgrasp_tpu.vla.lm import ByteTokenizer
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer

    base_npz = np.load(os.path.join(vla_dir, "llava_arch_base.npz"))
    base = tu.unflatten_dict({tuple(k.split("/")): jnp.asarray(v)
                              for k, v in base_npz.items()})
    lcfg = LlavaJaxConfig(**_ARCH, lora_rank=8, lora_alpha=16.0)
    lmodel = LlavaJax(lcfg)
    lvars = attach_lora(lmodel, {"params": base}, jax.random.PRNGKey(1))
    ad_npz = np.load(os.path.join(vla_dir, "llava_arch_adapter.npz"))
    adapters = tu.unflatten_dict({tuple(k.split("/")): jnp.asarray(v)
                                  for k, v in ad_npz.items()})
    lvars = {"params": merge_lora_params(lvars["params"], adapters)}
    return LlavaJaxScorer(lmodel, lvars, ByteTokenizer(),
                          max_new_tokens=max_new_tokens)


def render_rgb(mask: np.ndarray, depth: np.ndarray) -> np.ndarray:
    """Deterministic RGB composite: per-leaf palette + depth shading
    (stands in for the camera image the reference node feeds its VLA,
    leaf_grasp_node_vla.py:107)."""
    rng = np.random.default_rng(7)
    palette = rng.integers(40, 220, (int(mask.max()) + 1, 3))
    palette[0] = (12, 10, 8)
    rgb = palette[mask]
    d = depth - depth.min()
    shade = 0.55 + 0.45 * (1.0 - d / max(float(d.max()), 1e-6))
    return np.clip(rgb * shade[..., None], 0, 255).astype(np.uint8)


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", type=int, default=26)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--width", type=int, default=1440)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    from leafgrasp_tpu.config import (PipelineConfig, FrameConfig,
                                      LeafSelectionConfig, ModelConfig,
                                      MLFusionConfig)
    from leafgrasp_tpu.io.scenes import make_hard_leaf_scene
    from leafgrasp_tpu.models.grasp_cnn import ARCHITECTURES
    from leafgrasp_tpu.pipeline.ingest import GraspService
    from leafgrasp_tpu.training.checkpoint import load_checkpoint
    from leafgrasp_tpu.vla.hybrid import HybridGraspSelector
    from leafgrasp_tpu.vla.processor import VLAProcessor

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h, w = args.height, args.width
    cfg = PipelineConfig(
        frame=FrameConfig(height=h, width=w, max_leaves=8),
        leaf=LeafSelectionConfig(
            min_leaf_area=10000 if h >= 1080 else 1500),
        model=ModelConfig(attention_type="spatial",
                          encoder_filters=ARCHITECTURES["deep"]),
        fusion=MLFusionConfig(patch_normalization="train_stats"))

    # the shipped hard-corpus CNN (spatial_deep, F1 95.6)
    ckpt = os.path.join(root, "artifacts", "grasp_cnn_hard",
                        "best_model")
    restored = load_checkpoint(ckpt)
    cnn_vars = jax.device_put({"params": restored["params"],
                               "batch_stats": restored["batch_stats"]})
    norm_stats = restored["norm_stats"]

    scorer = load_arch_scorer(os.path.join(root, "artifacts", "vla"))

    def make_service(hybrid):
        return GraspService(cfg, cnn_variables=cnn_vars,
                            cnn_norm_stats=norm_stats,
                            hybrid_selector=hybrid,
                            min_interval_s=0.0)

    svc_geo = make_service(None)
    svc_vla = make_service(HybridGraspSelector(VLAProcessor(scorer)))
    cam = np.array([[1750.68, 0.0, 707.87, 0.0],
                    [0.0, 1750.68, 494.07, 0.0],
                    [0.0, 0.0, 1.0, 0.0]])
    svc_geo.set_camera_params(cam)
    svc_vla.set_camera_params(cam)

    rows, strategies = [], {}
    fallbacks = 0
    t0 = time.monotonic()
    for seed in range(args.scenes):
        n_leaves = (4, 6, 8)[seed % 3]
        mask, depth = make_hard_leaf_scene(h, w, num_leaves=n_leaves,
                                           seed=100 + seed, margin=120)
        rgb = render_rgb(mask, depth)
        svc_vla.on_rgb(rgb)
        out_g = svc_geo.process_frame(mask, depth)
        out_v = svc_vla.process_frame(mask, depth)
        if not (out_g["found"] and out_v["found"]) \
                or out_g["degenerate"] or out_v["degenerate"]:
            continue
        uv_g = np.asarray(out_g["result"].grasp_uv)
        uv_v = np.asarray(out_v["result"].grasp_uv)
        vla = out_v["vla"]
        if vla is None:
            fallbacks += 1
            strat, conf = "FALLBACK", None
        else:
            strat = vla["strategy"]
            conf = round(float(vla["vla_confidence"]), 4)
        strategies[strat] = strategies.get(strat, 0) + 1
        rows.append({
            "seed": 100 + seed, "n_leaves": n_leaves,
            "leaf_geo": int(out_g["result"].leaf_id),
            "leaf_vla": int(out_v["result"].leaf_id),
            "uv_geo": uv_g.tolist(), "uv_vla": uv_v.tolist(),
            "strategy": strat, "vla_confidence": conf,
            "vla_leaf": None if vla is None else int(vla["leaf_id"]),
        })
        print(f"seed={rows[-1]['seed']} leaves={n_leaves} "
              f"geo/vla leaf={rows[-1]['leaf_geo']}/"
              f"{rows[-1]['leaf_vla']} strat={strat} conf={conf}",
              flush=True)

    agree = [r for r in rows if r["leaf_geo"] == r["leaf_vla"]]
    moved = [r for r in rows if r["leaf_geo"] != r["leaf_vla"]]
    shifts = [float(np.hypot(r["uv_geo"][0] - r["uv_vla"][0],
                             r["uv_geo"][1] - r["uv_vla"][1]))
              for r in moved]
    summary = {
        "scenes": len(rows),
        "frame": [h, w],
        "scorer": "llava_arch_lora (artifacts/vla/llava_arch_base.npz "
                  "+ llava_arch_adapter.npz)",
        "cnn": "grasp_cnn_hard spatial_deep + train_stats norm",
        "leaf_agreement": round(len(agree) / max(len(rows), 1), 4),
        "leaves_changed": len(moved),
        "px_shift_changed_mean": round(float(np.mean(shifts)), 2)
        if shifts else None,
        "px_shift_changed_max": round(float(np.max(shifts)), 2)
        if shifts else None,
        "strategy_distribution": strategies,
        "vla_fallback_frames": fallbacks,
        "wall_s": round(time.monotonic() - t0, 1),
        "reference_match": "scripts/leaf_grasp_node_vla.py:97-146 + "
                           "README.md:151-153 hybrid rows",
        "rows": rows,
    }
    out = args.out or os.path.join(root, "artifacts",
                                   "system_accuracy_vla.json")
    with open(out, "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps({k: v for k, v in summary.items()
                      if k != "rows"}))


if __name__ == "__main__":
    main()
