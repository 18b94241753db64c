#!/usr/bin/env python3
"""End-to-end demo: synthetic scene -> grasp selection -> visualization.

The offline equivalent of the reference's v3 node session
(leaf_grasp_node_v3.py): prints the published message and writes the
composite visualization PNG.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import argparse
    from leafgrasp_tpu.config import DEFAULT_CONFIG, load_config
    from leafgrasp_tpu.io.scenes import make_leaf_scene, default_projection
    from leafgrasp_tpu.pipeline.ingest import GraspService
    from leafgrasp_tpu.pipeline.visualizer import LeafVisualizer

    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default=None,
                    help="YAML/JSON config file (e.g. configs/baseline.yaml)")
    args = ap.parse_args()
    cfg = load_config(args.config) if args.config else DEFAULT_CONFIG
    mask, depth = make_leaf_scene(cfg.frame.height, cfg.frame.width,
                                  num_leaves=6, seed=8)

    svc = GraspService(cfg, publish=lambda m: print("publish:", m))
    svc.set_camera_params(default_projection())
    svc.on_mask(mask)
    svc.on_depth(depth)
    out = svc.process_pending(force=True)
    if out is None or not out["found"]:
        print("no grasp found")
        return

    res = out["result"]
    print(f"leaf {int(res.leaf_id)}  uv {np.asarray(res.grasp_uv)}  "
          f"3d {np.asarray(res.grasp_xyz).round(4)}  "
          f"pre {np.asarray(res.pre_grasp_xyz).round(4)}  "
          f"degenerate={bool(res.degenerate)}")

    tall = [i + 1 for i, t in
            enumerate(np.asarray(res.leaf_selection.is_tall)) if t]
    vis = LeafVisualizer(os.path.expanduser("~/leafgrasp_out/vis"))
    path = vis.visualize_result(mask, int(res.leaf_id),
                                np.asarray(res.grasp_uv),
                                np.asarray(res.grasp_xyz),
                                np.asarray(res.pre_grasp_xyz),
                                tall_leaves=tall)
    print("visualization:", path)
    print(svc.timer.report())


if __name__ == "__main__":
    main()
