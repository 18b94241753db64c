"""Parameter / batch sharding rules for pjit training.

Tensor-parallel rule: 2D dense kernels with an output dimension divisible
by the model axis are sharded column-wise (P(None, "model")); biases and
BN stats follow the kernel's output sharding; conv kernels (small, 4D)
replicate.  XLA/GSPMD then inserts the all-gathers / reduce-scatters over
ICI -- no hand-written collectives on this path.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["infer_param_shardings", "shard_variables", "shard_batch"]


# Modules whose 2D kernels shard column-wise over the model axis:
# classifier Dense layers and every transformer projection (the LoRA
# target set q/k/v/o/gate/up/down plus the LM head).
_TP_MARKERS = ("Dense", "q_proj", "k_proj", "v_proj", "o_proj",
               "gate_proj", "up_proj", "down_proj", "lm_head")


def _spec_for(path: str, leaf, model_size: int) -> P:
    marked = any(m in path for m in _TP_MARKERS)
    if leaf.ndim == 2 and leaf.shape[-1] % model_size == 0 \
            and leaf.shape[-1] >= model_size and marked:
        return P(None, "model")
    if leaf.ndim == 1 and marked \
            and ("bias" in path or "kernel_scale" in path) \
            and leaf.shape[0] % model_size == 0:
        # int8 per-output-channel scales (vla/quant.py) follow their
        # column-sharded kernel_q
        return P("model")
    return P()


def infer_param_shardings(variables, mesh: Mesh):
    """PyTree of NamedShardings matching `variables` (params+batch_stats)."""
    model_size = mesh.shape["model"]

    def to_sharding(path, leaf):
        keys = "/".join(str(getattr(p, "key", p)) for p in path)
        return NamedSharding(mesh, _spec_for(keys, leaf, model_size))

    return jax.tree_util.tree_map_with_path(to_sharding, variables)


def shard_variables(variables, mesh: Mesh):
    shardings = infer_param_shardings(variables, mesh)
    return jax.device_put(variables, shardings), shardings


def shard_batch(batch, mesh: Mesh):
    def put(x):
        spec = P("data", *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, batch)
