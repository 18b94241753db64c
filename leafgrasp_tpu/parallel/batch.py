"""Multi-chip frame processing: data-parallel batched selection.

The reference has no parallelism (SURVEY.md 2.10); the TPU-native way to
scale frame throughput is sharding a frame batch over the `data` mesh
axis -- XLA partitions the whole fused pipeline per frame with zero
cross-chip traffic (each frame's scoring is independent), so throughput
scales linearly with chips over ICI.
"""

from __future__ import annotations

import functools
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from leafgrasp_tpu.config import PipelineConfig, DEFAULT_CONFIG
from leafgrasp_tpu.pipeline.frame import select_grasp

__all__ = ["make_batched_frame_fn"]


def make_batched_frame_fn(mesh: Mesh,
                          cfg: PipelineConfig = DEFAULT_CONFIG,
                          with_cnn: bool = False,
                          use_pallas: bool = False):
    """Returns fn(masks (B,H,W), depths (B,H,W), cx, cy, f[, variables])
    jitted with the batch dimension sharded over the mesh's data axis.

    B must be a multiple of the data-axis size.
    """
    if with_cnn:
        from leafgrasp_tpu.models.grasp_cnn import GraspPointCNN

        model = GraspPointCNN(cfg.model)

        def cnn_apply(variables, feats):
            return model.apply(variables, feats, train=False)
    else:
        cnn_apply = None

    def one(mask, depth, cx, cy, f, variables):
        return select_grasp(mask, depth, cx, cy, f,
                            cnn_variables=variables, cnn_apply=cnn_apply,
                            cfg=cfg, use_pallas=use_pallas)

    batched = jax.vmap(one, in_axes=(0, 0, None, None, None, None))

    data_sharding = NamedSharding(mesh, P("data"))
    replicated = NamedSharding(mesh, P())

    @functools.partial(jax.jit, static_argnums=())
    def run(masks, depths, cx, cy, f, variables=None):
        masks = jax.lax.with_sharding_constraint(masks, data_sharding)
        depths = jax.lax.with_sharding_constraint(depths, data_sharding)
        return batched(masks, depths, cx, cy, f, variables)

    def fn(masks, depths, cx, cy, f, variables=None):
        masks = jax.device_put(jnp.asarray(masks, jnp.int32),
                               data_sharding)
        depths = jax.device_put(jnp.asarray(depths, jnp.float32),
                                data_sharding)
        if variables is not None:
            variables = jax.device_put(variables, replicated)
        with mesh:
            return run(masks, depths, cx, cy, f, variables)

    return fn
