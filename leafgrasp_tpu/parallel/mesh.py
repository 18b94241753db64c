"""Device-mesh construction helpers.

The reference has no distributed layer at all (SURVEY.md section 2.10) --
its "parallelism" is three GPU processes polling a ROS parameter server.
Here scaling is expressed the TPU way: a ``jax.sharding.Mesh`` with named
axes and XLA-inserted collectives over ICI.

Axes:
  data  -- batch / frame data parallelism
  model -- tensor parallelism (dense/attention shards)
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P", "NamedSharding"]


def make_mesh(n_devices: int | None = None, model_axis: int = 1,
              devices=None) -> Mesh:
    """Build a (data, model) mesh over the first n devices.

    model_axis=1 -> pure data parallelism. For n divisible by model_axis
    the data axis is n // model_axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if n_devices % model_axis:
        raise ValueError(f"{n_devices} devices not divisible by "
                         f"model_axis={model_axis}")
    arr = np.asarray(devices).reshape(n_devices // model_axis, model_axis)
    return Mesh(arr, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def largest_pow2_leq(n: int) -> int:
    return 1 << (n.bit_length() - 1) if n > 0 else 1
