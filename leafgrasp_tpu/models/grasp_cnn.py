"""GraspPointCNN: self-supervised grasp-quality attention CNN, in Flax.

TPU-native rebuild of the reference model (ml_grasp_optimizer/model.py:5-128):
9-channel 32x32 patches -> configurable Conv-BN-ReLU x2 + maxpool +
dropout encoder blocks -> {spatial | channel | hybrid | none} attention ->
GAP -> BN-MLP classifier -> single logit.

Differences by design:
* NHWC layout (TPU-preferred) instead of NCHW;
* all candidate patches are scored in ONE batched forward (the reference
  runs 20 sequential forwards, SURVEY.md section 3.1);
* weights initialize with the same Kaiming scheme (fan-out for convs,
  fan-in for dense, zeros bias -- model.py:89-100).
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import flax.linen as nn

from leafgrasp_tpu.config import ModelConfig

__all__ = ["GraspPointCNN", "init_grasp_cnn", "ml_scores_from_logits",
           "ARCHITECTURES"]

# The 4 encoder architectures swept by the reference
# (mlflow_experiment_configs.py:84-116).
ARCHITECTURES = {
    "lightweight": (32, 64, 128),
    "standard": (64, 128, 256),
    "deep": (32, 64, 128, 256),
    "wide": (128, 256, 512),
}

_conv_init = nn.initializers.variance_scaling(2.0, "fan_out",
                                              "truncated_normal")
_dense_init = nn.initializers.variance_scaling(2.0, "fan_in",
                                               "truncated_normal")
# Attention projections feed a sigmoid gate: Kaiming fan-out on a 1-channel
# 1x1 conv gives std sqrt(2) and saturates the gate at init (the torch
# reference carries the same latent hazard, model.py:33-36+92). LeCun
# fan-in keeps the gate in its linear region -- documented divergence.
_gate_init = nn.initializers.variance_scaling(1.0, "fan_in",
                                              "truncated_normal")


class _EncoderBlock(nn.Module):
    filters: int
    dropout: float

    @nn.compact
    def __call__(self, x, train: bool):
        for _ in range(2):
            x = nn.Conv(self.filters, (3, 3), padding="SAME",
                        kernel_init=_conv_init)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class _AttentionGate(nn.Module):
    """Unified spatial/channel/hybrid gating. The same parameters drive
    either the plain JAX path or the fused Pallas kernel
    (models/attention_pallas.py), selected by `use_pallas`."""

    mode: str
    reduction: int = 16
    use_pallas: bool = False

    @nn.compact
    def __call__(self, x):
        if self.mode == "none":
            return x
        c = x.shape[-1]
        r = max(c // self.reduction, 1)

        if self.mode in ("spatial", "hybrid"):
            ws = self.param("spatial_kernel", _gate_init, (c, 1))
            bs = self.param("spatial_bias", nn.initializers.zeros, (1,))
        else:
            ws = jnp.zeros((c, 1), x.dtype)
            bs = jnp.zeros((1,), x.dtype)
        if self.mode in ("channel", "hybrid"):
            w1 = self.param("squeeze_kernel", _gate_init, (c, r))
            b1 = self.param("squeeze_bias", nn.initializers.zeros, (r,))
            w2 = self.param("excite_kernel", _gate_init, (r, c))
            b2 = self.param("excite_bias", nn.initializers.zeros, (c,))
        else:
            w1 = jnp.zeros((c, r), x.dtype)
            b1 = jnp.zeros((r,), x.dtype)
            w2 = jnp.zeros((r, c), x.dtype)
            b2 = jnp.zeros((c,), x.dtype)

        from leafgrasp_tpu.models.attention_pallas import (
            fused_attention_gate, attention_gate_reference)
        if self.use_pallas:
            return fused_attention_gate(x, ws, bs, w1, b1, w2, b2,
                                        self.mode)
        return attention_gate_reference(x, ws, bs, w1, b1, w2, b2,
                                        self.mode)


class GraspPointCNN(nn.Module):
    cfg: ModelConfig = ModelConfig()

    @nn.compact
    def __call__(self, x, train: bool = False):
        """x: (N, P, P, C) NHWC float32 -> (N, 1) logits."""
        cfg = self.cfg
        for filters in cfg.encoder_filters:
            x = _EncoderBlock(filters, cfg.conv_dropout)(x, train)

        if cfg.attention_type not in ("spatial", "channel", "hybrid",
                                      "none"):
            raise ValueError(f"unknown attention {cfg.attention_type!r}")
        x = _AttentionGate(cfg.attention_type, cfg.se_reduction,
                           cfg.pallas_attention, name="attention")(x)

        x = jnp.mean(x, axis=(1, 2))                           # GAP -> (N, C)

        final = cfg.encoder_filters[-1]
        widths = (final, final // 2, final // 4)
        for width, drop in zip(widths, cfg.fc_dropout):
            x = nn.Dense(width, kernel_init=_dense_init)(x)
            x = nn.BatchNorm(use_running_average=not train)(x)
            x = nn.relu(x)
            x = nn.Dropout(drop, deterministic=not train)(x)
        return nn.Dense(1, kernel_init=_dense_init)(x)

    def num_params(self, variables) -> int:
        return sum(p.size for p in jax.tree.leaves(variables["params"]))


def init_grasp_cnn(rng, cfg: ModelConfig = ModelConfig(), patch_size: int = 32):
    """Initialize variables (params + batch_stats)."""
    model = GraspPointCNN(cfg)
    dummy = jnp.zeros((1, patch_size, patch_size, cfg.in_channels),
                      jnp.float32)
    variables = model.init({"params": rng}, dummy, train=False)
    return model, variables


def ml_scores_from_logits(logits: jnp.ndarray,
                          spread_scale: float = 3.0) -> jnp.ndarray:
    """sigmoid -> tanh spread, exactly as served
    (grasp_point_selector.py:133-136)."""
    s = jax.nn.sigmoid(logits.reshape(-1))
    return jnp.tanh(s * spread_scale) * 0.5 + 0.5
