"""Weight-only int8 quantization for the LLaVA language model.

The reference's VLA container ships bitsandbytes next to transformers/
peft (reference Dockerfile:34-41, requirements.txt) -- quantized serving
is in its capability envelope. The TPU-native equivalent: symmetric
per-output-channel int8 weights for the Mistral projections + lm_head,
dequantized inside the matmul read. Decode is weight-HBM-bound
(PERF.md 'VLA serving' roofline), so halving the weight bytes both
speeds the per-token step and halves the 14.1 GB resident footprint --
which is what lets the FUSED scan decode fit on one 16 GB chip again.

Scheme: for kernel W (in, out), scale_j = max_i |W_ij| / 127,
Q = round(W / scale) in int8; serving computes y = (x @ Q) * scale with
the int8->bf16 convert fused into the dot and the f32 scale applied to
the (B, out) result -- mathematically identical to x @ (Q * scale) but
never materializes a dequantized weight.

The vision tower, multimodal projector, embedding table and norms stay
in the compute dtype (small and/or gather-accessed).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
import flax.linen as nn

__all__ = ["QuantDense", "QuantLoRADense", "quantize_llava_variables",
           "LM_PROJ_NAMES"]

#: projection module names whose kernels quantize (the same set the
#: reference LoRA-targets, vla_trainer.py:33-43, plus lm_head)
LM_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj", "lm_head")


class QuantDense(nn.Module):
    """Dense layer over an int8 kernel + per-output-channel f32 scale.

    Parameters are ``kernel_q`` (in, out) int8 and ``kernel_scale``
    (out,) f32 -- produced from a float kernel by
    :func:`quantize_llava_variables`, never trained in place.
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        q = self.param("kernel_q",
                       lambda key, shape: jnp.zeros(shape, jnp.int8),
                       (x.shape[-1], self.features))
        s = self.param("kernel_scale",
                       lambda key, shape: jnp.ones(shape, jnp.float32),
                       (self.features,))
        y = x.astype(self.dtype) @ q.astype(self.dtype)
        return (y.astype(jnp.float32) * s).astype(self.dtype)


class QuantLoRADense(nn.Module):
    """Quantized frozen base + bf16 LoRA delta (the QLoRA serving
    pattern -- the reference runs peft adapters over a bitsandbytes
    base). Base params nest under 'base' exactly like LoRADense, so
    adapter save/load and lora_mask work unchanged."""

    features: int
    rank: int = 8
    alpha: float = 32.0
    dropout: float = 0.0
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = QuantDense(self.features, dtype=self.dtype, name="base")(x)
        a = self.param("lora_a",
                       nn.initializers.normal(1.0 / self.rank),
                       (x.shape[-1], self.rank))
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features))
        h = x
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return y + (self.alpha / self.rank) * ((h @ a) @ b)


def _quantize_kernel(w):
    """(in, out) float kernel -> (int8 Q, f32 scale per column)."""
    w = np.asarray(jax.device_get(w), np.float32)
    scale = np.abs(w).max(axis=0) / 127.0
    scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint(w / scale), -127, 127).astype(np.int8)
    return jnp.asarray(q), jnp.asarray(scale)


def quantize_llava_variables(variables) -> dict:
    """Replace every LM projection kernel in a LlavaJax variables tree
    with (kernel_q, kernel_scale); returns a NEW tree matching the
    parameter layout of ``LlavaJaxConfig(quantized=True)``.

    Quantizes paths whose module name is in :data:`LM_PROJ_NAMES`
    (including LoRA 'base' nestings); vision/projector/embedding leaves
    pass through. lora_a/lora_b adapters stay float (QLoRA layout).
    """
    import flax.traverse_util as tu

    flat = tu.flatten_dict(variables)
    out = {}
    for k, v in flat.items():
        names = set(k)
        if (k[-1] == "kernel" and names & set(LM_PROJ_NAMES)
                and "vision_tower" not in names):
            q, s = _quantize_kernel(v)
            out[k[:-1] + ("kernel_q",)] = q
            out[k[:-1] + ("kernel_scale",)] = s
        else:
            out[k] = v
    return tu.unflatten_dict(out)
