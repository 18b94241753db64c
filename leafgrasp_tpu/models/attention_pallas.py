"""Fused attention-gating Pallas kernel for GraspPointCNN.

BASELINE north star: the CNN's spatial/channel attention blocks run as
Pallas kernels.  The gating math (1x1-conv spatial gate, SE-style
channel gate, elementwise multiply) fuses into ONE kernel per example:
two tiny MXU matmuls + VPU sigmoids over the (H*W, C) feature tile, no
intermediate HBM traffic.

``fused_attention_gate`` takes the same parameters the plain JAX path
uses, so the kernel is drop-in verified against it
(tests/test_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fused_attention_gate", "attention_gate_reference"]


def attention_gate_reference(x, ws, bs, w1, b1, w2, b2,
                             mode: str) -> jnp.ndarray:
    """Plain-JAX oracle. x: (N, H, W, C).
    ws: (C, 1) spatial gate; w1: (C, R), w2: (R, C) channel gate."""
    out = x
    if mode in ("spatial", "hybrid"):
        sp = jax.nn.sigmoid(jnp.einsum("nhwc,co->nhwo", x, ws) + bs)
        out = out * sp
    if mode in ("channel", "hybrid"):
        squeezed = jnp.mean(x, axis=(1, 2))            # (N, C)
        h = jax.nn.relu(squeezed @ w1 + b1)
        gate = jax.nn.sigmoid(h @ w2 + b2)             # (N, C)
        out = out * gate[:, None, None, :]
    return out


def _kernel(x_ref, ws_ref, bs_ref, w1_ref, b1_ref, w2_ref, b2_ref,
            out_ref, *, mode: str, hw: int):
    x = x_ref[0]                                       # (HW, C)
    out = x
    if mode in ("spatial", "hybrid"):
        sp = jnp.dot(x, ws_ref[:],
                     preferred_element_type=jnp.float32) + bs_ref[:]
        out = out * jax.nn.sigmoid(sp)                 # (HW,1) broadcast
    if mode in ("channel", "hybrid"):
        squeezed = jnp.sum(x, axis=0, keepdims=True) / jnp.float32(hw)
        h = jnp.maximum(
            jnp.dot(squeezed, w1_ref[:],
                    preferred_element_type=jnp.float32) + b1_ref[:], 0.0)
        gate = jax.nn.sigmoid(
            jnp.dot(h, w2_ref[:],
                    preferred_element_type=jnp.float32) + b2_ref[:])
        out = out * gate                               # (1,C) broadcast
    out_ref[0] = out


@functools.partial(jax.jit, static_argnames=("mode", "interpret"))
def fused_attention_gate(x, ws, bs, w1, b1, w2, b2, mode: str,
                         interpret: bool | None = None) -> jnp.ndarray:
    """x: (N, H, W, C) -> gated (N, H, W, C), one fused kernel per n."""
    if mode == "none":
        return x
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    n, h, w, c = x.shape
    hw = h * w
    xf = x.reshape(n, hw, c)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple([0] * len(shape)),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, mode=mode, hw=hw),
        grid=(n,),
        in_specs=[pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
                  full(ws.shape), full(bs.shape), full(w1.shape),
                  full(b1.shape), full(w2.shape), full(b2.shape)],
        out_specs=pl.BlockSpec((1, hw, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, hw, c), x.dtype),
        interpret=interpret,
    )(xf, ws, bs, w1, b1, w2, b2)
    return out.reshape(n, h, w, c)
