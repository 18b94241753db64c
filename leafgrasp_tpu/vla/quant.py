"""Weight-only int8 quantization for the LLaVA language model.

The reference's VLA container ships bitsandbytes next to transformers/
peft (reference Dockerfile:34-41, requirements.txt) -- quantized serving
is in its capability envelope. The TPU-native equivalent: symmetric
per-output-channel int8 weights for the Mistral projections + lm_head,
dequantized inside the matmul read. Decode is weight-HBM-bound
(PERF.md 'VLA serving' roofline), so halving the weight bytes both
speeds the per-token step and halves the 14.1 GB resident footprint --
which is what lets the FUSED scan decode fit on one 16 GB chip again.

Scheme (int8): for kernel W (in, out), scale_j = max_i |W_ij| / 127,
Q = round(W / scale) in int8; serving computes y = (x @ Q) * scale with
the int8->bf16 convert fused into the dot and the f32 scale applied to
the (B, out) result -- mathematically identical to x @ (Q * scale) but
never materializes a dequantized weight.

Scheme (int4): Q stored in the NATIVE ``jnp.int4`` dtype (XLA packs two
values per byte in HBM on TPU) with GROUP-WISE scales -- scale has shape
(G, out) for G = in/group groups along the input dimension (per-channel
int4 is too coarse for transformer kernels; group-wise is the standard
weight-only-int4 recipe). The matmul becomes G batched (.., gs)x(gs, out)
dots whose (.., G, out) partials are scaled then summed -- same FLOPs,
and the per-group scale never touches a materialized weight either.

int4 storage comes in two flavors: ``native`` keeps the kernel in
``jnp.int4`` (XLA's packed S4; the production default), ``packed``
carries two nibbles per int8 byte along the input dimension and
unpacks with shift pairs inside the layer -- bit-identical math,
runnable on backends without S4 executables (measured through the
tunnelled dev backend, tools/bench_vla_quant.py --storage packed).

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
           "quantize_llava_variables_device", "LM_PROJ_NAMES"]

#: projection module names whose kernels quantize (the same set the
#: reference LoRA-targets, vla_trainer.py:33-43, plus lm_head)
LM_PROJ_NAMES = ("q_proj", "k_proj", "v_proj", "o_proj",
                 "gate_proj", "up_proj", "down_proj", "lm_head")


def _unpack_nibbles(p):
    """int8 packed byte -> (low, high) sign-extended int4 values in
    int8. Row 2i lives in the low nibble, row 2i+1 in the high one."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return lo, hi


def _num_groups(in_features: int, bits: int, group: int) -> int:
    """Scale rows for a kernel: int8 and group<=0 are per-channel (1
    row, stored 1D for int8 back-compat); int4 uses in/group rows,
    falling back to per-channel when group does not divide in."""
    if bits == 8 or group <= 0 or in_features % group != 0:
        return 1
    return in_features // group


class QuantDense(nn.Module):
    """Dense layer over a quantized kernel + f32 scales.

    bits=8: ``kernel_q`` (in, out) int8, ``kernel_scale`` (out,) f32
    per-output-channel.
    bits=4: ``kernel_q`` (in, out) native int4, ``kernel_scale``
    (G, out) f32 group-wise along the input dimension (G = in/group).
    Both produced from a float kernel by
    :func:`quantize_llava_variables`, never trained in place.
    """

    features: int
    dtype: Any = jnp.bfloat16
    bits: int = 8
    group: int = 128
    # int4 only: store two nibbles per int8 byte along the input dim
    # (kernel_q (in/2, out) int8) instead of native jnp.int4 -- for
    # backends without S4 executables; bit-identical math
    packed: bool = False
    # grouped (int4) formulation switch on the STATIC token count:
    # <= threshold (decode): G batched partial dots scaled in f32 --
    # weight reads stay packed, the (N, G, out) f32 partials are small;
    # > threshold (prefill): one dequantized-weight matmul -- the
    # partials would be ~6 GB at 7B prefill dims, while the transient
    # dequant weight is just the bf16 kernel (compute-bound regime)
    dequant_threshold: int = 256

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        g = _num_groups(in_f, self.bits, self.group)
        s = self.param("kernel_scale",
                       lambda key, shape: jnp.ones(shape, jnp.float32),
                       (self.features,) if self.bits == 8 and g == 1
                       else (g, self.features))
        xc = x.astype(self.dtype)
        if self.bits == 8:
            q = self.param("kernel_q",
                           lambda key, shape: jnp.zeros(shape, jnp.int8),
                           (in_f, self.features))
            # f32 accumulator OUTPUT (the MXU accumulates f32 either
            # way): rounding y to bf16 before the f32 scale multiply
            # double-rounded every logit, and the fused int8->bf16
            # convert makes XLA pick different lowerings for the B=1
            # and B=5 decode matvecs -- together that flipped 100/100
            # greedy token paths between the batched and sequential
            # rerank at int8 where bf16 flipped 0/100 (PERF.md
            # stability table; measured on chip before/after).
            y = jnp.matmul(xc, q.astype(self.dtype),
                           preferred_element_type=jnp.float32)
            return (y * s.reshape(-1)).astype(self.dtype)

        packed = self.packed
        if packed and (in_f // g) % 2:
            raise ValueError(
                f"packed int4 needs an even group size, got "
                f"{in_f // g} (in={in_f}, groups={g})")
        q = self.param(
            "kernel_q",
            lambda key, shape: jnp.zeros(
                shape, jnp.int8 if packed else jnp.int4),
            ((in_f // 2, self.features) if packed
             else (in_f, self.features)))
        gs = in_f // g
        lead = x.shape[:-1]
        n_tok = int(np.prod(lead)) if lead else 1
        if n_tok > self.dequant_threshold:
            if packed:
                lo, hi = _unpack_nibbles(q)
                qi = jnp.stack([lo, hi], axis=1).reshape(
                    in_f, self.features)
            else:
                qi = q
            w = (qi.astype(jnp.float32).reshape(g, gs, self.features)
                 * s[:, None, :]).astype(self.dtype)
            y = xc @ w.reshape(in_f, self.features)
            return y.astype(self.dtype)
        xg = xc.reshape(-1, g, gs)
        # (N, g, out) partials, scaled per group then summed: identical
        # to x @ (Q * scale) without materializing the dequant weight
        # (the MXU accumulates each partial in f32 internally)
        if packed:
            lo, hi = _unpack_nibbles(q)
            half = gs // 2
            lo = lo.astype(self.dtype).reshape(g, half, self.features)
            hi = hi.astype(self.dtype).reshape(g, half, self.features)
            part = (jnp.einsum("ngi,gio->ngo", xg[..., 0::2], lo,
                               preferred_element_type=jnp.float32)
                    + jnp.einsum("ngi,gio->ngo", xg[..., 1::2], hi,
                                 preferred_element_type=jnp.float32))
        else:
            wg = q.astype(self.dtype).reshape(g, gs, self.features)
            part = jnp.einsum("ngi,gio->ngo", xg, wg,
                              preferred_element_type=jnp.float32)
        y = (part * s).sum(axis=1)
        return y.reshape(*lead, self.features).astype(self.dtype)


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
    bits: int = 8
    group: int = 128
    packed: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        y = QuantDense(self.features, dtype=self.dtype, bits=self.bits,
                       group=self.group, packed=self.packed,
                       name="base")(x)
        a = self.param("lora_a",
                       nn.initializers.normal(1.0 / self.rank),
                       (x.shape[-1], self.rank))
        b = self.param("lora_b", nn.initializers.zeros,
                       (self.rank, self.features))
        h = x
        if self.dropout > 0:
            h = nn.Dropout(self.dropout, deterministic=not train)(h)
        return y + (self.alpha / self.rank) * ((h @ a) @ b)


def _quantize_kernel(w, bits: int = 8, group: int = 128,
                     packed: bool = False):
    """(in, out) float kernel -> (Q, scale).

    bits=8: int8 Q, (out,) f32 per-column scale (|q| <= 127).
    bits=4: native-int4 Q -- or (in/2, out) int8 nibble-packed when
    ``packed`` -- with (G, out) f32 group-wise scale along the input
    dim (|q| <= 7; symmetric, one code point of [-8, 7] unused).
    """
    w = np.asarray(jax.device_get(w), np.float32)
    g = _num_groups(w.shape[0], bits, group)
    qmax = 127.0 if bits == 8 else 7.0
    wg = w.reshape(g, -1, w.shape[1])
    scale = np.abs(wg).max(axis=1) / qmax          # (g, out)
    scale = np.where(scale == 0.0, 1.0, scale).astype(np.float32)
    q = np.clip(np.rint(wg / scale[:, None, :]), -qmax, qmax)
    q = q.reshape(w.shape)
    if bits == 8:
        return jnp.asarray(q.astype(np.int8)), jnp.asarray(scale[0])
    if packed:
        if (w.shape[0] // g) % 2:
            raise ValueError(
                f"packed int4 needs an even group size, got "
                f"{w.shape[0] // g}")
        qi = q.astype(np.int64)
        p = ((qi[0::2] & 0xF) | ((qi[1::2] & 0xF) << 4)).astype(
            np.uint8).view(np.int8)
        return jnp.asarray(p), jnp.asarray(scale)
    return (jnp.asarray(q.astype(np.int8)).astype(jnp.int4),
            jnp.asarray(scale))


@jax.jit
def _quantize_kernel_int8_device(w):
    """On-device int8 per-output-channel quantization; same scheme as
    :func:`_quantize_kernel` (abs-max / 127, zero-scale guard,
    round-half-even, clip). NOT guaranteed bit-equal to the host path:
    XLA lowers ``/ 127`` to a reciprocal multiply, so a value landing
    exactly on a .5 rounding boundary can differ by ONE code (measured
    ~1/1500 entries; dequant error bound scale/2 + eps unchanged) --
    bounded by tests/test_quant.py."""
    w = w.astype(jnp.float32)
    scale = jnp.abs(w).max(axis=0) / jnp.float32(127.0)
    scale = jnp.where(scale == 0.0, 1.0, scale)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127.0, 127.0)
    return q.astype(jnp.int8), scale


def quantize_llava_variables_device(variables_box: list,
                                    bits: int = 8) -> dict:
    """int8 :func:`quantize_llava_variables` that stays ON DEVICE and
    CONSUMES the input tree: pass ``[variables]``; the box is emptied
    and each bf16 kernel's last reference dies right after its int8
    replacement is computed, so peak HBM is the input tree + one
    kernel (a full 7B tree never lives twice, and -- unlike the host
    path -- no 14 GB crawls through a dev tunnel at ~10 MB/s).

    Only bits=8 (the measured serving default); int4/packed go through
    the host path, whose numpy packing has no on-device equivalent.
    """
    import flax.traverse_util as tu

    if bits != 8:
        raise ValueError("device quantization supports bits=8 only; "
                         "use quantize_llava_variables for int4")
    if not isinstance(variables_box, list) or len(variables_box) != 1:
        raise ValueError("pass the variables tree in a 1-element list; "
                         "it is consumed (the box is emptied)")
    flat = tu.flatten_dict(variables_box.pop())
    out = {}
    for k in list(flat.keys()):
        v = flat.pop(k)
        names = set(k)
        if (k[-1] == "kernel" and names & set(LM_PROJ_NAMES)
                and "vision_tower" not in names):
            q, s = _quantize_kernel_int8_device(v)
            del v
            out[k[:-1] + ("kernel_q",)] = q
            out[k[:-1] + ("kernel_scale",)] = s
        else:
            out[k] = v
    return tu.unflatten_dict(out)


def quantize_llava_variables(variables, bits: int = 8,
                             group: int = 128,
                             packed: bool = False) -> dict:
    """Replace every LM projection kernel in a LlavaJax variables tree
    with (kernel_q, kernel_scale); returns a NEW tree matching the
    parameter layout of ``LlavaJaxConfig(quantized=True,
    quant_bits=bits, quant_group=group, quant_packed=packed)``.

    Quantizes paths whose module name is in :data:`LM_PROJ_NAMES`
    (including LoRA 'base' nestings); vision/projector/embedding leaves
    pass through. lora_a/lora_b adapters stay float (QLoRA layout).
    """
    import flax.traverse_util as tu

    if bits not in (8, 4):
        raise ValueError(f"bits must be 8 or 4, got {bits}")
    flat = tu.flatten_dict(variables)
    out = {}
    for k, v in flat.items():
        names = set(k)
        if (k[-1] == "kernel" and names & set(LM_PROJ_NAMES)
                and "vision_tower" not in names):
            q, s = _quantize_kernel(v, bits, group, packed)
            out[k[:-1] + ("kernel_q",)] = q
            out[k[:-1] + ("kernel_scale",)] = s
        else:
            out[k] = v
    return tu.unflatten_dict(out)
