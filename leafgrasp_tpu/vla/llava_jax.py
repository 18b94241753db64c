"""LLaVA-architecture-faithful JAX implementation + HF weight converter.

The reference's VLA is ``llava-hf/llava-v1.6-mistral-7b-hf`` behind
`transformers` (reference llava_processor.py:18-31).  This module
implements the same architecture natively in Flax -- CLIP vision tower,
multimodal projector, Mistral decoder with GQA + RoPE + RMSNorm -- and a
converter from HuggingFace state dicts, so the real 7B weights drop in
unchanged on TPU.  Numerics are verified against a randomly initialized
`transformers` LLaVA at tiny scale (tests/test_llava_jax.py): logits
match to float32 tolerance.

Scope notes:
* the single-tile (LLaVA-1.5) image path runs fully on-device; the
  LLaVA-NeXT anyres path (tiling, unpadding, newline packing) lives in
  vla/llava_next.py and is parity-verified against HF LlavaNext too;
* TP sharding reuses parallel/sharding.py rules (q/k/v/o, gate/up/down
  and lm_head kernels shard over the `model` axis).
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from leafgrasp_tpu.vla.lora import LoRADense

__all__ = ["LlavaJaxConfig", "LlavaJax", "convert_hf_llava_state_dict",
           "config_from_hf", "greedy_generate_llava",
           "prepare_decode_layout"]


@dataclasses.dataclass(frozen=True)
class LlavaJaxConfig:
    # vision (CLIP)
    vis_hidden: int = 1024
    vis_intermediate: int = 4096
    vis_layers: int = 24
    vis_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    vision_feature_layer: int = -2
    drop_cls_token: bool = True           # 'default' select strategy
    # text (Mistral)
    vocab_size: int = 32064
    hidden: int = 4096
    intermediate: int = 14336
    layers: int = 32
    heads: int = 32
    kv_heads: int = 8
    rope_theta: float = 1e6
    rms_eps: float = 1e-5
    sliding_window: Optional[int] = None   # Mistral local attention
    # fusion
    image_token_index: int = 32000
    # anyres grid pinpoints ((h, w) pairs; None for single-tile v1.5)
    image_grid_pinpoints: Optional[tuple] = None
    # compute dtype ("float32" | "bfloat16"); params stay as loaded,
    # activations/matmuls run in this dtype (norms/softmax internally f32)
    dtype: str = "float32"
    # LoRA on the language model's q/k/v/o/gate/up/down projections
    # (the reference's adapter target set, vla_trainer.py:36-41)
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0
    # weight-only quantized LM projections + lm_head (vla/quant.py);
    # the variables tree must come from quantize_llava_variables with
    # matching bits/group. quant_bits: 8 (per-channel int8) or 4
    # (group-wise native int4); quant_group: input-dim group size for
    # int4 scales (ignored for int8)
    quantized: bool = False
    quant_bits: int = 8
    quant_group: int = 128
    # int4 only: nibble-packed int8 storage instead of native jnp.int4
    # (for backends without S4 executables)
    quant_packed: bool = False
    # LM prefill attention query-chunking threshold: prompts longer than
    # this compute attention in ~this-many-query chunks (lax.scan), so
    # the f32 score transient is (b, heads, chunk, total) instead of
    # (b, heads, t, t). Mathematically exact -- each query row's
    # softmax and value reduction see the same operands (any bf16
    # tiling drift is the measured-0-flips batch-shape class);
    # required for the anyres B=5 prefill, whose full score tensor is
    # 7.4 GB at 2.4k tokens. None disables chunking.
    prefill_attn_chunk: Optional[int] = 512
    # "chunked" (the lax.scan above) or "flash": route long prefills
    # through the Pallas TPU flash-attention kernel (online softmax in
    # VMEM), which removes the per-layer f32 score tensor's HBM round
    # trips entirely -- the chunked scan bounds the PEAK but still
    # writes+reads every (b, heads, t, s) f32 score element. Flash
    # engages only on the TPU backend for prompts >= one kernel block
    # with an inactive sliding window and a head-dim-1 mask; everything
    # else falls back to "chunked". Same math, different fp reduction
    # order (validated on-chip: greedy token parity vs the chunked
    # path at 7B dims, tools/bench_vla_anyres.py --flash-ab).
    prefill_attn_impl: str = "chunked"

    @property
    def head_dim(self) -> int:
        return self.hidden // self.heads

    @property
    def jnp_dtype(self):
        return jnp.dtype(self.dtype)

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2


def config_from_hf(hf_config) -> "LlavaJaxConfig":
    v = hf_config.vision_config
    t = hf_config.text_config
    return LlavaJaxConfig(
        vis_hidden=v.hidden_size, vis_intermediate=v.intermediate_size,
        vis_layers=v.num_hidden_layers, vis_heads=v.num_attention_heads,
        image_size=v.image_size, patch_size=v.patch_size,
        vision_feature_layer=hf_config.vision_feature_layer,
        drop_cls_token=(getattr(hf_config, "vision_feature_select_strategy",
                                "default") == "default"),
        vocab_size=t.vocab_size, hidden=t.hidden_size,
        intermediate=t.intermediate_size, layers=t.num_hidden_layers,
        heads=t.num_attention_heads, kv_heads=t.num_key_value_heads,
        rope_theta=float(getattr(t, "rope_theta", 10000.0)),
        rms_eps=float(getattr(t, "rms_norm_eps", 1e-6)),
        sliding_window=getattr(t, "sliding_window", None),
        image_token_index=hf_config.image_token_index,
        image_grid_pinpoints=tuple(
            tuple(p) for p in getattr(hf_config, "image_grid_pinpoints",
                                      None) or ()) or None,
    )


# ------------------------------------------------------------ CLIP tower --

def _quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


class _ClipAttention(nn.Module):
    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hd = c.vis_hidden // c.vis_heads
        dt = c.jnp_dtype
        q = nn.Dense(c.vis_hidden, dtype=dt, name="q_proj")(x)
        k = nn.Dense(c.vis_hidden, dtype=dt, name="k_proj")(x)
        v = nn.Dense(c.vis_hidden, dtype=dt, name="v_proj")(x)
        b, t = x.shape[:2]

        def split(a):
            return a.reshape(b, t, c.vis_heads, hd)

        scores = jnp.einsum("bthd,bshd->bhts", split(q) / jnp.sqrt(hd),
                            split(k),
                            preferred_element_type=jnp.float32)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, split(v))
        return nn.Dense(c.vis_hidden, dtype=dt, name="out_proj")(
            out.reshape(b, t, c.vis_hidden))


class _ClipLayer(nn.Module):
    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        dt = c.jnp_dtype
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="layer_norm1")(x)
        x = x + _ClipAttention(c, name="self_attn")(h)
        h = nn.LayerNorm(epsilon=1e-5, dtype=dt, name="layer_norm2")(x)
        h = nn.Dense(c.vis_intermediate, dtype=dt, name="fc1")(h)
        h = _quick_gelu(h)
        x = x + nn.Dense(c.vis_hidden, dtype=dt, name="fc2")(h)
        return x


class ClipVisionTower(nn.Module):
    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, pixel_values):
        """pixel_values: (B, H, W, 3) -> selected hidden states
        (B, num_patches[+1], vis_hidden)."""
        c = self.cfg
        b = pixel_values.shape[0]
        patches = nn.Conv(c.vis_hidden,
                          (c.patch_size, c.patch_size),
                          strides=(c.patch_size, c.patch_size),
                          use_bias=False, dtype=c.jnp_dtype,
                          name="patch_embedding")(pixel_values)
        patches = patches.reshape(b, -1, c.vis_hidden)
        cls = self.param("class_embedding", nn.initializers.normal(0.02),
                         (c.vis_hidden,))
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (b, 1, c.vis_hidden)), patches], axis=1)
        n_pos = x.shape[1]
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.02),
                         (n_pos, c.vis_hidden))
        x = (x + pos[None]).astype(c.jnp_dtype)
        x = nn.LayerNorm(epsilon=1e-5, dtype=c.jnp_dtype,
                         name="pre_layrnorm")(x)

        # HF collects hidden_states = [emb, after layer 0, ...] and takes
        # [vision_feature_layer]; all layers still run so every layer's
        # params exist (7B checkpoints load completely).
        n_keep = c.vis_layers + 1 + c.vision_feature_layer \
            if c.vision_feature_layer < 0 else c.vision_feature_layer
        selected = x
        for i in range(c.vis_layers):
            x = _ClipLayer(c, name=f"layer_{i}")(x)
            if i + 1 == n_keep:
                selected = x
        if c.drop_cls_token:
            selected = selected[:, 1:]
        return selected


# -------------------------------------------------------------- Mistral --

def _proj(features: int, name: str, lora: dict, dtype=jnp.float32,
          cfg=None):
    """Language-model projection: plain Dense, or LoRADense (base kernel
    nested under '<name>/base') when a LoRA rank is configured; int8 /
    int4 variants of both when ``cfg.quantized`` (vla/quant.py)."""
    if cfg is not None and cfg.quantized:
        from leafgrasp_tpu.vla.quant import QuantDense, QuantLoRADense
        if lora["rank"] > 0:
            return QuantLoRADense(features, rank=lora["rank"],
                                  alpha=lora["alpha"],
                                  dropout=lora["dropout"],
                                  dtype=dtype, bits=cfg.quant_bits,
                                  group=cfg.quant_group,
                                  packed=cfg.quant_packed, name=name)
        return QuantDense(features, dtype=dtype, bits=cfg.quant_bits,
                          group=cfg.quant_group,
                          packed=cfg.quant_packed, name=name)
    if lora["rank"] > 0:
        return LoRADense(features, rank=lora["rank"],
                         alpha=lora["alpha"], dropout=lora["dropout"],
                         use_bias=False, name=name)
    return nn.Dense(features, use_bias=False, dtype=dtype, name=name)


class _RMSNorm(nn.Module):
    eps: float

    @nn.compact
    def __call__(self, x):
        w = self.param("weight", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x.astype(jnp.float32)
                * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * w


def _rope_hf(x, positions, theta):
    """HF rotate_half convention: pairs split at half-dim.

    Angles compute in f32; the result casts back to x's dtype exactly
    like transformers (cos/sin are `.to(q.dtype)` there). Keeping the
    f32 upcast instead silently ran the prefill QK einsum as an f32
    matmul (off the bf16 MXU path) and doubled Q's HBM footprint --
    1.6 GB at the 2.4k-token anyres prefill."""
    d = x.shape[-1]
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32)
                             * 2.0 / d))
    ang = positions[..., None].astype(jnp.float32) * freqs
    cos = jnp.concatenate([jnp.cos(ang), jnp.cos(ang)], axis=-1)[..., None, :]
    sin = jnp.concatenate([jnp.sin(ang), jnp.sin(ang)], axis=-1)[..., None, :]
    rot = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return (x * cos + rot * sin).astype(x.dtype)


def _flash_prefill(q, kr, vr, mask, t: int):
    """Prefill attention via the Pallas TPU flash kernel.

    q: (b, t, heads, hd); kr/vr: (b, s, heads, hd) with the first t
    slots real (s >= t; trailing cache slots are causally masked in the
    dense path and simply dropped here); mask: (b, 1, t, s) = causal
    AND key >= left-pad (built by _generate_prefill). The kernel's
    causal flag + segment ids reproduce that mask exactly on real
    rows: kv segment 1 marks non-pad key slots (read off the last --
    widest causal -- mask row), q rows carry the same segment, so a
    real query attends exactly {j : j <= i, j >= pad_b}. Left-pad rows
    land in segment 0 and attend pad keys instead of the dense path's
    uniform-softmax garbage -- both are unread (values at pad slots
    never enter a real row's reduction, and pad-row outputs are never
    consumed downstream). Sequences pad to a block multiple with
    segment -1 slots (attend nothing real); padded q rows are sliced
    off.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        flash_attention, BlockSizes, SegmentIds)
    b, _, heads, hd = q.shape
    blk = 512 if t >= 2048 else 128
    tp = -(-t // blk) * blk
    seg = mask[:, 0, t - 1, :t].astype(jnp.int32)      # (b, t) 1=real
    seg = jnp.pad(seg, ((0, 0), (0, tp - t)), constant_values=-1)
    qf = jnp.moveaxis(q, 1, 2)                         # (b, heads, t, hd)
    kf = jnp.moveaxis(kr[:, :t], 1, 2)
    vf = jnp.moveaxis(vr[:, :t], 1, 2)
    pad_rows = ((0, 0), (0, 0), (0, tp - t), (0, 0))
    qf, kf, vf = (jnp.pad(a, pad_rows) for a in (qf, kf, vf))
    out = flash_attention(
        qf, kf, vf, segment_ids=SegmentIds(q=seg, kv=seg), causal=True,
        sm_scale=float(1.0 / np.sqrt(hd)),
        block_sizes=BlockSizes(block_q=blk, block_k_major=blk,
                               block_k=blk, block_b=1))
    return jnp.moveaxis(out[:, :, :t], 2, 1)           # (b, t, heads, hd)


class _MistralAttention(nn.Module):
    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        c = self.cfg
        hd = c.head_dim
        b, t = x.shape[:2]
        lora = dict(rank=c.lora_rank, alpha=c.lora_alpha,
                    dropout=c.lora_dropout)
        q = _proj(c.heads * hd, "q_proj", lora, c.jnp_dtype,
                  c)(x)
        k = _proj(c.kv_heads * hd, "k_proj", lora, c.jnp_dtype,
                  c)(x)
        v = _proj(c.kv_heads * hd, "v_proj", lora, c.jnp_dtype,
                  c)(x)
        q = _rope_hf(q.reshape(b, t, c.heads, hd), positions, c.rope_theta)
        k = _rope_hf(k.reshape(b, t, c.kv_heads, hd), positions,
                     c.rope_theta)
        v = v.reshape(b, t, c.kv_heads, hd)

        if cache is not None:
            # cache dtype rules (under f32 compute k may be wider than
            # the cache dtype: cast at the boundary rather than assume)
            ck, cv, cur = cache
            k = jax.lax.dynamic_update_slice(ck, k.astype(ck.dtype),
                                             (0, cur, 0, 0))
            v = jax.lax.dynamic_update_slice(cv, v.astype(cv.dtype),
                                             (0, cur, 0, 0))
            cache = (k, v, cur + t)

        rep = c.heads // c.kv_heads

        def attend(qc, mc):
            """Exact attention for a block of query rows against the
            full key/value axis (softmax per row is self-contained).

            Grouped-query form: the repeated-K/V einsum is expressed
            over (kv_heads, rep) axes so the (b, s, heads, hd)
            broadcast of K/V is never materialized -- each q head's
            dot against its shared KV head is numerically identical,
            but at a 2.4k-token decode the materialized repeat costs
            ~0.8 GB of HBM write+read per layer per step (~50 GB per
            10-token rerank), which dominated the anyres decode stage.
            mc is (b, 1, t, s): broadcasts over both head axes."""
            bq, tq = qc.shape[:2]
            qg = qc.reshape(bq, tq, c.kv_heads, rep, hd)
            scores = jnp.einsum("btkrd,bskd->bkrts", qg, k,
                                preferred_element_type=jnp.float32)
            scores = scores / jnp.sqrt(jnp.float32(hd))
            if mc.shape[1] == c.heads:        # per-head mask
                mcb = mc.reshape(mc.shape[0], c.kv_heads, rep,
                                 *mc.shape[2:])
            else:                             # head-dim-1 mask
                mcb = mc[:, :, None]
            scores = jnp.where(mcb, scores, jnp.float32(-1e30))
            probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
            out = jnp.einsum("bkrts,bskd->btkrd", probs, v)
            return out.reshape(bq, tq, c.heads, hd)

        tc = c.prefill_attn_chunk
        head1_prefill_mask = (mask.ndim == 4 and mask.shape[1] == 1
                              and mask.shape[2] == t)
        if (c.prefill_attn_impl == "flash" and head1_prefill_mask
                and t >= 128
                and (c.sliding_window is None or t <= c.sliding_window)
                and jax.default_backend() in ("tpu", "axon")):
            # the kernel wants equal q/kv head counts; one prefill-time
            # repeat (amortized over t rows) is cheap, unlike per-step
            # decode repeats
            out = _flash_prefill(q, jnp.repeat(k, rep, axis=2),
                                 jnp.repeat(v, rep, axis=2), mask, t)
        elif tc is None or t <= tc or not head1_prefill_mask:
            # the chunked reshape below assumes a head-dim-1 mask; a
            # per-head (b, heads, t, s) mask would be mis-grouped, so
            # fall back to the exact unchunked path instead (ADVICE r4)
            out = attend(q, mask)
        else:
            # long prefill: scan over query chunks so the f32 score
            # transient is (b, heads, tc, total), not (b, heads, t, t)
            # -- the B=5 anyres prefill's full tensor is 7.4 GB
            n = -(-t // tc)
            tc = -(-t // n)                  # equalize to minimize pad
            t_pad = n * tc
            qp = jnp.pad(q, ((0, 0), (0, t_pad - t), (0, 0), (0, 0)))
            mp = jnp.pad(mask, ((0, 0), (0, 0), (0, t_pad - t), (0, 0)))
            # (all-masked pad rows softmax to uniform; sliced off below)
            q_ch = jnp.moveaxis(
                qp.reshape(b, n, tc, c.heads, hd), 1, 0)
            m_ch = jnp.moveaxis(
                mp.reshape(mp.shape[0], 1, n, tc, -1), 2, 0)
            out = jax.lax.scan(
                lambda _, xs: (None, attend(*xs)), None,
                (q_ch, m_ch))[1]             # (n, b, tc, heads, hd)
            out = jnp.moveaxis(out, 0, 1).reshape(
                b, t_pad, c.heads, hd)[:, :t]
        out = _proj(c.hidden, "o_proj", lora, c.jnp_dtype,
                    c)(out.reshape(b, t, c.heads * hd))
        return out, cache


class _MistralLayer(nn.Module):
    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None):
        c = self.cfg
        h, cache = _MistralAttention(c, name="self_attn")(
            _RMSNorm(c.rms_eps, name="input_layernorm")(x),
            positions, mask, cache)
        x = x + h
        h = _RMSNorm(c.rms_eps, name="post_attention_layernorm")(x)
        lora = dict(rank=c.lora_rank, alpha=c.lora_alpha,
                    dropout=c.lora_dropout)
        gate = _proj(c.intermediate, "gate_proj", lora, c.jnp_dtype,
                     c)(h)
        up = _proj(c.intermediate, "up_proj", lora, c.jnp_dtype,
                   c)(h)
        x = x + _proj(c.hidden, "down_proj", lora, c.jnp_dtype,
                      c)(nn.silu(gate) * up)
        return x, cache


class _VisionProject(nn.Module):
    """Vision tower + multimodal projector, applied standalone (shares
    the top-level parameter names with LlavaJax, so LlavaJax variables
    apply directly). Used by the anyres (LLaVA-NeXT) path to encode
    tiles before the host-side packing."""

    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, pixel_values):
        c = self.cfg
        dt = c.jnp_dtype
        feats = ClipVisionTower(c, name="vision_tower")(pixel_values)
        h = nn.Dense(c.hidden, dtype=dt, name="mm_linear_1")(feats)
        h = jax.nn.gelu(h, approximate=False)
        return nn.Dense(c.hidden, dtype=dt, name="mm_linear_2")(h)


class LlavaJax(nn.Module):
    cfg: LlavaJaxConfig

    @nn.compact
    def __call__(self, input_ids, pixel_values=None, positions=None,
                 mask=None, caches=None, image_features=None,
                 logits_last_only: bool = False):
        """input_ids: (B, T); pixel_values: (B, H, W, 3) or None.
        Image-token rows of the text embedding are replaced by projected
        vision features (HF placeholder-splicing semantics);
        image_features (N, hidden) may be passed directly instead (the
        anyres path packs tile features host-side first).
        Returns (logits (B, T, vocab), caches)."""
        c = self.cfg
        emb = nn.Embed(c.vocab_size, c.hidden, dtype=c.jnp_dtype,
                       name="embed_tokens")
        x = emb(input_ids)

        # Vision params materialize at init (init always passes an
        # image); text-only apply calls (decode steps) skip the tower --
        # flax.apply ignores unused parameter subtrees.
        if pixel_values is not None or image_features is not None:
            if image_features is None:
                feats = ClipVisionTower(c, name="vision_tower")(
                    pixel_values)
                h = nn.Dense(c.hidden, dtype=c.jnp_dtype,
                             name="mm_linear_1")(feats)
                h = jax.nn.gelu(h, approximate=False)
                feats = nn.Dense(c.hidden, dtype=c.jnp_dtype,
                                 name="mm_linear_2")(h)
            else:
                feats = image_features
            flat = feats.reshape(-1, c.hidden)
            is_img = (input_ids == c.image_token_index)
            # k-th image token row <- k-th vision feature row
            img_order = jnp.cumsum(is_img.reshape(-1)) - 1
            take = jnp.take(flat,
                            jnp.clip(img_order, 0, flat.shape[0] - 1),
                            axis=0).reshape(x.shape)
            x = jnp.where(is_img[..., None], take, x)

        b, t = input_ids.shape
        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        if mask is None:
            mask = jnp.tril(jnp.ones((t, t), bool))
            if c.sliding_window is not None:
                # Mistral local attention: key within `window` of query
                qi = jnp.arange(t)[:, None]
                ki = jnp.arange(t)[None, :]
                mask = mask & (qi - ki < c.sliding_window)
            mask = mask[None, None]

        new_caches = []
        for i in range(c.layers):
            cache = caches[i] if caches is not None else None
            x, nc = _MistralLayer(c, name=f"layer_{i}")(x, positions, mask,
                                                        cache)
            new_caches.append(nc)
        x = _RMSNorm(c.rms_eps, name="norm")(x)
        if logits_last_only:
            # greedy decode only consumes the final position; skipping
            # the other T-1 lm_head rows saves (T-1) x vocab logits in
            # HBM (~400 MB for a batched 7B prefill) and their FLOPs
            x = x[:, -1:]
        if c.quantized:
            from leafgrasp_tpu.vla.quant import QuantDense
            logits = QuantDense(c.vocab_size, dtype=c.jnp_dtype,
                                bits=c.quant_bits, group=c.quant_group,
                                packed=c.quant_packed,
                                name="lm_head")(x)
        else:
            logits = nn.Dense(c.vocab_size, use_bias=False,
                              name="lm_head")(x)
        return logits, (new_caches if caches is not None else None)


# ------------------------------------------------------------ converter --

def _t(x):
    return jnp.asarray(np.asarray(x.detach().cpu().numpy()
                                  if hasattr(x, "detach") else x))


def convert_hf_llava_state_dict(sd: Dict[str, Any],
                                cfg: LlavaJaxConfig) -> Dict:
    """HF LlavaForConditionalGeneration state_dict -> LlavaJax params.

    Handles both transformers layouts ('model.vision_tower...' new and
    'vision_tower...' old prefixes). Linear kernels transpose (out,in) ->
    (in,out); the CLIP patch Conv transposes (D,3,ph,pw) -> (ph,pw,3,D).
    """
    sd = { (k[6:] if k.startswith("model.") else k): v
           for k, v in sd.items() }

    def lin(prefix, bias=True):
        out = {"kernel": _t(sd[prefix + ".weight"]).T}
        if bias and prefix + ".bias" in sd:
            out["bias"] = _t(sd[prefix + ".bias"])
        return out

    p: Dict[str, Any] = {}

    # vision tower
    vt = "vision_tower.vision_model"
    tower = {
        "class_embedding": _t(sd[f"{vt}.embeddings.class_embedding"]),
        "position_embedding": _t(
            sd[f"{vt}.embeddings.position_embedding.weight"]),
        "patch_embedding": {"kernel": _t(
            sd[f"{vt}.embeddings.patch_embedding.weight"]).transpose(
                2, 3, 1, 0)},
        "pre_layrnorm": {
            "scale": _t(sd[f"{vt}.pre_layrnorm.weight"]),
            "bias": _t(sd[f"{vt}.pre_layrnorm.bias"])},
    }
    for i in range(cfg.vis_layers):
        li = f"{vt}.encoder.layers.{i}"
        tower[f"layer_{i}"] = {
            "layer_norm1": {"scale": _t(sd[f"{li}.layer_norm1.weight"]),
                            "bias": _t(sd[f"{li}.layer_norm1.bias"])},
            "layer_norm2": {"scale": _t(sd[f"{li}.layer_norm2.weight"]),
                            "bias": _t(sd[f"{li}.layer_norm2.bias"])},
            "self_attn": {
                "q_proj": lin(f"{li}.self_attn.q_proj"),
                "k_proj": lin(f"{li}.self_attn.k_proj"),
                "v_proj": lin(f"{li}.self_attn.v_proj"),
                "out_proj": lin(f"{li}.self_attn.out_proj"),
            },
            "fc1": lin(f"{li}.mlp.fc1"),
            "fc2": lin(f"{li}.mlp.fc2"),
        }
    p["vision_tower"] = tower

    p["mm_linear_1"] = lin("multi_modal_projector.linear_1")
    p["mm_linear_2"] = lin("multi_modal_projector.linear_2")

    lm = "language_model"
    if f"{lm}.model.embed_tokens.weight" in sd:   # old nesting
        lm = "language_model.model"
    p["embed_tokens"] = {"embedding": _t(sd[f"{lm}.embed_tokens.weight"])}

    def maybe_lora(base):
        # LoRA configs nest the frozen kernel under 'base'; lora_a/b are
        # overlaid afterwards via attach_lora()
        return {"base": base} if cfg.lora_rank > 0 else base

    for i in range(cfg.layers):
        li = f"{lm}.layers.{i}"
        p[f"layer_{i}"] = {
            "input_layernorm": {"weight": _t(
                sd[f"{li}.input_layernorm.weight"])},
            "post_attention_layernorm": {"weight": _t(
                sd[f"{li}.post_attention_layernorm.weight"])},
            "self_attn": {
                "q_proj": maybe_lora(lin(f"{li}.self_attn.q_proj",
                                         bias=False)),
                "k_proj": maybe_lora(lin(f"{li}.self_attn.k_proj",
                                         bias=False)),
                "v_proj": maybe_lora(lin(f"{li}.self_attn.v_proj",
                                         bias=False)),
                "o_proj": maybe_lora(lin(f"{li}.self_attn.o_proj",
                                         bias=False)),
            },
            "gate_proj": maybe_lora(lin(f"{li}.mlp.gate_proj",
                                        bias=False)),
            "up_proj": maybe_lora(lin(f"{li}.mlp.up_proj", bias=False)),
            "down_proj": maybe_lora(lin(f"{li}.mlp.down_proj",
                                        bias=False)),
        }
    p["norm"] = {"weight": _t(sd[f"{lm}.norm.weight"])}
    p["lm_head"] = {"kernel": _t(sd["lm_head.weight"]).T}
    if "image_newline" in sd:     # LLaVA-NeXT per-row newline embedding
        p["image_newline"] = _t(sd["image_newline"])
    return {"params": p}


def attach_lora(model: "LlavaJax", variables: Dict, rng) -> Dict:
    """Overlay freshly initialized LoRA leaves (lora_a ~ N, lora_b = 0)
    onto converted base weights for a lora_rank > 0 config."""
    import flax.traverse_util as tu
    c = model.cfg
    dummy_ids = jnp.zeros((1, 4), jnp.int32)
    dummy_px = jnp.zeros((1, c.image_size, c.image_size, 3), jnp.float32)
    fresh = model.init(rng, dummy_ids, pixel_values=dummy_px)
    flat = dict(tu.flatten_dict(fresh["params"]))
    for k, v in tu.flatten_dict(variables["params"]).items():
        flat[k] = v
    return {"params": tu.unflatten_dict(flat)}


@functools.partial(jax.jit,
                   static_argnames=("model", "max_new_tokens"))
def _generate_prefill(model: LlavaJax, variables, input_ids, pad,
                      pixel_values, image_features,
                      max_new_tokens: int):
    """Prefill program: encode the prompt, fill the KV caches, return
    the first greedy token. Compiled separately from the decode scan so
    its large activation temps and the scan's double-buffered cache
    carries never share one program's HBM budget (a fused program OOMs
    a 7B batch-5 rerank on one 16 GB chip; split, it fits)."""
    c = model.cfg
    b, t = input_ids.shape
    total = t + max_new_tokens
    # caches live in the compute dtype (K/V are produced in c.jnp_dtype;
    # bf16 also halves cache HBM -- attention scores still reduce in f32
    # via preferred_element_type)
    kv_dt = c.jnp_dtype
    caches = [(jnp.zeros((b, total, c.kv_heads, c.head_dim), kv_dt),
               jnp.zeros((b, total, c.kv_heads, c.head_dim), kv_dt),
               jnp.int32(0)) for _ in range(c.layers)]

    positions = jnp.maximum(
        jnp.arange(t)[None, :] - pad[:, None], 0)
    mask = jnp.tril(jnp.ones((t, total), bool))
    if c.sliding_window is not None:
        # pad is a shared prefix, so absolute distance == pad-relative
        qi = jnp.arange(t)[:, None]
        ki = jnp.arange(total)[None, :]
        mask = mask & (qi - ki < c.sliding_window)
    mask = mask[None, None] \
        & (jnp.arange(total)[None, None, None, :] >= pad[:, None, None, None])
    logits, caches = model.apply(variables, input_ids,
                                 pixel_values=pixel_values,
                                 image_features=image_features,
                                 positions=positions, mask=mask,
                                 caches=caches, logits_last_only=True)
    last = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return last, caches


@functools.partial(jax.jit,
                   static_argnames=("model", "prompt_len",
                                    "max_new_tokens"),
                   donate_argnums=(2,))
def _generate_decode(model: LlavaJax, variables, caches, last, pad,
                     prompt_len: int, max_new_tokens: int):
    """Decode program: the single-token KV-cache scan (caches donated)."""
    c = model.cfg
    b = last.shape[0]
    t = prompt_len
    total = t + max_new_tokens

    def step(carry, i):
        caches, tok = carry
        pos = t + i
        positions = (pos - pad)[:, None]
        key_idx = jnp.arange(total)
        mask = (key_idx[None, :] <= pos) & (key_idx[None, :] >= pad[:, None])
        if c.sliding_window is not None:
            mask = mask & (pos - key_idx[None, :] < c.sliding_window)
        mask = mask[:, None, None, :]
        logits, caches = model.apply(variables, tok[:, None],
                                     positions=positions, mask=mask,
                                     caches=caches)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return (caches, nxt), tok

    (caches, _), toks = jax.lax.scan(step, (caches, last),
                                     jnp.arange(max_new_tokens))
    # returning the final caches gives the donated inputs an aliasing
    # target (otherwise donation is unusable and the carries double-buffer
    # against the argument copies); callers discard them
    return jnp.moveaxis(toks, 0, 1), caches


@functools.partial(jax.jit,
                   static_argnames=("model", "prompt_len",
                                    "max_new_tokens"),
                   donate_argnums=(2,))
def _generate_decode_step(model: LlavaJax, variables, caches, last, pad,
                          step_i, prompt_len: int, max_new_tokens: int):
    """One decode token as its own program (caches donated + aliased).

    Memory rationale: under a scan, XLA hoists the per-layer transposed
    weight-layout copies its matvecs want OUT of the loop, keeping ~2 GB
    of kernel copies alive for the whole decode -- which pushes a 7B
    batch-5 rerank out of a 16 GB chip. Per-step programs make those
    copies transient (freed layer by layer), trading ~2 ms/step of
    re-copying; dispatch is async so the host loop pipelines.
    """
    c = model.cfg
    t = prompt_len
    total = t + max_new_tokens
    pos = t + step_i
    positions = (pos - pad)[:, None]
    key_idx = jnp.arange(total)
    mask = (key_idx[None, :] <= pos) & (key_idx[None, :] >= pad[:, None])
    if c.sliding_window is not None:
        mask = mask & (pos - key_idx[None, :] < c.sliding_window)
    mask = mask[:, None, None, :]
    logits, caches = model.apply(variables, last[:, None],
                                 positions=positions, mask=mask,
                                 caches=caches)
    nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
    return nxt, caches


def prepare_decode_layout(model: LlavaJax, variables_box: list,
                          batch: int, prompt_len: int,
                          max_new_tokens: int):
    """Compile the decode-step program with AUTO weight input formats
    and relayout the weights into the layouts it prefers.

    Measured on one v5e at 7B dims (tools/bench_decode_layout.py): XLA
    requests non-default layouts on 97/684 weights and the per-step
    matvec relayout copies disappear -- 22.33 -> 21.19 ms/step (5.3%
    faster decode). This moves the relayout cost to load time, the
    "cleaner fix" noted in PERF.md 'VLA serving' item 4.

    variables_box: a single-element list ``[variables]``; it is EMPTIED
    here so the original leaves can be freed one-by-one as their
    relaid copies land (peak overhead = one leaf, ~263 MB at 7B dims
    -- 14.1 GB of weights cannot exist twice in 16 GB HBM). Callers
    must drop every other reference to the tree first.

    Returns ``(vars_opt, step_call, n_relayouted)`` where
    ``step_call(variables, caches, last, pad, step_i)`` runs the
    compiled program -- shapes are fixed to ``(batch, prompt_len +
    max_new_tokens)``, caches donated exactly like
    ``_generate_decode_step``.
    """
    from jax.experimental.layout import Format, Layout

    variables = variables_box.pop()
    c = model.cfg
    total = prompt_len + max_new_tokens
    kv_dt = c.jnp_dtype
    cache_sds = [
        (jax.ShapeDtypeStruct((batch, total, c.kv_heads, c.head_dim),
                              kv_dt),
         jax.ShapeDtypeStruct((batch, total, c.kv_heads, c.head_dim),
                              kv_dt),
         jax.ShapeDtypeStruct((), jnp.int32))
        for _ in range(c.layers)]
    vec_sds = jax.ShapeDtypeStruct((batch,), jnp.int32)
    step_sds = jax.ShapeDtypeStruct((), jnp.int32)
    var_sds = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.result_type(x)),
        variables)

    raw_step = _generate_decode_step.__wrapped__

    def fn(v, caches, last, pad, i):
        return raw_step(model, v, caches, last, pad, i,
                        prompt_len, max_new_tokens)

    auto_tree = jax.tree.map(lambda _: Format(Layout.AUTO), variables)
    jitted = jax.jit(fn, donate_argnums=(1,),
                     in_shardings=(auto_tree, None, None, None, None))
    compiled = jitted.lower(var_sds, cache_sds, vec_sds, vec_sds,
                            step_sds).compile()
    fmts = compiled.input_formats[0][0]
    fleaves = jax.tree.leaves(fmts)
    leaves, treedef = jax.tree.flatten(variables)
    del variables, var_sds, auto_tree
    n_changed = sum(
        1 for f_, v_ in zip(fleaves, leaves)
        if f_.layout is not None
        and tuple(f_.layout.major_to_minor) != tuple(range(v_.ndim)))
    # replace each leaf in place so the default-layout original frees
    # as soon as its relaid copy exists
    for i in range(len(leaves)):
        leaves[i] = jax.device_put(leaves[i], fleaves[i])
    vars_opt = jax.tree.unflatten(treedef, leaves)
    del leaves

    def step_call(v, caches, last, pad, step_i):
        return compiled(v, caches, last, pad, step_i)

    return vars_opt, step_call, n_changed


def greedy_generate_llava(model: LlavaJax, variables, input_ids,
                          pixel_values=None, image_features=None,
                          max_new_tokens: int = 10,
                          pad_lens=None,
                          decode_mode: str = "scan",
                          decode_step_call=None) -> jnp.ndarray:
    """Greedy decode: a prefill program + a single-token KV-cache decode
    (two separately-jitted programs; see _generate_prefill for why).

    pad_lens: optional (B,) int32 LEFT-pad lengths for batched rows of
    unequal prompt length (right-aligned real tokens). Positions are
    pad-relative and attention never reads pad-slot keys, so every row
    decodes exactly as it would alone -- this is how the VLA scorer
    batches its candidate prompts into ONE weight pass (decode is
    weight-HBM-bound, so batch-B costs ~the same as batch-1).

    decode_mode: "scan" fuses the decode loop into one program (fastest
    steady state); "steps" runs one program per token, keeping weight-
    layout copies transient -- required to fit a batched 7B rerank next
    to 14 GB of weights on one 16 GB chip (see _generate_decode_step).

    decode_step_call: optional replacement for the per-token program in
    "steps" mode with the same signature ``(variables, caches, last,
    pad, step_i) -> (next, caches)`` -- used by
    ``prepare_decode_layout`` to run the decode-format-compiled
    program against relayouted weights.
    """
    b, t = input_ids.shape
    if pad_lens is None:
        pad = jnp.zeros((b,), jnp.int32)
    else:
        pad = jnp.asarray(pad_lens, jnp.int32)
    last, caches = _generate_prefill(model, variables, input_ids, pad,
                                     pixel_values, image_features,
                                     max_new_tokens)
    if decode_mode == "steps":
        toks = [last]
        for i in range(max_new_tokens - 1):
            if decode_step_call is not None:
                last, caches = decode_step_call(
                    variables, caches, last, pad, jnp.int32(i))
            else:
                last, caches = _generate_decode_step(
                    model, variables, caches, last, pad,
                    jnp.int32(i), t, max_new_tokens)
            toks.append(last)
        return jnp.stack(toks, axis=1)
    toks, _ = _generate_decode(model, variables, caches, last, pad,
                               t, max_new_tokens)
    return toks
