"""GPipe-style pipeline parallelism for the LLaVA decoder stack.

The reference serves its LLaVA-1.6-Mistral-7B on a single GPU
(vla_system/llava_processor.py:18-31) and fine-tunes it with a
per-sample loop (vla_system/vla_trainer.py:125-174); it has no
model-partitioning story at all (SURVEY.md section 2.10). The rebuild
already scales the LM two ways -- data parallel (parallel/batch.py) and
tensor parallel (parallel/sharding.py). This module adds the third
classic axis: **pipeline parallelism** over the decoder layers.

Design (TPU-native, scaling-book recipe):

* The ``layers`` contiguous Mistral blocks are split into S stages of
  L/S layers each. Every stage's parameter pytree is stacked on a new
  leading axis and sharded over the mesh's pipeline axis, so each chip
  holds ONLY its own stage's weights -- at 7B dims the 32-layer stack
  is ~12.6 GB of the 14.1 GB total, so S=8 leaves ~1.6 GB of layer
  weights (plus ~0.5 GB replicated embed/vision/head, ~2.1 GB total)
  per chip. PP is therefore the capacity axis: it fits models
  (or optimizer states, for LoRA/full fine-tunes) that cannot live on
  one chip, where TP alone would still replicate the full stack's
  activations per layer.
* Microbatches stream through the stages (GPipe schedule): the batch
  is split into M microbatches; at pipeline step t, stage s processes
  microbatch t-s and hands its activation to stage s+1 over ICI via
  ``lax.ppermute``. The whole schedule is M + S - 1 steps; the bubble
  fraction is (S-1)/(M+S-1).
* Embedding + vision splice (below the stack) and the final norm +
  lm_head (above it) are computed replicated -- they are ~10% of the
  weights and removing them from the pipeline keeps the schedule a
  pure ring. Their math mirrors LlavaJax.__call__ exactly
  (vla/llava_jax.py:356-416) and is parity-tested against it.
* Backward needs no extra machinery: the transpose of ``ppermute`` is
  the reverse permute, so ``jax.grad`` through the pipelined forward
  IS pipeline-parallel backprop (tested: grads match the plain model).

Scope: prefill / training forward (no KV caches). Incremental decode
stays on the TP path (parallel/sharding.py) -- a 1-token decode step
has no microbatch axis to pipeline over.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # JAX >= 0.8 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

__all__ = ["split_decoder_stages", "shard_stage_params",
           "make_pp_llava_forward"]

# Megatron-style TP split of a decoder layer: q/k/v/gate/up kernels
# slice column-wise (each TP rank holds a head / intermediate slice),
# o/down kernels slice row-wise (their partial outputs psum back to
# full); norms replicate. Same marker set as parallel/sharding.py.
_TP_COL = ("q_proj", "k_proj", "v_proj", "gate_proj", "up_proj")
_TP_ROW = ("o_proj", "down_proj")


def split_decoder_stages(variables: Dict[str, Any], cfg,
                         n_stages: int) -> Tuple[Dict, Dict]:
    """Split LlavaJax variables into (stacked stage params, the rest).

    Returns ``(stages, rest)`` where ``stages`` is the ``layer_*``
    subtree stacked to leaves of shape (S, L/S, \\*param) -- dim 0 is
    the pipeline axis -- and ``rest`` holds every non-layer param
    (embed_tokens, vision tower + projector, final norm, lm_head),
    which stays replicated.
    """
    params = variables["params"]
    n_layers = cfg.layers
    if n_layers % n_stages:
        raise ValueError(f"{n_layers} layers not divisible by "
                         f"{n_stages} pipeline stages")
    per = n_layers // n_stages
    layer_trees = [params[f"layer_{i}"] for i in range(n_layers)]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layer_trees)
    stages = jax.tree.map(
        lambda a: a.reshape((n_stages, per) + a.shape[1:]), stacked)
    rest = {k: v for k, v in params.items()
            if not k.startswith("layer_")}
    return stages, rest


def _stage_spec(path, axis: str, tp_axis) -> P:
    """PartitionSpec for one stacked-stage leaf (S, L/S, *param)."""
    if tp_axis is not None:
        names = {str(getattr(p, "key", p)) for p in path}
        if "kernel" in names:
            if names & set(_TP_COL):
                return P(axis, None, None, tp_axis)
            if names & set(_TP_ROW):
                return P(axis, None, tp_axis, None)
    return P(axis)


def shard_stage_params(mesh, stages, axis: str = "data",
                       tp_axis: str | None = None):
    """device_put the stacked stage tree with dim 0 over the pipeline
    axis (each chip materializes only its own stage's layers).

    tp_axis: additionally shard each stage's projection kernels over a
    second mesh axis (PP x TP composition): q/k/v/gate/up column-wise,
    o/down row-wise -- each chip then holds layer-slice x head-slice,
    the 2D partition a 7B fine-tune needs (PERF.md 'Pipeline-parallel
    LLaVA scaling model': PP for capacity, TP within a stage for
    latency). Pair with ``make_pp_llava_forward(..., tp_axis=...)``.
    """
    if tp_axis is None:
        return jax.device_put(stages, NamedSharding(mesh, P(axis)))
    return jax.tree_util.tree_map_with_path(
        lambda path, a: jax.device_put(
            a, NamedSharding(mesh, _stage_spec(path, axis, tp_axis))),
        stages)


def _embed_and_splice(model, rest, input_ids, pixel_values,
                      image_features=None):
    """Token embedding with HF image-placeholder splicing, replicated.

    Mirrors LlavaJax.__call__ (vla/llava_jax.py:356-382): the k-th
    image-token row of the text embedding is replaced by the k-th
    projected vision-feature row, counted over the flattened batch.
    ``image_features`` (N, hidden) bypasses the tower -- the anyres /
    LLaVA-NeXT path packs tile features host-side (vla/llava_next.py)
    and hands the packed sequence in directly, exactly like
    vla/llava_jax.py:364-374.
    """
    from leafgrasp_tpu.vla.llava_jax import _VisionProject

    c = model.cfg
    emb = rest["embed_tokens"]["embedding"]
    x = jnp.take(emb, input_ids, axis=0).astype(c.jnp_dtype)
    if pixel_values is not None or image_features is not None:
        if image_features is None:
            vis = {k: rest[k]
                   for k in ("vision_tower", "mm_linear_1", "mm_linear_2")}
            feats = _VisionProject(c).apply({"params": vis}, pixel_values)
        else:
            feats = image_features
        flat = feats.reshape(-1, c.hidden)
        is_img = (input_ids == c.image_token_index)
        img_order = jnp.cumsum(is_img.reshape(-1)) - 1
        take = jnp.take(flat, jnp.clip(img_order, 0, flat.shape[0] - 1),
                        axis=0).reshape(x.shape)
        x = jnp.where(is_img[..., None], take, x)
    return x


def _tp_layer_forward(c, lp, x, positions, mask, tp_axis: str):
    """Tensor-parallel _MistralLayer forward over sliced params.

    ``lp`` holds THIS rank's slice of one layer: q/k/v/gate/up kernels
    column-sliced (local heads / local intermediate), o/down kernels
    row-sliced, norms replicated. The math mirrors _MistralLayer /
    _MistralAttention (vla/llava_jax.py:258-322) exactly, except that
    the o_proj and down_proj outputs are partial sums that
    ``lax.psum`` over ``tp_axis`` restores BEFORE each residual add --
    the Megatron split (one all-reduce after attention, one after the
    MLP). Plain Dense kernels only (no LoRA / quantized TP layers).
    """
    from leafgrasp_tpu.vla.llava_jax import _RMSNorm, _rope_hf

    dt = c.jnp_dtype
    hd = c.head_dim
    b, t = x.shape[:2]
    rms = _RMSNorm(c.rms_eps)

    h = rms.apply({"params": lp["input_layernorm"]}, x)
    sa = lp["self_attn"]
    hc = h.astype(dt)
    q = hc @ sa["q_proj"]["kernel"].astype(dt)
    k = hc @ sa["k_proj"]["kernel"].astype(dt)
    v = hc @ sa["v_proj"]["kernel"].astype(dt)
    lh = q.shape[-1] // hd        # local query heads (= heads / TP)
    lkv = k.shape[-1] // hd       # local kv heads
    q = _rope_hf(q.reshape(b, t, lh, hd), positions, c.rope_theta)
    k = _rope_hf(k.reshape(b, t, lkv, hd), positions, c.rope_theta)
    v = v.reshape(b, t, lkv, hd)
    kr = jnp.repeat(k, lh // lkv, axis=2)
    vr = jnp.repeat(v, lh // lkv, axis=2)
    scores = jnp.einsum("bthd,bshd->bhts", q, kr,
                        preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(hd))
    scores = jnp.where(mask, scores, jnp.float32(-1e30))
    probs = jax.nn.softmax(scores, axis=-1).astype(h.dtype)
    out = jnp.einsum("bhts,bshd->bthd", probs, vr).reshape(b, t, lh * hd)
    attn = out.astype(dt) @ sa["o_proj"]["kernel"].astype(dt)
    x = x + jax.lax.psum(attn, tp_axis)

    h = rms.apply({"params": lp["post_attention_layernorm"]}, x)
    hc = h.astype(dt)
    gate = hc @ lp["gate_proj"]["kernel"].astype(dt)
    up = hc @ lp["up_proj"]["kernel"].astype(dt)
    down = (jax.nn.silu(gate) * up).astype(dt) \
        @ lp["down_proj"]["kernel"].astype(dt)
    return x + jax.lax.psum(down, tp_axis)


def make_pp_llava_forward(mesh, model, n_microbatches: int,
                          axis: str = "data",
                          logits_last_only: bool = False,
                          remat: bool = False,
                          tp_axis: str | None = None):
    """Build the pipelined forward: fn(rest, stages, input_ids,
    pixel_values=None) -> logits (B, T, vocab) [or (B, 1, vocab)].

    mesh            : jax Mesh; ``axis`` names the pipeline dimension
                      (S = mesh.shape[axis] stages).
    model           : a LlavaJax instance (bf16/f32 or quantized --
                      stage application is the model's own
                      _MistralLayer, whatever its projections are).
    n_microbatches  : M; the batch B must be divisible by M. Bubble
                      fraction is (S-1)/(M+S-1), so M >= S is the
                      efficient regime (e.g. the 5-candidate rerank at
                      M=5 on a 4-stage pipeline runs at 5/8 utilization).

    remat=True wraps each layer in ``jax.checkpoint``: under ``grad``
    only the layer INPUTS stay live through the schedule and the layer
    internals (attention probs, gate/up activations) recompute in the
    backward pass -- the standard memory/FLOPs trade for pipeline
    training, where GPipe keeps M microbatches of activations alive.

    tp_axis: compose tensor parallelism WITHIN each stage -- every
    layer's projections run Megatron-split over this second mesh axis
    (shard the stages with ``shard_stage_params(..., tp_axis=...)``).
    Requires heads, kv_heads and intermediate divisible by the TP size
    and a plain (non-LoRA, non-quantized) model.

    ``stages`` comes from :func:`split_decoder_stages` +
    :func:`shard_stage_params`; ``rest`` is replicated.
    """
    from leafgrasp_tpu.vla.llava_jax import _MistralLayer, _RMSNorm

    c = model.cfg
    n_stages = int(mesh.shape[axis])
    layer = _MistralLayer(c)
    norm = _RMSNorm(c.rms_eps)
    perm = [(i, (i + 1) % n_stages) for i in range(n_stages)]
    n_steps = n_microbatches + n_stages - 1

    if tp_axis is None:
        def apply_one(lp, h, positions, mask):
            h, _ = layer.apply({"params": lp}, h, positions, mask)
            return h
    else:
        tp = int(mesh.shape[tp_axis])
        if c.kv_heads % tp or c.heads % tp or c.intermediate % tp:
            raise ValueError(
                f"TP size {tp} must divide heads={c.heads}, "
                f"kv_heads={c.kv_heads} and intermediate={c.intermediate}")
        if c.quantized or c.lora_rank > 0:
            raise ValueError("tp_axis supports plain Dense layers only "
                             "(no quantized / LoRA TP stages)")

        def apply_one(lp, h, positions, mask):
            return _tp_layer_forward(c, lp, h, positions, mask, tp_axis)

    if remat:
        apply_one = jax.checkpoint(apply_one)

    def stage_apply(stage_params, x, positions, mask):
        # stage_params leaves: (L/S, *param) -> scan one layer at a time
        def body(h, lp):
            return apply_one(lp, h, positions, mask), None

        x, _ = jax.lax.scan(body, x, stage_params)
        return x

    def pp_layers(stages, xs, pos, mask):
        # per-device: stages leaves (1, L/S, ...); xs (M, mb, T, H)
        sp = jax.tree.map(lambda a: a[0], stages)
        s = jax.lax.axis_index(axis)
        out = jnp.zeros_like(xs)
        cur = jnp.zeros_like(xs[0])
        for t in range(n_steps):
            i_in = t - s                     # microbatch entering stage s
            idx = jnp.clip(i_in, 0, n_microbatches - 1)
            h = jnp.where(s == 0, xs[idx], cur)
            y = stage_apply(sp, h, jnp.take(pos, idx, axis=0), mask)
            done = (s == n_stages - 1) & (i_in >= 0) \
                & (i_in < n_microbatches)
            out = jnp.where(done, jax.lax.dynamic_update_slice(
                out, y[None].astype(out.dtype), (idx, 0, 0, 0)), out)
            cur = jax.lax.ppermute(y, axis, perm)
        # replicate the last stage's outputs to every device
        keep = jnp.where(s == n_stages - 1, out, jnp.zeros_like(out))
        return jax.lax.psum(keep, axis)

    @jax.jit
    def fn(rest, stages, input_ids, pixel_values=None,
           image_features=None):
        b, t = input_ids.shape
        if b % n_microbatches:
            raise ValueError(f"batch {b} not divisible by "
                             f"M={n_microbatches}")
        mb = b // n_microbatches
        # Without TP the other mesh axes are unused (params/activations
        # replicate over them, every rank computes identically); with
        # tp_axis each stage leaf carries its own (pipeline, TP) spec.
        stage_specs = jax.tree_util.tree_map_with_path(
            lambda path, _: _stage_spec(path, axis, tp_axis), stages)
        pp_sharded = shard_map(
            pp_layers, mesh=mesh,
            in_specs=(stage_specs, P(), P(), P()), out_specs=P(),
            check_vma=False)
        x = _embed_and_splice(model, rest, input_ids, pixel_values,
                              image_features)

        positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        mask = jnp.tril(jnp.ones((t, t), bool))
        if c.sliding_window is not None:  # vla/llava_jax.py:389-393
            qi = jnp.arange(t)[:, None]
            ki = jnp.arange(t)[None, :]
            mask = mask & (qi - ki < c.sliding_window)
        mask = mask[None, None]

        xs = x.reshape(n_microbatches, mb, t, c.hidden)
        pos = positions.reshape(n_microbatches, mb, t)
        y = pp_sharded(stages, xs, pos, mask)

        x = y.reshape(b, t, c.hidden)
        x = norm.apply({"params": rest["norm"]}, x)
        if logits_last_only:                 # vla/llava_jax.py:403-407
            x = x[:, -1:]
        # head projection mirrors LlavaJax.__call__ (llava_jax.py:408-416):
        # quantized models store lm_head as (kernel_q, kernel_scale)
        if c.quantized:
            from leafgrasp_tpu.vla.quant import QuantDense
            return QuantDense(c.vocab_size, dtype=c.jnp_dtype,
                              bits=c.quant_bits, group=c.quant_group,
                              packed=c.quant_packed).apply(
                {"params": rest["lm_head"]}, x)
        return x @ rest["lm_head"]["kernel"]

    return fn
