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
  is ~12.6 GB of the 14.1 GB total, so S=8 leaves ~1.8 GB of layer
  weights per chip. PP is therefore the capacity axis: it fits models
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


def shard_stage_params(mesh, stages, axis: str = "data"):
    """device_put the stacked stage tree with dim 0 over the pipeline
    axis (each chip materializes only its own stage's layers)."""
    return jax.device_put(stages, NamedSharding(mesh, P(axis)))


def _embed_and_splice(model, rest, input_ids, pixel_values):
    """Token embedding with HF image-placeholder splicing, replicated.

    Mirrors LlavaJax.__call__ (vla/llava_jax.py:356-382): the k-th
    image-token row of the text embedding is replaced by the k-th
    projected vision-feature row, counted over the flattened batch.
    """
    from leafgrasp_tpu.vla.llava_jax import _VisionProject

    c = model.cfg
    emb = rest["embed_tokens"]["embedding"]
    x = jnp.take(emb, input_ids, axis=0).astype(c.jnp_dtype)
    if pixel_values is not None:
        vis = {k: rest[k]
               for k in ("vision_tower", "mm_linear_1", "mm_linear_2")}
        feats = _VisionProject(c).apply({"params": vis}, pixel_values)
        flat = feats.reshape(-1, c.hidden)
        is_img = (input_ids == c.image_token_index)
        img_order = jnp.cumsum(is_img.reshape(-1)) - 1
        take = jnp.take(flat, jnp.clip(img_order, 0, flat.shape[0] - 1),
                        axis=0).reshape(x.shape)
        x = jnp.where(is_img[..., None], take, x)
    return x


def make_pp_llava_forward(mesh, model, n_microbatches: int,
                          axis: str = "data",
                          logits_last_only: bool = False,
                          remat: bool = False):
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

    def apply_one(lp, h, positions, mask):
        h, _ = layer.apply({"params": lp}, h, positions, mask)
        return h

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

    # other mesh axes (e.g. "model") are unused: params/activations are
    # replicated over them, so every rank computes identically.
    pp_sharded = shard_map(
        pp_layers, mesh=mesh,
        in_specs=(P(axis), P(), P(), P()), out_specs=P(),
        check_vma=False)

    @jax.jit
    def fn(rest, stages, input_ids, pixel_values=None):
        b, t = input_ids.shape
        if b % n_microbatches:
            raise ValueError(f"batch {b} not divisible by "
                             f"M={n_microbatches}")
        mb = b // n_microbatches
        x = _embed_and_splice(model, rest, input_ids, pixel_values)

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
        return x @ rest["lm_head"]["kernel"]

    return fn
