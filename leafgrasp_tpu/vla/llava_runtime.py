"""Serving glue for the LLaVA JAX stack: loader + candidate scorer.

``load_llava_from_hf`` turns a local HuggingFace checkpoint (e.g.
``llava-hf/llava-v1.6-mistral-7b-hf`` downloaded to disk) into
(model, variables, tokenizer); ``LlavaJaxScorer`` is the
VLAProcessor backend that evaluates grasp candidates with it -- the
JAX-native replacement for the reference's transformers pipeline
(llava_processor.py:18-101), same prompt template, same parse contract.
"""

from __future__ import annotations

import collections
from typing import List

import numpy as np

from leafgrasp_tpu.vla.processor import build_prompt, parse_score

__all__ = ["load_llava_from_hf", "LlavaJaxScorer", "CLIP_IMAGE_MEAN",
           "CLIP_IMAGE_STD", "preprocess_image"]

CLIP_IMAGE_MEAN = np.array([0.48145466, 0.4578275, 0.40821073], np.float32)
CLIP_IMAGE_STD = np.array([0.26862954, 0.26130258, 0.27577711], np.float32)


def preprocess_image(image: np.ndarray, size: int) -> np.ndarray:
    """RGB image -> (1, size, size, 3) CLIP-normalized float32 (the
    single-tile path; LLaVA-NeXT anyres tiling composes on top)."""
    img = np.asarray(image, np.float32)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    if img.max() > 1.5:
        img = img / 255.0
    h, w = img.shape[:2]
    ys = (np.arange(size) * h // size).clip(0, h - 1)
    xs = (np.arange(size) * w // size).clip(0, w - 1)
    img = img[ys][:, xs]
    img = (img - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD
    return img[None]


def load_llava_from_hf(model_path: str, lora_rank: int = 0,
                       dtype: str = "float32"):
    """Load a local HF LLaVA checkpoint into the JAX stack VIA
    transformers (legacy path; requires transformers+torch installed).

    Prefer ``leafgrasp_tpu.vla.checkpoint_io.load_llava_checkpoint``,
    which reads the same checkpoint directory (config.json +
    safetensors + tokenizer.model) with zero transformers/torch
    imports. This wrapper remains for checkpoints in formats only
    transformers can parse (e.g. .bin pickles). Returns
    (LlavaJax model, variables, tokenizer).
    """
    import dataclasses
    import jax
    from transformers import AutoTokenizer, LlavaForConditionalGeneration
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax, config_from_hf,
                                             convert_hf_llava_state_dict,
                                             attach_lora)

    hf = LlavaForConditionalGeneration.from_pretrained(model_path)
    cfg = config_from_hf(hf.config)
    if lora_rank > 0:
        cfg = dataclasses.replace(cfg, lora_rank=lora_rank)
    model = LlavaJax(cfg)
    variables = convert_hf_llava_state_dict(hf.state_dict(), cfg)
    if lora_rank > 0:
        variables = attach_lora(model, variables, jax.random.PRNGKey(0))
    tokenizer = AutoTokenizer.from_pretrained(model_path)
    return model, variables, tokenizer


class LlavaJaxScorer:
    """VLAProcessor backend running the LLaVA JAX stack.

    tokenizer: any object with encode(text)->ids and decode(ids)->str
    (the HF tokenizer, or a test stub). Image tokens are inserted as
    ``num_patches`` copies of image_token_index before the prompt, the
    HF-processor convention.
    """

    def __init__(self, model, variables, tokenizer,
                 max_new_tokens: int = 10,
                 max_batch: int | None = None,
                 decode_mode: str = "scan",
                 decode_weight_layout: str = "default",
                 anyres: bool = False):
        """max_batch: cap on candidates per generate call (None = all
        at once). decode_mode: "scan" (fused decode loop) or "steps"
        (one program per token). For a 7B model on a single 16 GB chip
        use decode_mode="steps" -- the fused scan's hoisted weight-
        layout copies do not fit next to 14.1 GB of weights at batch 5
        (PERF.md 'VLA serving': batched rerank 549 ms vs 1.28 s).

        anyres: use the LLaVA-NeXT (v1.6) tiling path -- the reference
        model IS v1.6 (llava-v1.6-mistral-7b, llava_processor.py:18-31)
        and its transformers pipeline tiles images to the config's
        grid pinpoints at inference. Tiles encode through the vision
        tower once per frame (shared across candidates), pack host-side
        with unpadding + the learned newline row (vla/llava_next.py),
        and the packed sequence splices in as image_features; the
        per-row image-token count becomes the packed length (~5x the
        single-tile 576 at 7B dims). Requires cfg.image_grid_pinpoints
        and the image_newline param (both carried by checkpoint_io from
        a v1.6 config.json / safetensors).

        decode_weight_layout: "default" keeps weights in default
        layouts; "auto" (steps mode only) compiles the decode-step
        program with AUTO weight input formats on first use and
        relayouts the weights into the layouts it prefers -- measured
        5.3% faster 7B decode on one v5e (PERF.md 'VLA serving',
        tools/bench_decode_layout.py). The relayout happens before the
        first prefill compile so each program compiles exactly once;
        a change in batch shape re-prepares for the new shape. If the
        backend cannot compile AUTO formats the scorer logs a warning
        and falls back to default layouts."""
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.max_new_tokens = max_new_tokens
        self.max_batch = max_batch
        self.decode_mode = decode_mode
        self.decode_weight_layout = decode_weight_layout
        self.anyres = anyres
        if anyres:
            if not model.cfg.image_grid_pinpoints:
                raise ValueError(
                    "anyres=True needs cfg.image_grid_pinpoints (a "
                    "LLaVA-NeXT / v1.6 checkpoint config)")
            if "image_newline" not in variables.get("params", {}):
                raise ValueError(
                    "anyres=True needs the image_newline parameter "
                    "(present in v1.6 safetensors; checkpoint_io "
                    "carries it through)")
        self._decode_calls = {}   # (batch, prompt_len) -> compiled call
        # (tiles shape, image hw) -> jitted enc. LRU-bounded: each anyres
        # image size compiles its own tower+pack program, so serving
        # arbitrary resolutions would otherwise grow compiled programs
        # (host + device memory) without bound (ADVICE r4). A fixed
        # camera (the reference's deployment) uses exactly one slot.
        self._encode_calls = collections.OrderedDict()
        self._encode_calls_max = 8
        self._tower_call = None   # jitted single-tile tower+projector

    def _encode(self, prompt: str, n_image_tokens: int) -> list:
        ids = list(self.tokenizer.encode(prompt))
        if n_image_tokens:
            c = self.model.cfg
            ids = [c.image_token_index] * n_image_tokens + ids
        return ids

    def _encode_image(self, image):
        """Shared per-frame image encode: (1, N, hidden) features + N.

        Single-tile (v1.5) path: one CLIP tower pass, N = num_patches.
        anyres (v1.6): tile to the best grid pinpoint, encode ALL tiles
        in one tower batch, pack with unpad + newline ON DEVICE.

        Both paths run as ONE jitted program per (tile shape, image
        size): an eager tower apply dispatches every op separately
        (~3.8 ms tunnel RTT each -> seconds per frame), and host-side
        packing round-trips ~40 MB of 7B-dims tile features; measured
        together they dominated the first anyres serving bench.
        """
        import jax
        import jax.numpy as jnp
        from leafgrasp_tpu.vla.llava_jax import _VisionProject

        c = self.model.cfg
        if not self.anyres:
            px = jnp.asarray(preprocess_image(image, c.image_size))
            if self._tower_call is None:
                self._tower_call = jax.jit(
                    lambda v, p: _VisionProject(c).apply(v, p))
            return self._tower_call(self.variables, px), c.num_patches
        from leafgrasp_tpu.vla.llava_next import (
            preprocess_anyres, pack_anyres_features_jnp,
            clip_normalize_jnp)
        # uint8 tiles over the wire (1/4 the f32 bytes -- the tile
        # transfer dominated the encode stage through the tunnel);
        # CLIP normalization runs inside the jitted encode, bit-equal
        # to the host path (clip_normalize_jnp)
        tiles, hw = preprocess_anyres(image, c.image_grid_pinpoints, c,
                                      normalize=False)
        key = (tiles.shape, hw)
        if key in self._encode_calls:
            self._encode_calls.move_to_end(key)
        else:
            def enc(v, tl):
                tf = _VisionProject(c).apply(v, clip_normalize_jnp(tl))
                return pack_anyres_features_jnp(
                    tf, hw, c.image_grid_pinpoints, c,
                    v["params"]["image_newline"])
            self._encode_calls[key] = jax.jit(enc)
            while len(self._encode_calls) > self._encode_calls_max:
                self._encode_calls.popitem(last=False)
        packed = self._encode_calls[key](self.variables,
                                         jnp.asarray(tiles))
        return packed[None], packed.shape[0]

    def score(self, image, candidates: List[dict],
              instruction: str) -> List[float]:
        """Score every candidate in ONE batched generate.

        The reference loops the 7B model once per candidate
        (llava_processor.py:78-101); batch-1 decode is weight-HBM-bound,
        so left-pad-batching the 5 prompts costs ~one candidate's
        latency. The shared image encodes once through the vision tower
        and its features broadcast across rows. Masking guarantees rows
        never attend across the batch or into pad slots, so batched
        scoring is equivalent to sequential scoring up to floating-point
        tiling effects (bf16 TPU matmul tiling varies with batch shape).
        MEASURED on the real chip at 7B dims (PERF.md "Batched-vs-
        sequential rerank stability", tools/bench_rerank_stability.py):
        0 parsed-score flips in 100 batch-5-vs-batch-1 candidates at
        bf16; first-step logit deltas stay under ~4% of the logits'
        std. Exact equality additionally verified on the f32 CPU
        configs (tests/test_llava_jax.py).
        """
        feats, n_img = None, 0
        if image is not None:
            feats, n_img = self._encode_image(image)  # (1, N, hidden)
        rows = [self._encode(build_prompt(c, instruction), n_img)
                for c in candidates]
        step = self.max_batch or len(rows)
        out: List[float] = []
        for lo in range(0, len(rows), step):
            out.extend(self._score_batch(rows[lo:lo + step], feats))
        return out

    def _ensure_decode_layout(self, b: int, t: int) -> None:
        """Prepare the decode-format program + relayouted weights for
        shape (b, t); no-op when already prepared for that shape."""
        from leafgrasp_tpu.vla.llava_jax import prepare_decode_layout
        if (b, t) in self._decode_calls:
            return
        box = [self.variables]
        self.variables = None   # our ref must die for leaves to free
        try:
            # a second prepare for a new shape relayouts again, but
            # device_put into an already-matching format is free
            self.variables, call, _ = \
                prepare_decode_layout(self.model, box, b, t,
                                      self.max_new_tokens)
            self._decode_calls[(b, t)] = call
        except Exception as e:          # backend without AUTO formats
            if box:                     # tree not consumed yet
                self.variables = box.pop()
                self.decode_weight_layout = "default"
                import logging
                logging.getLogger(__name__).warning(
                    "decode_weight_layout='auto' unavailable (%s); "
                    "falling back to default layouts", e)
            else:                       # weights consumed: can't recover
                raise

    def _score_batch(self, rows, feats) -> List[float]:
        import jax.numpy as jnp
        from leafgrasp_tpu.vla.llava_jax import greedy_generate_llava
        b = len(rows)
        t = max(len(r) for r in rows)
        if (self.decode_weight_layout == "auto"
                and self.decode_mode == "steps"):
            self._ensure_decode_layout(b, t)
        ids = np.zeros((b, t), np.int32)
        pad = np.zeros((b,), np.int32)
        for i, r in enumerate(rows):
            pad[i] = t - len(r)
            ids[i, pad[i]:] = r
        if feats is not None:
            feats = jnp.broadcast_to(feats, (b,) + feats.shape[1:])
        gen = greedy_generate_llava(self.model, self.variables,
                                    jnp.asarray(ids),
                                    image_features=feats,
                                    max_new_tokens=self.max_new_tokens,
                                    pad_lens=jnp.asarray(pad),
                                    decode_mode=self.decode_mode,
                                    decode_step_call=self._decode_calls
                                    .get((b, t)))
        gen = np.asarray(gen)
        return [parse_score(self.tokenizer.decode(gen[i].tolist()))
                for i in range(b)]
