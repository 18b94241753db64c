"""LoRA fine-tuning for the LLaVA JAX stack.

The reference fine-tunes LLaVA-1.6-Mistral-7B with peft LoRA
(vla_trainer.py:23-47); this is the same pipeline against
vla/llava_jax.py: ranking-derived targets, loss on the answer tokens
only, frozen base via optax.multi_transform, adapter save/load in the
same npz format as VLATrainer.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np
import jax
import jax.numpy as jnp
import optax

from leafgrasp_tpu.vla.llava_jax import LlavaJax
from leafgrasp_tpu.vla.llava_runtime import preprocess_image
from leafgrasp_tpu.vla.lora import lora_mask, extract_lora_params, \
    merge_lora_params
from leafgrasp_tpu.vla.processor import build_prompt
from leafgrasp_tpu.vla.trainer import ranking_to_targets

__all__ = ["LlavaLoRATrainer"]


class LlavaLoRATrainer:
    """Fine-tune LoRA adapters of a LlavaJax model.

    model must be built with cfg.lora_rank > 0 and `variables` must
    already contain the adapter leaves (see llava_jax.attach_lora).
    tokenizer: encode(text) -> ids (HF tokenizer or a stub).
    """

    def __init__(self, model: LlavaJax, variables, tokenizer,
                 learning_rate: float = 5e-5, seed: int = 0,
                 max_len: int = 576, train_full: bool = False):
        """train_full=True updates ALL parameters instead of adapter
        leaves -- the pretraining mode used to produce a base with real
        scoring skill before LoRA tuning (the tiny-scale analogue of
        starting from the pretrained LLaVA checkpoint; a random frozen
        base gives LoRA nothing to steer, PERF.md 'VLA fine-tuning
        sweep')."""
        self.train_full = train_full
        if not train_full:
            assert model.cfg.lora_rank > 0, \
                "build the model with lora_rank>0 (or train_full=True)"
        self.model = model
        self.variables = variables
        self.tokenizer = tokenizer
        self.learning_rate = learning_rate
        self.seed = seed
        self.max_len = max_len

    # ------------------------------------------------------------- data --

    def _example(self, sample: Dict, cand_idx: int, target: float):
        c = self.model.cfg
        prompt = build_prompt(sample["candidates"][cand_idx],
                              "Select the best leaf for grasping")
        answer = f"{target:.2f}"
        p_ids = [c.image_token_index] * c.num_patches \
            + list(self.tokenizer.encode(prompt))
        a_ids = list(self.tokenizer.encode(answer))
        ids = np.asarray(p_ids + a_ids, np.int32)
        loss_mask = np.zeros(len(ids), np.float32)
        loss_mask[len(p_ids):] = 1.0
        if len(ids) > self.max_len:      # keep the answer: trim prompt
            ids = np.concatenate([ids[:c.num_patches],
                                  ids[-(self.max_len - c.num_patches):]])
            loss_mask = np.concatenate(
                [loss_mask[:c.num_patches],
                 loss_mask[-(self.max_len - c.num_patches):]])
        return ids, loss_mask, sample["image"]

    def _pad_batch(self, examples, pad_to: int):
        c = self.model.cfg
        n = len(examples)
        toks = np.zeros((n, pad_to), np.int32)
        lmask = np.zeros((n, pad_to), np.float32)
        imgs = np.zeros((n, c.image_size, c.image_size, 3), np.float32)
        for i, (ids, lm, img) in enumerate(examples):
            toks[i, :len(ids)] = ids
            lmask[i, :len(lm)] = lm
            imgs[i] = preprocess_image(img, c.image_size)[0]
        return jnp.asarray(toks), jnp.asarray(lmask), jnp.asarray(imgs)

    # ------------------------------------------------------------ train --

    def _build_step(self):
        if self.train_full:
            tx = optax.adamw(self.learning_rate)
        else:
            labels = jax.tree.map(lambda m: "lora" if m else "frozen",
                                  lora_mask(self.variables["params"]))
            tx = optax.multi_transform(
                {"lora": optax.adamw(self.learning_rate),
                 "frozen": optax.set_to_zero()}, labels)
        opt_state = tx.init(self.variables["params"])
        model = self.model

        def loss_fn(params, toks, lmask, imgs, rng):
            logits, _ = model.apply({"params": params}, toks[:, :-1],
                                    pixel_values=imgs,
                                    rngs={"dropout": rng})
            targets = toks[:, 1:]
            lm = lmask[:, 1:]
            logp = jax.nn.log_softmax(logits, axis=-1)
            nll = -jnp.take_along_axis(logp, targets[..., None],
                                       axis=-1)[..., 0]
            return jnp.sum(nll * lm) / jnp.maximum(jnp.sum(lm), 1.0)

        @jax.jit
        def step(params, opt_state, toks, lmask, imgs, rng):
            loss, grads = jax.value_and_grad(loss_fn)(
                params, toks, lmask, imgs, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        return step, opt_state

    def fine_tune(self, samples: List[Dict], epochs: int = 1,
                  batch_size: int = 2, log_fn=None) -> Dict:
        examples = []
        for s in samples:
            for idx, tgt in ranking_to_targets(s["ranking"]).items():
                examples.append(self._example(s, idx, tgt))
        pad_to = min(self.max_len, max(len(e[0]) for e in examples) + 1)

        step, opt_state = self._build_step()
        params = self.variables["params"]
        rng = jax.random.PRNGKey(self.seed)
        np_rng = np.random.default_rng(self.seed)
        order = np.arange(len(examples))
        history = []
        for epoch in range(epochs):
            np_rng.shuffle(order)
            losses = []
            for s0 in range(0, len(order) - batch_size + 1, batch_size):
                batch = [examples[i] for i in order[s0:s0 + batch_size]]
                toks, lmask, imgs = self._pad_batch(batch, pad_to)
                rng, sub = jax.random.split(rng)
                params, opt_state, loss = step(params, opt_state, toks,
                                               lmask, imgs, sub)
                losses.append(float(loss))
            ep = float(np.mean(losses)) if losses else float("nan")
            history.append(ep)
            if log_fn:
                log_fn(epoch=epoch, loss=ep)
        self.variables = {"params": params}
        return {"loss_history": history, "final_loss": history[-1]}

    # ------------------------------------------------------------ eval --

    def evaluate(self, samples: List[Dict]) -> Dict:
        """Top-1 ranking accuracy + mean Spearman vs ground truth
        (aws_vla_training.py:160-204) via the LLaVA scorer."""
        from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
        from leafgrasp_tpu.vla.trainer import spearman_correlation
        scorer = LlavaJaxScorer(self.model, self.variables, self.tokenizer)
        top1, spear = [], []
        for s in samples:
            scores = scorer.score(s["image"], s["candidates"],
                                  "Select the best leaf for grasping")
            gt = [c["geometric_score"] for c in s["candidates"]]
            top1.append(int(np.argmax(scores)) == int(np.argmax(gt)))
            spear.append(spearman_correlation(scores, gt))
        return {"top1_accuracy": float(np.mean(top1)),
                "spearman": float(np.mean(spear))}

    # -------------------------------------------------------- adapters --

    def save_adapter(self, path: str):
        import os
        import json
        import flax.traverse_util as tu
        path = os.path.expanduser(path)
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        lora = extract_lora_params(self.variables["params"])
        flat = {"/".join(k): np.asarray(v)
                for k, v in tu.flatten_dict(lora).items()}
        np.savez_compressed(path, **flat)
        c = self.model.cfg
        with open(path + ".adapter_config.json", "w") as f:
            json.dump({"r": c.lora_rank, "lora_alpha": c.lora_alpha,
                       "lora_dropout": c.lora_dropout,
                       "base_model": "llava-jax",
                       "target_modules": ["q_proj", "k_proj", "v_proj",
                                          "o_proj", "gate_proj",
                                          "up_proj", "down_proj"]}, f,
                      indent=2)

    def load_adapter(self, path: str):
        import os
        import flax.traverse_util as tu
        data = np.load(os.path.expanduser(path))
        flat = {tuple(k.split("/")): jnp.asarray(v)
                for k, v in data.items()}
        self.variables = {"params": merge_lora_params(
            self.variables["params"], tu.unflatten_dict(flat))}
