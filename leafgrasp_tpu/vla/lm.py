"""TinyVLA: a Mistral-shaped vision-language decoder in Flax.

The reference's VLA is LLaVA-1.6-Mistral-7B behind `transformers`
(llava_processor.py:18-31).  The TPU-native runtime here is the same
*architecture family* at configurable scale: byte-level tokenizer,
vision-prefix conditioning (conv encoder -> prefix tokens), RMSNorm,
rotary attention with grouped KV heads, SwiGLU MLP, optional LoRA on
q/k/v/o/gate/up/down (matching the reference's adapter target set,
vla_trainer.py:36-41), greedy decode under ``lax.scan`` with a KV cache.

Scaling-ready: attention/MLP kernels carry named partitioning metadata
on the 'model' axis so the same module pjit-shards tensor-parallel over
a mesh; at 7B-config this is the deployment path for real LLaVA weights.
"""

from __future__ import annotations

import dataclasses
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from leafgrasp_tpu.vla.lora import LoRADense

__all__ = ["VLAModelConfig", "ByteTokenizer", "TinyVLA", "greedy_generate",
           "init_vla"]


@dataclasses.dataclass(frozen=True)
class VLAModelConfig:
    vocab_size: int = 260           # 256 bytes + specials
    dim: int = 128
    n_layers: int = 2
    n_heads: int = 4
    n_kv_heads: int = 2
    mlp_hidden: int = 256
    max_seq: int = 640
    rope_theta: float = 10000.0
    vision_tokens: int = 4
    vision_patch: int = 64          # input image resized to patch x patch
    lora_rank: int = 0
    lora_alpha: float = 32.0
    lora_dropout: float = 0.0

    @property
    def head_dim(self) -> int:
        return self.dim // self.n_heads


BOS, EOS, IMG = 256, 257, 258


class ByteTokenizer:
    """UTF-8 byte tokenizer with BOS/EOS/IMG specials."""

    vocab_size = 260
    bos, eos, img = BOS, EOS, IMG

    def encode(self, text: str, add_bos: bool = True) -> np.ndarray:
        ids = list(text.encode("utf-8"))
        if add_bos:
            ids = [BOS] + ids
        return np.asarray(ids, np.int32)

    def decode(self, ids) -> str:
        by = bytes(int(i) for i in np.asarray(ids).ravel()
                   if 0 <= int(i) < 256)
        return by.decode("utf-8", errors="ignore")


def _rope(x: jnp.ndarray, positions: jnp.ndarray,
          theta: float) -> jnp.ndarray:
    """x: (..., T, H, D). Rotary embedding on the last dim."""
    d = x.shape[-1]
    half = d // 2
    freqs = 1.0 / (theta ** (jnp.arange(half, dtype=jnp.float32) / half))
    angles = positions[..., None].astype(jnp.float32) * freqs  # (..., T, half)
    cos = jnp.cos(angles)[..., None, :]
    sin = jnp.sin(angles)[..., None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin,
                            x1 * sin + x2 * cos], axis=-1)


class RMSNorm(nn.Module):
    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (x.shape[-1],))
        var = jnp.mean(x.astype(jnp.float32) ** 2, axis=-1, keepdims=True)
        return (x * jax.lax.rsqrt(var + self.eps)).astype(x.dtype) * scale


class Attention(nn.Module):
    cfg: VLAModelConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None, train=False):
        cfg = self.cfg
        hd = cfg.head_dim
        lora = dict(rank=cfg.lora_rank, alpha=cfg.lora_alpha,
                    dropout=cfg.lora_dropout)

        q = LoRADense(cfg.n_heads * hd, name="q_proj", **lora)(x, train)
        k = LoRADense(cfg.n_kv_heads * hd, name="k_proj", **lora)(x, train)
        v = LoRADense(cfg.n_kv_heads * hd, name="v_proj", **lora)(x, train)

        b, t = x.shape[:2]
        q = q.reshape(b, t, cfg.n_heads, hd)
        k = k.reshape(b, t, cfg.n_kv_heads, hd)
        v = v.reshape(b, t, cfg.n_kv_heads, hd)

        q = _rope(q, positions, cfg.rope_theta)
        k = _rope(k, positions, cfg.rope_theta)

        if cache is not None:
            ck, cv, cache_len = cache
            k = jax.lax.dynamic_update_slice(ck, k, (0, cache_len, 0, 0))
            v = jax.lax.dynamic_update_slice(cv, v, (0, cache_len, 0, 0))
            new_cache = (k, v, cache_len + t)
        else:
            new_cache = None

        rep = cfg.n_heads // cfg.n_kv_heads
        kr = jnp.repeat(k, rep, axis=2)
        vr = jnp.repeat(v, rep, axis=2)

        scores = jnp.einsum("bthd,bshd->bhts", q, kr,
                            preferred_element_type=jnp.float32)
        scores = scores / jnp.sqrt(jnp.float32(hd))
        scores = jnp.where(mask, scores, -1e30)
        probs = jax.nn.softmax(scores, axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", probs, vr)
        out = out.reshape(b, t, cfg.n_heads * hd)
        out = LoRADense(cfg.dim, name="o_proj", **lora)(out, train)
        return out, new_cache


class MLP(nn.Module):
    cfg: VLAModelConfig

    @nn.compact
    def __call__(self, x, train=False):
        cfg = self.cfg
        lora = dict(rank=cfg.lora_rank, alpha=cfg.lora_alpha,
                    dropout=cfg.lora_dropout)
        gate = LoRADense(cfg.mlp_hidden, name="gate_proj", **lora)(x, train)
        up = LoRADense(cfg.mlp_hidden, name="up_proj", **lora)(x, train)
        return LoRADense(cfg.dim, name="down_proj", **lora)(
            nn.silu(gate) * up, train)


class Block(nn.Module):
    cfg: VLAModelConfig

    @nn.compact
    def __call__(self, x, positions, mask, cache=None, train=False):
        h, new_cache = Attention(self.cfg, name="attn")(
            RMSNorm(name="attn_norm")(x), positions, mask, cache, train)
        x = x + h
        x = x + MLP(self.cfg, name="mlp")(RMSNorm(name="mlp_norm")(x),
                                          train)
        return x, new_cache


class VisionEncoder(nn.Module):
    """Small conv encoder -> `vision_tokens` prefix embeddings."""
    cfg: VLAModelConfig

    @nn.compact
    def __call__(self, image):
        # image: (B, P, P, C) float32 in [0, 1]
        x = image
        for feats in (16, 32, 64):
            x = nn.Conv(feats, (3, 3), strides=(2, 2))(x)
            x = nn.gelu(x)
        b = x.shape[0]
        x = x.reshape(b, -1, x.shape[-1])
        x = jnp.mean(x.reshape(b, self.cfg.vision_tokens, -1, x.shape[-1]),
                     axis=2)
        return nn.Dense(self.cfg.dim)(x)     # (B, V, dim)


class TinyVLA(nn.Module):
    cfg: VLAModelConfig

    @nn.compact
    def __call__(self, tokens, image=None, positions=None, mask=None,
                 caches=None, train=False):
        """tokens: (B, T) int32. image: (B, P, P, C) or None.
        Returns (logits (B, T', vocab), new_caches). When an image is
        given, vision prefix tokens are prepended to the sequence."""
        cfg = self.cfg
        emb = nn.Embed(cfg.vocab_size, cfg.dim, name="tok_emb")
        x = emb(tokens)
        if image is not None:
            vis = VisionEncoder(cfg, name="vision")(image)
            x = jnp.concatenate([vis, x], axis=1)
        b, t = x.shape[:2]

        if positions is None:
            positions = jnp.broadcast_to(jnp.arange(t), (b, t))
        if mask is None:
            causal = jnp.tril(jnp.ones((t, t), bool))
            mask = causal[None, None, :, :]

        new_caches = []
        for i in range(cfg.n_layers):
            cache = caches[i] if caches is not None else None
            x, nc = Block(cfg, name=f"layer_{i}")(x, positions, mask,
                                                  cache, train)
            new_caches.append(nc)
        x = RMSNorm(name="final_norm")(x)
        logits = nn.Dense(cfg.vocab_size, use_bias=False,
                          name="lm_head")(x)
        return logits, (new_caches if caches is not None else None)


def init_vla(rng, cfg: VLAModelConfig):
    model = TinyVLA(cfg)
    tokens = jnp.zeros((1, 8), jnp.int32)
    image = jnp.zeros((1, cfg.vision_patch, cfg.vision_patch, 3),
                      jnp.float32)
    variables = model.init(rng, tokens, image=image, train=False)
    return model, variables


def greedy_generate(model: TinyVLA, variables, tokens: jnp.ndarray,
                    image=None, max_new_tokens: int = 10) -> jnp.ndarray:
    """Greedy decode. tokens: (B, T) prompt. Returns (B, max_new_tokens).

    Prefill computes the full prompt pass and fills the KV cache; the
    decode loop is a ``lax.scan`` over single-token steps (static
    shapes, cache in carry) -- the standard TPU serving pattern.
    """
    cfg = model.cfg
    b, t = tokens.shape
    prefix = cfg.vision_tokens if image is not None else 0
    total = t + prefix + max_new_tokens

    caches = [
        (jnp.zeros((b, total, cfg.n_kv_heads, cfg.head_dim),
                   jnp.float32),
         jnp.zeros((b, total, cfg.n_kv_heads, cfg.head_dim),
                   jnp.float32), jnp.int32(0))   # traced cache cursor
        for _ in range(cfg.n_layers)]

    # prefill
    tp = t + prefix
    positions = jnp.broadcast_to(jnp.arange(tp), (b, tp))
    causal = jnp.tril(jnp.ones((tp, total), bool))[None, None]
    logits, caches = model.apply(variables, tokens, image=image,
                                 positions=positions, mask=causal,
                                 caches=caches)
    last = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)

    def step(carry, i):
        caches, tok = carry
        pos = tp + i
        positions = jnp.full((b, 1), pos, jnp.int32)
        key_idx = jnp.arange(total)
        mask = (key_idx[None, None, None, :] <= pos)
        logits, caches = model.apply(variables, tok[:, None],
                                     positions=positions, mask=mask,
                                     caches=caches)
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        return (caches, nxt), tok

    (_, _), toks = jax.lax.scan(step, (caches, last),
                                jnp.arange(max_new_tokens))
    return jnp.moveaxis(toks, 0, 1)     # (B, max_new_tokens)
