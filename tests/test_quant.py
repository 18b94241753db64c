"""Weight-only int8 LM quantization (vla/quant.py): converter bounds,
exactness on representable weights, quantized generate/scorer, QLoRA
layout, and TP sharding of the quantized tree."""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from leafgrasp_tpu.vla.llava_jax import (LlavaJax, LlavaJaxConfig,
                                         greedy_generate_llava)
from leafgrasp_tpu.vla.quant import (quantize_llava_variables,
                                     LM_PROJ_NAMES)


TINY = LlavaJaxConfig(
    vis_hidden=32, vis_intermediate=64, vis_layers=2, vis_heads=2,
    image_size=28, patch_size=14,
    vocab_size=128, hidden=32, intermediate=64, layers=2,
    heads=4, kv_heads=2)


def _init_pair(cfg=TINY, seed=0):
    model = LlavaJax(cfg)
    rng = np.random.default_rng(seed)
    px = jnp.asarray(rng.normal(size=(1, 28, 28, 3)), jnp.float32)
    ids = jnp.asarray([[1, 5, 100, 100, 100, 100, 7, 9]], jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), ids,
                           pixel_values=px)
    return model, variables, ids, px


def _lm_kernel_keys(variables):
    import flax.traverse_util as tu
    return [k for k in tu.flatten_dict(variables)
            if k[-1] == "kernel" and set(k) & set(LM_PROJ_NAMES)
            and "vision_tower" not in k]


def test_quantize_error_bound_and_passthrough():
    """Per-column dequant error <= scale/2; vision/embed leaves pass
    through untouched; every LM kernel is replaced."""
    import flax.traverse_util as tu
    _, variables, _, _ = _init_pair()
    keys = _lm_kernel_keys(variables)
    assert len(keys) == 2 * 7 + 1       # 7 projections x 2 layers + head

    qvars = quantize_llava_variables(variables)
    flat = tu.flatten_dict(variables)
    qflat = tu.flatten_dict(qvars)
    for k in keys:
        w = np.asarray(flat[k], np.float32)
        q = np.asarray(qflat[k[:-1] + ("kernel_q",)])
        s = np.asarray(qflat[k[:-1] + ("kernel_scale",)])
        assert q.dtype == np.int8 and s.dtype == np.float32
        err = np.abs(q.astype(np.float32) * s - w)
        assert (err <= s[None, :] / 2 + 1e-7).all()
        assert k not in qflat
    # untouched leaves are identical objects/values
    for k, v in flat.items():
        if k not in keys:
            np.testing.assert_array_equal(np.asarray(qflat[k]),
                                          np.asarray(v))


def test_quantized_logits_exact_on_representable_weights():
    """Kernels snapped to int8 x power-of-two-scale values survive
    quantization exactly, so the quantized model's logits equal the
    float model's (power-of-two scaling is exact in fp)."""
    import flax.traverse_util as tu
    model, variables, ids, px = _init_pair()
    flat = dict(tu.flatten_dict(variables))
    s0 = np.float32(2.0 ** -5)
    for k in _lm_kernel_keys(variables):
        w = np.asarray(flat[k], np.float32)
        q0 = np.clip(np.rint(w / s0), -127, 127)
        q0[0, :] = 127.0            # pin the per-column max -> scale
        flat[k] = jnp.asarray(q0 * s0)
    variables = tu.unflatten_dict(flat)

    ref, _ = model.apply(variables, ids, pixel_values=px)

    qcfg = dataclasses.replace(TINY, quantized=True)
    qmodel = LlavaJax(qcfg)
    qvars = quantize_llava_variables(variables)
    got, _ = qmodel.apply(qvars, ids, pixel_values=px)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_quantized_generate_and_scorer():
    """Quantized model drives greedy generate (scan + steps agree) and
    the LlavaJaxScorer end-to-end."""
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer

    model, variables, ids, px = _init_pair(seed=3)
    qcfg = dataclasses.replace(TINY, quantized=True)
    qmodel = LlavaJax(qcfg)
    qvars = quantize_llava_variables(variables)

    toks_a = greedy_generate_llava(qmodel, qvars, ids[:, :4],
                                   max_new_tokens=5, decode_mode="scan")
    toks_b = greedy_generate_llava(qmodel, qvars, ids[:, :4],
                                   max_new_tokens=5, decode_mode="steps")
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))

    class _Tok:
        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode()][:9]

        def decode(self, ids):
            return f"0.{abs(sum(int(i) for i in ids)) % 100:02d}"

    cands = [dict(x=i, y=i, geometric_score=0.5) for i in range(2)]
    img = np.random.default_rng(4).random((30, 30, 3)).astype(np.float32)
    scores = LlavaJaxScorer(qmodel, qvars, _Tok(),
                            max_new_tokens=3).score(img, cands, "go")
    assert len(scores) == 2 and all(0.0 <= s <= 1.0 for s in scores)


def test_qlora_layout_and_mask():
    """quantized + lora_rank>0: base kernels quantize under 'base',
    lora_a/b stay float and lora_mask marks exactly them trainable."""
    import flax.traverse_util as tu
    from leafgrasp_tpu.vla.lora import lora_mask

    cfg = dataclasses.replace(TINY, lora_rank=2)
    model, variables, ids, px = _init_pair(cfg, seed=5)
    qvars = quantize_llava_variables(variables)
    qcfg = dataclasses.replace(cfg, quantized=True)
    qmodel = LlavaJax(qcfg)
    logits, _ = qmodel.apply(qvars, ids, pixel_values=px)
    assert np.isfinite(np.asarray(logits)).all()

    flat = tu.flatten_dict(qvars)
    assert ("params", "layer_0", "self_attn", "q_proj", "base",
            "kernel_q") in flat
    assert ("params", "layer_0", "self_attn", "q_proj",
            "lora_a") in flat
    mask = tu.flatten_dict(lora_mask(qvars["params"]))
    trainable = {k for k, v in mask.items() if v}
    assert all(k[-1] in ("lora_a", "lora_b") for k in trainable)
    assert trainable


def test_quantized_tp_sharding():
    """kernel_q shards column-wise over the model axis and kernel_scale
    follows it (parallel/sharding.py rule)."""
    import flax.traverse_util as tu
    from jax.sharding import Mesh, PartitionSpec as P
    from leafgrasp_tpu.parallel.sharding import infer_param_shardings

    _, variables, _, _ = _init_pair(seed=7)
    qvars = quantize_llava_variables(variables)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    sh = tu.flatten_dict(infer_param_shardings(qvars, mesh))
    qk = [p for p in sh if p[-1] == "kernel_q"
          and "gate_proj" in p][0]
    sk = qk[:-1] + ("kernel_scale",)
    assert sh[qk].spec == P(None, "model")
    assert sh[sk].spec == P("model")
