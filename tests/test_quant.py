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


def test_int4_error_bound_group_layout():
    """int4: kernel_q is native int4 with |q| <= 7; kernel_scale is
    (G, out) group-wise; per-group dequant error <= scale/2."""
    import flax.traverse_util as tu
    _, variables, _, _ = _init_pair(seed=11)
    qvars = quantize_llava_variables(variables, bits=4, group=16)
    flat = tu.flatten_dict(variables)
    qflat = tu.flatten_dict(qvars)
    for k in _lm_kernel_keys(variables):
        w = np.asarray(flat[k], np.float32)
        q = np.asarray(qflat[k[:-1] + ("kernel_q",)], np.int8)
        s = np.asarray(qflat[k[:-1] + ("kernel_scale",)])
        g = max(1, w.shape[0] // 16) if w.shape[0] % 16 == 0 else 1
        assert qflat[k[:-1] + ("kernel_q",)].dtype == jnp.int4
        assert s.shape == (g, w.shape[1])
        assert np.abs(q).max() <= 7
        err = np.abs(q.reshape(g, -1, w.shape[1]).astype(np.float32)
                     * s[:, None, :] - w.reshape(g, -1, w.shape[1]))
        assert (err <= s[:, None, :] / 2 + 1e-7).all()


def test_int4_logits_exact_on_representable_weights():
    """Kernels snapped to int4 x power-of-two group scales survive int4
    quantization exactly -> logits equal the float model's."""
    import flax.traverse_util as tu
    model, variables, ids, px = _init_pair(seed=13)
    flat = dict(tu.flatten_dict(variables))
    s0 = np.float32(2.0 ** -5)
    for k in _lm_kernel_keys(variables):
        w = np.asarray(flat[k], np.float32)
        q0 = np.clip(np.rint(w / s0), -7, 7)
        g = w.shape[0] // 16 if w.shape[0] % 16 == 0 else 1
        q0 = q0.reshape(g, -1, w.shape[1])
        q0[:, 0, :] = 7.0           # pin each group's max -> scale
        flat[k] = jnp.asarray(q0.reshape(w.shape) * s0)
    variables = tu.unflatten_dict(flat)

    ref, _ = model.apply(variables, ids, pixel_values=px)

    qcfg = dataclasses.replace(TINY, quantized=True, quant_bits=4,
                               quant_group=16)
    qmodel = LlavaJax(qcfg)
    qvars = quantize_llava_variables(variables, bits=4, group=16)
    got, _ = qmodel.apply(qvars, ids, pixel_values=px)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_int4_generate_and_qlora():
    """int4 model drives greedy generate (scan/steps agree) and
    composes with LoRA (int4 base under 'base', float adapters)."""
    import flax.traverse_util as tu
    model, variables, ids, px = _init_pair(seed=17)
    qcfg = dataclasses.replace(TINY, quantized=True, quant_bits=4,
                               quant_group=16)
    qmodel = LlavaJax(qcfg)
    qvars = quantize_llava_variables(variables, bits=4, group=16)
    toks_a = greedy_generate_llava(qmodel, qvars, ids[:, :4],
                                   max_new_tokens=5, decode_mode="scan")
    toks_b = greedy_generate_llava(qmodel, qvars, ids[:, :4],
                                   max_new_tokens=5, decode_mode="steps")
    np.testing.assert_array_equal(np.asarray(toks_a), np.asarray(toks_b))

    lcfg = dataclasses.replace(TINY, lora_rank=2)
    _, lvars, _, _ = _init_pair(lcfg, seed=19)
    qlvars = quantize_llava_variables(lvars, bits=4, group=16)
    qlcfg = dataclasses.replace(lcfg, quantized=True, quant_bits=4,
                                quant_group=16)
    logits, _ = LlavaJax(qlcfg).apply(qlvars, ids, pixel_values=px)
    assert np.isfinite(np.asarray(logits)).all()
    flat = tu.flatten_dict(qlvars)
    assert ("params", "layer_0", "self_attn", "q_proj", "base",
            "kernel_q") in flat


def test_int4_partials_vs_dequant_formulations_agree():
    """QuantDense picks partial-dots (decode) vs dequant-matmul
    (prefill) by static token count; in f32 both compute
    x @ (Q * scale) exactly, so outputs match to fp tolerance."""
    from leafgrasp_tpu.vla.quant import QuantDense

    rng = np.random.default_rng(29)
    x = jnp.asarray(rng.normal(size=(300, 32)), jnp.float32)
    lay_a = QuantDense(24, dtype=jnp.float32, bits=4, group=16,
                       dequant_threshold=10**9)      # force partials
    lay_b = QuantDense(24, dtype=jnp.float32, bits=4, group=16,
                       dequant_threshold=0)          # force dequant
    v = lay_a.init(jax.random.PRNGKey(0), x)
    import flax.traverse_util as tu
    flat = tu.flatten_dict(v)
    kq = jnp.asarray(rng.integers(-7, 8, size=(32, 24)),
                     jnp.int8).astype(jnp.int4)
    ks = jnp.asarray(rng.uniform(0.01, 0.1, size=(2, 24)), jnp.float32)
    flat[("params", "kernel_q")] = kq
    flat[("params", "kernel_scale")] = ks
    v = tu.unflatten_dict(flat)
    ya = lay_a.apply(v, x)
    yb = lay_b.apply(v, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)


def test_int4_packed_storage_matches_native():
    """Nibble-packed int8 storage (for backends without S4) carries
    exactly the same quantized values as native int4: logits agree to
    fp-summation tolerance on both decode (partials) and prefill
    (dequant) formulations, and packed generate runs."""
    model, variables, ids, px = _init_pair(seed=31)
    nat = quantize_llava_variables(variables, bits=4, group=16)
    pk = quantize_llava_variables(variables, bits=4, group=16,
                                  packed=True)
    import flax.traverse_util as tu
    pq = tu.flatten_dict(pk)[("params", "layer_0", "self_attn",
                              "q_proj", "kernel_q")]
    assert pq.dtype == jnp.int8 and pq.shape[0] == TINY.hidden // 2

    ncfg = dataclasses.replace(TINY, quantized=True, quant_bits=4,
                               quant_group=16)
    pcfg = dataclasses.replace(ncfg, quant_packed=True)
    ref, _ = LlavaJax(ncfg).apply(nat, ids, pixel_values=px)
    got, _ = LlavaJax(pcfg).apply(pk, ids, pixel_values=px)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)

    toks = greedy_generate_llava(LlavaJax(pcfg), pk, ids[:, :4],
                                 max_new_tokens=4, decode_mode="steps")
    ref_toks = greedy_generate_llava(LlavaJax(ncfg), nat, ids[:, :4],
                                     max_new_tokens=4,
                                     decode_mode="steps")
    np.testing.assert_array_equal(np.asarray(toks), np.asarray(ref_toks))


def test_int4_packed_formulations_agree():
    """Packed storage: decode-partials and prefill-dequant paths agree
    (mirrors the native-formulation test, exercising the nibble unpack
    in both)."""
    from leafgrasp_tpu.vla.quant import QuantDense

    rng = np.random.default_rng(37)
    x = jnp.asarray(rng.normal(size=(300, 32)), jnp.float32)
    lay_a = QuantDense(24, dtype=jnp.float32, bits=4, group=16,
                       packed=True, dequant_threshold=10**9)
    lay_b = QuantDense(24, dtype=jnp.float32, bits=4, group=16,
                       packed=True, dequant_threshold=0)
    v = lay_a.init(jax.random.PRNGKey(0), x)
    import flax.traverse_util as tu
    flat = tu.flatten_dict(v)
    q = rng.integers(-7, 8, size=(32, 24)).astype(np.int64)
    p = ((q[0::2] & 0xF) | ((q[1::2] & 0xF) << 4)).astype(
        np.uint8).view(np.int8)
    flat[("params", "kernel_q")] = jnp.asarray(p)
    flat[("params", "kernel_scale")] = jnp.asarray(
        rng.uniform(0.01, 0.1, size=(2, 24)), jnp.float32)
    v = tu.unflatten_dict(flat)
    ya = lay_a.apply(v, x)
    yb = lay_b.apply(v, x)
    np.testing.assert_allclose(np.asarray(ya), np.asarray(yb),
                               rtol=1e-5, atol=1e-5)


def test_int4_tp_sharding():
    """int4 kernel_q and its (G, out) group scales both shard
    column-wise over the model axis."""
    import flax.traverse_util as tu
    from jax.sharding import Mesh, PartitionSpec as P
    from leafgrasp_tpu.parallel.sharding import infer_param_shardings

    _, variables, _, _ = _init_pair(seed=23)
    qvars = quantize_llava_variables(variables, bits=4, group=16)
    devs = np.array(jax.devices()[:8]).reshape(2, 4)
    mesh = Mesh(devs, ("data", "model"))
    sh = tu.flatten_dict(infer_param_shardings(qvars, mesh))
    qk = [p for p in sh if p[-1] == "kernel_q" and "gate_proj" in p][0]
    assert sh[qk].spec == P(None, "model")
    assert sh[qk[:-1] + ("kernel_scale",)].spec == P(None, "model")


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


def test_device_quantize_matches_host_and_consumes_box():
    """quantize_llava_variables_device matches the host path (scales to
    f32 ulps; codes within ONE unit on exact .5 boundaries -- XLA's
    reciprocal-multiply division, see the docstring) and empties its
    input box so the bf16 tree frees leaf-by-leaf (the 7B serving
    motivation: no 14 GB host round trip, no two trees resident)."""
    import flax.traverse_util as tu
    from leafgrasp_tpu.vla.quant import quantize_llava_variables_device

    _, variables, _, _ = _init_pair(seed=11)
    # inject a zero column to exercise the zero-scale guard
    flat = tu.flatten_dict(variables)
    k0 = _lm_kernel_keys(variables)[0]
    w = np.asarray(flat[k0]).copy()
    w[:, 0] = 0.0
    flat[k0] = jnp.asarray(w)
    variables = tu.unflatten_dict(flat)

    host = quantize_llava_variables(variables, bits=8)
    box = [variables]
    dev = quantize_llava_variables_device(box, bits=8)
    assert box == []                       # consumed
    hflat = tu.flatten_dict(host)
    dflat = tu.flatten_dict(dev)
    assert set(hflat) == set(dflat)
    n_off = n_codes = 0
    for k in hflat:
        a, b = np.asarray(hflat[k]), np.asarray(dflat[k])
        if k[-1] == "kernel_scale":
            np.testing.assert_allclose(a, b, rtol=1e-6, err_msg=str(k))
            assert b[0] == 1.0 if k[:-1] == k0[:-1] else True
        elif k[-1] == "kernel_q":
            d = np.abs(a.astype(np.int32) - b.astype(np.int32))
            assert d.max() <= 1, str(k)    # one code on .5 boundaries
            n_off += int((d > 0).sum())
            n_codes += d.size
        else:
            np.testing.assert_array_equal(a, b, err_msg=str(k))
    assert n_off <= max(2, n_codes // 500)  # rare boundary events only

    import pytest
    with pytest.raises(ValueError):
        quantize_llava_variables_device([dev], bits=4)
    with pytest.raises(ValueError):
        quantize_llava_variables_device(dev)  # not boxed
