"""VLA subsystem tests: confidence, hybrid ladder, processor contract,
TinyVLA generation, LoRA fine-tuning."""

import numpy as np
import pytest

from leafgrasp_tpu.vla import (
    HybridGraspSelector, HybridSelector, confidence_weights,
    selection_strategy, ConfidenceManager, calculate_confidence,
    VLAProcessor, StubScorer, HeuristicScorer, TinyVLAScorer,
    build_prompt, parse_score, VLATrainer, make_synthetic_vla_dataset,
    spearman_correlation, VLAModelConfig, ByteTokenizer, init_vla,
    greedy_generate)


# ----------------------------------------------------------- confidence --

def test_confidence_reference_formula():
    vla = [0.9, 0.2, 0.6]
    geo = [0.8, 0.1, 0.5]  # same ordering -> high consistency
    c = calculate_confidence(vla, geo)
    assert 0.0 <= c <= 1.0
    # perfectly anti-correlated should score lower
    c_anti = calculate_confidence(vla, [0.1, 0.9, 0.5])
    assert c > c_anti


def test_confidence_reference_literal():
    """Literal transcription of confidence_manager.py:11-64."""
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = rng.random(5)
        g = rng.random(5)
        vn = (v - v.min()) / (v.max() - v.min() + 1e-6)
        gn = (g - g.min()) / (g.max() - g.min() + 1e-6)
        corr = np.corrcoef(vn, gn)[0, 1]
        cons = 0.5 if np.isnan(corr) else (corr + 1) / 2
        var = np.clip(np.var(v) / (np.mean(v) + 1e-6), 0, 1)
        mag = np.clip(v.max() * (1 + (v.max() - v.min()) / 2), 0, 1)
        expected = np.clip(0.4 * cons + 0.3 * (1 - var) + 0.3 * mag, 0, 1)
        np.testing.assert_allclose(calculate_confidence(list(v), list(g)),
                                   expected, rtol=1e-9)


def test_confidence_manager_history():
    m = ConfidenceManager()
    for _ in range(12):
        m.calculate_confidence([0.5, 0.6], [0.5, 0.6])
    assert len(m.confidence_history) == 10
    assert m.is_stable()
    assert 0 <= m.get_running_confidence() <= 1


def test_empty_scores_confidence_zero():
    assert calculate_confidence([], []) == 0.0


# --------------------------------------------------------------- hybrid --

@pytest.mark.parametrize("conf,expected_w,expected_s", [
    (0.9, 0.6, "VLA_DOMINANT"),
    (0.6, 0.3, "BALANCED"),
    (0.3, 0.1, "GEOMETRIC_DOMINANT"),
    (0.1, 0.0, "GEOMETRIC_ONLY"),
])
def test_weight_ladder(conf, expected_w, expected_s):
    w = confidence_weights(conf)
    assert w["vla"] == expected_w
    assert w["geometric"] == 1.0 - expected_w
    assert selection_strategy(conf) == expected_s


def test_hybrid_selector_matches_reference_blend():
    cands = [dict(x=1, y=1), dict(x=2, y=2), dict(x=3, y=3)]
    geo = [0.9, 0.5, 0.1]
    vla = [0.1, 0.5, 0.9]
    # high confidence: 0.6 VLA weight; normalized scores blend
    out = HybridSelector().select_best_candidate(cands, geo, vla, 0.9)
    gn = (np.array(geo) - 0.1) / 0.8
    vn = (np.array(vla) - 0.1) / 0.8
    hybrid = 0.4 * gn + 0.6 * vn
    assert out["x"] == cands[int(np.argmax(hybrid))]["x"]
    np.testing.assert_allclose(out["hybrid_score"], hybrid.max())
    # zero confidence: pure geometric argmax
    out = HybridSelector().select_best_candidate(cands, geo, vla, 0.0)
    assert out["x"] == 1


def test_hybrid_grasp_selector_public_api_graceful_degradation():
    cands = [dict(x=10, y=10, geometric_score=0.9),
             dict(x=20, y=20, geometric_score=0.4)]
    # no processor at all -> geometric argmax, strategy GEOMETRIC_ONLY...
    sel = HybridGraspSelector(vla_processor=None)
    out = sel.select_grasp_point(None, cands)
    assert out["x"] == 10
    # exploding processor -> same degradation path
    class Boom:
        def evaluate_candidates(self, *a, **k):
            raise RuntimeError("model load failed")
    out = HybridGraspSelector(vla_processor=Boom()).select_grasp_point(
        None, cands)
    assert out["x"] == 10
    assert out["strategy"] in ("GEOMETRIC_ONLY", "GEOMETRIC_DOMINANT",
                               "BALANCED", "VLA_DOMINANT")


def test_hybrid_grasp_selector_empty():
    assert HybridGraspSelector().select_grasp_point(None, []) is None


# ------------------------------------------------------------ processor --

def test_prompt_contains_candidate_fields():
    p = build_prompt(dict(x=42, y=99, geometric_score=0.77,
                          clutter_score=0.3, distance_score=0.4), "task t")
    assert "(42, 99)" in p and "0.770" in p and "task t" in p
    assert p.endswith("<|im_start|>assistant\n")


@pytest.mark.parametrize("text,expected", [
    ("0.7", 0.7), (" 0.25 \n", 0.25), ("1.7", 1.0), ("-3", 0.0),
    ("not a number", 0.5), ("", 0.5),
])
def test_parse_score(text, expected):
    assert parse_score(text) == expected


def test_stub_processor_contract():
    proc = VLAProcessor(StubScorer())
    scores = proc.evaluate_candidates(None, [dict(x=1), dict(x=2)])
    assert scores == [0.5, 0.5]   # constant -> normalized to 0.5s
    assert proc.evaluate_candidates(None, []) == []


def test_heuristic_processor_ranks_geometrically():
    cands = [dict(geometric_score=0.9, clutter_score=0.9,
                  distance_score=0.9),
             dict(geometric_score=0.1, clutter_score=0.1,
                  distance_score=0.1)]
    scores = VLAProcessor(HeuristicScorer()).evaluate_candidates(None,
                                                                 cands)
    assert scores[0] > scores[1]


def test_processor_exception_degrades():
    class Boom:
        def score(self, *a):
            raise RuntimeError
    scores = VLAProcessor(Boom()).evaluate_candidates(None,
                                                      [dict(), dict()])
    assert scores == [0.5, 0.5]


# ----------------------------------------------------------- tokenizer --

def test_byte_tokenizer_roundtrip():
    t = ByteTokenizer()
    ids = t.encode("grasp leaf 0.75")
    assert ids[0] == t.bos
    assert t.decode(ids[1:]) == "grasp leaf 0.75"


# -------------------------------------------------------------- tiny LM --

TINY = VLAModelConfig(dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                      mlp_hidden=64, vision_tokens=2, vision_patch=16,
                      max_seq=128)


def test_tiny_vla_forward_and_generate():
    import jax
    import jax.numpy as jnp
    model, variables = init_vla(jax.random.PRNGKey(0), TINY)
    toks = jnp.asarray(ByteTokenizer().encode("rate: "))[None]
    img = jnp.zeros((1, 16, 16, 3), jnp.float32)
    logits, _ = model.apply(variables, toks, image=img)
    assert logits.shape == (1, toks.shape[1] + TINY.vision_tokens,
                            TINY.vocab_size)
    gen = greedy_generate(model, variables, toks, image=img,
                          max_new_tokens=6)
    assert gen.shape == (1, 6)
    assert np.asarray(gen).dtype == np.int32


def test_generate_cache_matches_full_forward():
    """Incremental decode with KV cache must equal repeated full
    forwards (greedy argmax chain)."""
    import jax
    import jax.numpy as jnp
    model, variables = init_vla(jax.random.PRNGKey(1), TINY)
    toks = ByteTokenizer().encode("x = ")
    cur = jnp.asarray(toks)[None]
    expected = []
    for _ in range(4):
        logits, _ = model.apply(variables, cur)
        nxt = int(jnp.argmax(logits[0, -1]))
        expected.append(nxt)
        cur = jnp.concatenate([cur, jnp.asarray([[nxt]], jnp.int32)],
                              axis=1)
    gen = greedy_generate(model, variables, jnp.asarray(toks)[None],
                          max_new_tokens=4)
    assert np.asarray(gen)[0].tolist() == expected


def test_tiny_vla_scorer_end_to_end():
    scorer = TinyVLAScorer(cfg=TINY)
    cands = [dict(x=1, y=2, geometric_score=0.5), dict(x=3, y=4)]
    img = np.random.default_rng(0).random((32, 32, 3)).astype(np.float32)
    scores = scorer.score(img, cands, "pick")
    assert len(scores) == 2
    assert all(0.0 <= s <= 1.0 for s in scores)


# ------------------------------------------------------------- trainer --

def test_lora_mask_and_params():
    import jax
    cfg = VLAModelConfig(dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                         mlp_hidden=64, vision_tokens=2, vision_patch=16,
                         lora_rank=4)
    _, variables = init_vla(jax.random.PRNGKey(0), cfg)
    from leafgrasp_tpu.vla.lora import lora_mask, extract_lora_params
    mask = lora_mask(variables["params"])
    import jax as _j
    n_trainable = sum(int(np.asarray(m).sum() > 0) * l.size
                      for m, l in zip(_j.tree.leaves(mask),
                                      _j.tree.leaves(variables["params"])))
    n_total = sum(l.size for l in _j.tree.leaves(variables["params"]))
    assert 0 < n_trainable < n_total
    lora = extract_lora_params(variables["params"])
    leaves = _j.tree.leaves(lora)
    assert leaves and all(l.ndim == 2 for l in leaves)


def test_vla_fine_tune_reduces_loss(tmp_path):
    cfg = VLAModelConfig(dim=32, n_layers=1, n_heads=2, n_kv_heads=1,
                         mlp_hidden=64, vision_tokens=2, vision_patch=16,
                         lora_rank=4, lora_alpha=8.0, max_seq=600)
    trainer = VLATrainer(cfg=cfg, learning_rate=3e-3)
    samples = make_synthetic_vla_dataset(4, seed=1, num_candidates=3,
                                         image_size=16)
    out = trainer.fine_tune(samples, epochs=3, batch_size=4)
    assert np.isfinite(out["final_loss"])
    assert out["final_loss"] < out["loss_history"][0]

    # adapter roundtrip
    path = str(tmp_path / "adapter.npz")
    trainer.save_adapter(path)
    import os
    assert os.path.exists(path)
    assert os.path.exists(path + ".adapter_config.json")
    before = trainer.variables["params"]
    trainer.load_adapter(path)
    import jax
    for a, b in zip(jax.tree.leaves(before),
                    jax.tree.leaves(trainer.variables["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_synthetic_dataset_and_spearman():
    samples = make_synthetic_vla_dataset(3, seed=0)
    assert len(samples) == 3
    s = samples[0]
    assert len(s["candidates"]) == 5
    assert sorted(s["ranking"]) == [0, 1, 2, 3, 4]
    gt = [c["geometric_score"] for c in s["candidates"]]
    assert s["ranking"][0] == int(np.argmax(gt))
    assert spearman_correlation([1, 2, 3], [1, 2, 3]) == 1.0
    assert spearman_correlation([1, 2, 3], [3, 2, 1]) == -1.0


def test_graft_base_params_roundtrip():
    """Pretrained plain params must land in every frozen-base slot of a
    LoRA-wrapped tree, with fresh adapters preserved."""
    import jax
    import numpy as np
    from leafgrasp_tpu.vla.lm import VLAModelConfig, init_vla
    from leafgrasp_tpu.vla.lora import graft_base_params, lora_mask
    plain_cfg = VLAModelConfig(dim=32, n_layers=1, n_heads=2,
                               n_kv_heads=1, mlp_hidden=64,
                               vision_tokens=2, vision_patch=16)
    import dataclasses
    lora_cfg = dataclasses.replace(plain_cfg, lora_rank=4)
    _, plain = init_vla(jax.random.PRNGKey(0), plain_cfg)
    _, lora = init_vla(jax.random.PRNGKey(1), lora_cfg)
    grafted = graft_base_params(lora["params"], plain["params"])
    import flax.traverse_util as tu
    flat_g = dict(tu.flatten_dict(grafted))
    flat_p = dict(tu.flatten_dict(plain["params"]))
    flat_l = dict(tu.flatten_dict(lora["params"]))
    n_base = n_lora = 0
    for k, v in flat_g.items():
        if k[-1] in ("lora_a", "lora_b"):
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat_l[k]))
            n_lora += 1
        else:
            pk = k if k in flat_p else tuple(p for p in k if p != "base")
            np.testing.assert_array_equal(np.asarray(v),
                                          np.asarray(flat_p[pk]))
            n_base += 1
    assert n_lora > 0 and n_base > 0
