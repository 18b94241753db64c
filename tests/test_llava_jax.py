"""Numerical parity of the JAX LLaVA stack vs transformers (tiny random
models on CPU): same architecture, converted weights, matching logits."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from leafgrasp_tpu.vla.llava_jax import (LlavaJax, config_from_hf,
                                         convert_hf_llava_state_dict,
                                         greedy_generate_llava)


@pytest.fixture(scope="module")
def tiny_pair():
    from transformers import (LlavaConfig, LlavaForConditionalGeneration,
                              CLIPVisionConfig, MistralConfig)
    vis = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=3, num_attention_heads=2,
                           image_size=28, patch_size=14)
    txt = MistralConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, vocab_size=128,
                        max_position_embeddings=128,
                        attention_dropout=0.0)
    hf_cfg = LlavaConfig(vision_config=vis, text_config=txt,
                         image_token_index=100, vision_feature_layer=-2,
                         vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()

    cfg = config_from_hf(hf_cfg)
    model = LlavaJax(cfg)
    variables = convert_hf_llava_state_dict(hf.state_dict(), cfg)
    return hf, model, variables, cfg


def test_config_from_hf(tiny_pair):
    _, _, _, cfg = tiny_pair
    assert cfg.num_patches == 4
    assert cfg.heads == 4 and cfg.kv_heads == 2
    assert cfg.image_token_index == 100


def test_logits_match_with_image(tiny_pair):
    hf, model, variables, cfg = tiny_pair
    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids = np.array([[1, 5, 100, 100, 100, 100, 7, 9]], np.int32)

    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 pixel_values=torch.tensor(px)).logits.numpy()

    ours, _ = model.apply(variables, ids,
                          pixel_values=px.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                               atol=2e-4)


def test_logits_match_text_only(tiny_pair):
    hf, model, variables, _ = tiny_pair
    ids = np.array([[1, 5, 7, 9, 11, 2]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits
    ours, _ = model.apply(variables, ids)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=2e-4,
                               atol=2e-4)


def test_greedy_generation_matches_hf(tiny_pair):
    hf, model, variables, _ = tiny_pair
    rng = np.random.default_rng(1)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids = np.array([[1, 5, 100, 100, 100, 100, 7]], np.int32)

    with torch.no_grad():
        ref = hf.generate(input_ids=torch.tensor(ids, dtype=torch.long),
                          pixel_values=torch.tensor(px),
                          max_new_tokens=6, do_sample=False)
    ref_new = ref[0, ids.shape[1]:].numpy()

    ours = greedy_generate_llava(model, variables, ids,
                                 pixel_values=px.transpose(0, 2, 3, 1),
                                 max_new_tokens=6)
    assert np.asarray(ours)[0].tolist() == ref_new.tolist()


def test_kv_cache_decode_equals_full_forward(tiny_pair):
    """Incremental decode must equal repeated full forwards."""
    import jax.numpy as jnp
    hf, model, variables, _ = tiny_pair
    ids = np.array([[1, 5, 7]], np.int32)
    cur = jnp.asarray(ids)
    expected = []
    for _ in range(4):
        logits, _ = model.apply(variables, cur)
        nxt = int(jnp.argmax(logits[0, -1]))
        expected.append(nxt)
        cur = jnp.concatenate([cur, jnp.asarray([[nxt]], jnp.int32)],
                              axis=1)
    gen = greedy_generate_llava(model, variables, jnp.asarray(ids),
                                max_new_tokens=4)
    assert np.asarray(gen)[0].tolist() == expected


def test_lora_rank_zero_delta_preserves_logits(tiny_pair):
    """LoRA-wrapped model with freshly attached adapters (b=0) must
    reproduce the base model's logits exactly."""
    import dataclasses
    import jax
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax,
                                             convert_hf_llava_state_dict,
                                             attach_lora)
    hf, base_model, base_vars, cfg = tiny_pair
    lcfg = dataclasses.replace(cfg, lora_rank=4, lora_alpha=8.0)
    lmodel = LlavaJax(lcfg)
    lvars = convert_hf_llava_state_dict(hf.state_dict(), lcfg)
    lvars = attach_lora(lmodel, lvars, jax.random.PRNGKey(0))

    ids = np.array([[1, 5, 7, 9]], np.int32)
    a, _ = base_model.apply(base_vars, ids)
    b, _ = lmodel.apply(lvars, ids)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6,
                               atol=1e-6)
    # and the LoRA mask finds trainable params
    from leafgrasp_tpu.vla.lora import lora_mask
    import jax as _j
    mask = lora_mask(lvars["params"])
    n_lora = sum(int(np.asarray(m).sum() > 0)
                 for m in _j.tree.leaves(mask))
    assert n_lora == 2 * 7 * lcfg.layers  # a+b per 7 targets per layer


class _StubTokenizer:
    """Byte-level stub with the tiny model's 128-vocab."""

    def encode(self, text):
        return [1] + [b % 90 + 2 for b in text.encode("utf-8")][:40]

    def decode(self, ids):
        return "0.5"   # parseable constant


def test_llava_scorer_end_to_end(tiny_pair):
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
    from leafgrasp_tpu.vla import VLAProcessor, HybridGraspSelector
    hf, model, variables, cfg = tiny_pair
    scorer = LlavaJaxScorer(model, variables, _StubTokenizer(),
                            max_new_tokens=4)
    cands = [dict(x=3, y=4, geometric_score=0.9),
             dict(x=9, y=2, geometric_score=0.4)]
    img = np.random.default_rng(0).random((40, 40, 3)).astype(np.float32)
    scores = scorer.score(img, cands, "pick")
    assert len(scores) == 2 and all(0 <= s <= 1 for s in scores)

    sel = HybridGraspSelector(VLAProcessor(scorer))
    best = sel.select_grasp_point(img, cands)
    assert best is not None and "strategy" in best


def test_preprocess_image():
    from leafgrasp_tpu.vla.llava_runtime import preprocess_image
    img = (np.random.default_rng(0).random((100, 80, 3)) * 255
           ).astype(np.uint8)
    out = preprocess_image(img, 28)
    assert out.shape == (1, 28, 28, 3)
    assert abs(float(out.mean())) < 3.0   # roughly CLIP-normalized


def test_llava_lora_fine_tune(tiny_pair, tmp_path):
    import dataclasses
    import jax
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax,
                                             convert_hf_llava_state_dict,
                                             attach_lora)
    from leafgrasp_tpu.vla.llava_trainer import LlavaLoRATrainer
    from leafgrasp_tpu.vla.trainer import make_synthetic_vla_dataset
    hf, _, _, cfg = tiny_pair
    lcfg = dataclasses.replace(cfg, lora_rank=4, lora_alpha=8.0)
    model = LlavaJax(lcfg)
    variables = attach_lora(
        model, convert_hf_llava_state_dict(hf.state_dict(), lcfg),
        jax.random.PRNGKey(0))

    class Tok:
        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode()][:60]

        def decode(self, ids):
            return "0.5"

    trainer = LlavaLoRATrainer(model, variables, Tok(),
                               learning_rate=1e-3, max_len=96)
    samples = make_synthetic_vla_dataset(2, seed=0, num_candidates=2,
                                         image_size=28)
    out = trainer.fine_tune(samples, epochs=2, batch_size=2)
    assert np.isfinite(out["final_loss"])
    assert out["final_loss"] < out["loss_history"][0] * 1.5
    # only LoRA leaves changed
    import flax.traverse_util as tu
    before = tu.flatten_dict(attach_lora(
        model, convert_hf_llava_state_dict(hf.state_dict(), lcfg),
        jax.random.PRNGKey(0))["params"])
    after = tu.flatten_dict(trainer.variables["params"])
    for k in before:
        changed = not np.allclose(np.asarray(before[k]),
                                  np.asarray(after[k]))
        is_lora = k[-1] in ("lora_a", "lora_b")
        if changed:
            assert is_lora, f"frozen weight changed: {k}"
    path = str(tmp_path / "llava_adapter.npz")
    trainer.save_adapter(path)
    trainer.load_adapter(path)
    metrics = trainer.evaluate(samples[:1])
    assert set(metrics) == {"top1_accuracy", "spearman"}


@pytest.fixture(scope="module")
def tiny_next_pair():
    from transformers import (LlavaNextConfig,
                              LlavaNextForConditionalGeneration,
                              CLIPVisionConfig, MistralConfig)
    vis = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=2, num_attention_heads=2,
                           image_size=28, patch_size=14)
    txt = MistralConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, vocab_size=128,
                        max_position_embeddings=512)
    hf_cfg = LlavaNextConfig(
        vision_config=vis, text_config=txt, image_token_index=100,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
        image_grid_pinpoints=[[28, 56], [56, 28], [56, 56]])
    torch.manual_seed(0)
    hf = LlavaNextForConditionalGeneration(hf_cfg).eval()
    from leafgrasp_tpu.vla.llava_jax import LlavaJax, config_from_hf, \
        convert_hf_llava_state_dict
    cfg = config_from_hf(hf_cfg)
    model = LlavaJax(cfg)
    variables = convert_hf_llava_state_dict(hf.state_dict(), cfg)
    return hf, model, variables, cfg


def test_llava_next_anyres_logits_parity(tiny_next_pair):
    """Full v1.6 anyres path: tile features packed with unpadding +
    newline must reproduce HF LlavaNext logits."""
    from leafgrasp_tpu.vla.llava_next import llava_next_forward
    hf, model, variables, cfg = tiny_next_pair
    rng = np.random.default_rng(0)
    px = rng.normal(size=(1, 5, 3, 28, 28)).astype(np.float32)
    image_sizes = [[40, 50]]
    with torch.no_grad():
        feats = hf.model.get_image_features(
            pixel_values=torch.tensor(px),
            image_sizes=torch.tensor(image_sizes),
            vision_feature_layer=-2,
            vision_feature_select_strategy="default")
    n = feats[0].shape[0]
    ids = np.array([[1, 5] + [100] * n + [7, 9]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 pixel_values=torch.tensor(px),
                 image_sizes=torch.tensor(image_sizes)).logits.numpy()
    tiles = px[0].transpose(0, 2, 3, 1)
    (ours, _), n2 = llava_next_forward(model, variables, ids, tiles,
                                       (40, 50),
                                       cfg.image_grid_pinpoints)
    assert n2 == n
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                               atol=2e-4)


def test_anyres_preprocess_and_generate(tiny_next_pair):
    from leafgrasp_tpu.vla.llava_next import (preprocess_anyres,
                                              llava_next_generate)
    _, model, variables, cfg = tiny_next_pair
    img = (np.random.default_rng(1).random((40, 50, 3)) * 255
           ).astype(np.uint8)
    tiles, hw = preprocess_anyres(img, cfg.image_grid_pinpoints, cfg)
    assert hw == (40, 50)
    assert tiles.shape[0] >= 2 and tiles.shape[1:] == (28, 28, 3)
    ids = np.array([[1, 5] + [100] * 24 + [7]], np.int32)
    gen = llava_next_generate(model, variables, ids, tiles, hw,
                              cfg.image_grid_pinpoints, max_new_tokens=4)
    assert np.asarray(gen).shape == (1, 4)


def test_pack_anyres_device_matches_host(tiny_next_pair):
    """pack_anyres_features_jnp (the on-device packer the serving
    scorer jits) must equal the host packer bit-for-bit at f32 on
    every pinpoint aspect class (row crop / col crop / square)."""
    from leafgrasp_tpu.vla.llava_next import (anyres_grid_shape,
                                              pack_anyres_features,
                                              pack_anyres_features_jnp)
    _, _, variables, cfg = tiny_next_pair
    rng = np.random.default_rng(7)
    newline = rng.normal(size=(cfg.hidden,)).astype(np.float32)
    pp = cfg.image_size // cfg.patch_size
    for hw in ((40, 50), (50, 40), (41, 41), (30, 90)):
        gw, gh = anyres_grid_shape(hw, cfg.image_grid_pinpoints,
                                   cfg.image_size)
        tf = rng.normal(size=(1 + gw * gh, pp * pp, cfg.hidden)
                        ).astype(np.float32)
        host = pack_anyres_features(tf, hw, cfg.image_grid_pinpoints,
                                    cfg, newline)
        dev = pack_anyres_features_jnp(jnp_asarray(tf), hw,
                                       cfg.image_grid_pinpoints, cfg,
                                       newline)
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_pack_plan_crop_matches_unpad_feature_grid(tiny_next_pair):
    """_pack_plan's static crop must equal the HF-anchored
    unpad_feature_grid slice on every pinpoint aspect class: both
    packers now sit on _pack_plan, so drift from the HF semantics
    would otherwise go undetected (ADVICE r4)."""
    from leafgrasp_tpu.vla.llava_next import (anyres_grid_shape,
                                              unpad_feature_grid,
                                              _pack_plan)
    _, _, _, cfg = tiny_next_pair
    pp = cfg.image_size // cfg.patch_size
    rng = np.random.default_rng(3)
    # wide / tall / square / extreme aspect + odd sizes (round paths)
    for hw in ((40, 50), (50, 40), (41, 41), (30, 90), (90, 30),
               (33, 47), (47, 33), (28, 28), (29, 57)):
        gw, gh = anyres_grid_shape(hw, cfg.image_grid_pinpoints,
                                   cfg.image_size)
        plan_pp, plan_gw, plan_gh, (r0, r1, c0, c1) = _pack_plan(
            hw, cfg.image_grid_pinpoints, cfg)
        assert (plan_pp, plan_gw, plan_gh) == (pp, gw, gh)
        grid = rng.normal(size=(gh * pp, gw * pp, 3)).astype(np.float32)
        np.testing.assert_array_equal(grid[r0:r1, c0:c1],
                                      unpad_feature_grid(grid, hw))


def test_device_clip_normalize_bit_equals_host(tiny_next_pair):
    """The serving scorer ships uint8 tiles and normalizes on device
    (1/4 the wire bytes); that path must be BIT-equal to the host
    preprocess_anyres(normalize=True) tiles."""
    from leafgrasp_tpu.vla.llava_next import (preprocess_anyres,
                                              clip_normalize_jnp)
    _, _, _, cfg = tiny_next_pair
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, (45, 60, 3), dtype=np.uint8)
    host, hw = preprocess_anyres(img, cfg.image_grid_pinpoints, cfg)
    raw, hw2 = preprocess_anyres(img, cfg.image_grid_pinpoints, cfg,
                                 normalize=False)
    assert hw == hw2 and raw.dtype == np.uint8
    dev = np.asarray(clip_normalize_jnp(jnp_asarray(raw)))
    np.testing.assert_array_equal(dev, host.astype(np.float32))


def jnp_asarray(x):
    import jax.numpy as jnp
    return jnp.asarray(x)


def test_scorer_anyres_matches_sequential_next_path():
    """LlavaJaxScorer(anyres=True) batched rerank generates the same
    tokens as per-candidate llava_next_generate (the serving wiring of
    the parity-tested v1.6 path; reference llava_processor.py:18-46
    runs this model family through transformers)."""
    import jax
    from leafgrasp_tpu.vla.llava_jax import LlavaJax, LlavaJaxConfig
    from leafgrasp_tpu.vla.llava_next import (preprocess_anyres,
                                              llava_next_generate)
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
    from leafgrasp_tpu.vla.processor import build_prompt

    cfg = LlavaJaxConfig(
        vis_hidden=16, vis_intermediate=32, vis_layers=1, vis_heads=2,
        image_size=28, patch_size=14, vocab_size=128, hidden=16,
        intermediate=32, layers=2, heads=2, kv_heads=1,
        image_token_index=100,
        image_grid_pinpoints=((28, 56), (56, 28), (56, 56)))
    model = LlavaJax(cfg)
    ids0 = np.array([[1, 100, 100, 100, 100, 2]], np.int32)
    px0 = np.zeros((1, 28, 28, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(0), ids0, pixel_values=px0)
    variables["params"]["image_newline"] = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (cfg.hidden,)))

    class Tok:
        """decode() encodes the generated ids into the parsed float so
        score equality <=> token-level equality."""

        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode()][:40]

        def decode(self, ids):
            return "0." + "".join(str(int(i) % 10) for i in ids)

    tok = Tok()
    img = (np.random.default_rng(3).random((40, 50, 3)) * 255
           ).astype(np.uint8)
    cands = [dict(x=3, y=4, geometric_score=0.9),
             dict(x=9, y=2, geometric_score=0.4),
             dict(x=1, y=8, geometric_score=0.6)]

    scorer = LlavaJaxScorer(model, variables, tok, max_new_tokens=4,
                            anyres=True)
    batched = scorer.score(img, cands, "pick")

    tiles, hw = preprocess_anyres(img, cfg.image_grid_pinpoints, cfg)
    _, n_img = scorer._encode_image(img)
    assert n_img > cfg.num_patches     # anyres packs MORE than one tile
    seq = []
    from leafgrasp_tpu.vla.processor import parse_score
    for c in cands:
        row = [cfg.image_token_index] * n_img \
            + list(tok.encode(build_prompt(c, "pick")))
        gen = llava_next_generate(model, variables,
                                  np.asarray([row], np.int32), tiles, hw,
                                  cfg.image_grid_pinpoints,
                                  max_new_tokens=4)
        seq.append(parse_score(tok.decode(np.asarray(gen)[0].tolist())))
    assert batched == seq

    # missing newline param / pinpoints fail loudly at construction
    import pytest as _pytest
    bad = {"params": {k: v for k, v in variables["params"].items()
                      if k != "image_newline"}}
    with _pytest.raises(ValueError, match="image_newline"):
        LlavaJaxScorer(model, bad, tok, anyres=True)


def test_anyres_preprocess_byte_parity_with_hf_processor():
    from transformers import LlavaNextImageProcessor
    from PIL import Image
    from leafgrasp_tpu.vla.llava_jax import LlavaJaxConfig
    from leafgrasp_tpu.vla.llava_next import preprocess_anyres
    proc = LlavaNextImageProcessor(
        size={"shortest_edge": 28}, crop_size={"height": 28, "width": 28},
        image_grid_pinpoints=[[28, 56], [56, 28], [56, 56]],
        do_center_crop=True)
    cfg = LlavaJaxConfig(image_size=28, patch_size=14,
                         image_grid_pinpoints=((28, 56), (56, 28),
                                               (56, 56)))
    for seed, shape in ((1, (40, 50)), (2, (70, 30)), (3, (28, 28)),
                        (4, (90, 90))):
        img = (np.random.default_rng(seed).random(shape + (3,))
               * 255).astype(np.uint8)
        out = proc(images=Image.fromarray(img), return_tensors="np")
        hf_tiles = out.pixel_values[0].transpose(0, 2, 3, 1)
        tiles, _ = preprocess_anyres(img, cfg.image_grid_pinpoints, cfg)
        assert tiles.shape == hf_tiles.shape
        np.testing.assert_allclose(tiles, hf_tiles, atol=1e-6)


def test_sliding_window_attention_parity():
    """Mistral sliding-window (local) attention matches HF's
    kv > q - window convention (tolerance reflects f32 accumulation
    under sharp local attention)."""
    from transformers import (LlavaConfig, LlavaForConditionalGeneration,
                              CLIPVisionConfig, MistralConfig)
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax, config_from_hf,
                                             convert_hf_llava_state_dict)
    vis = CLIPVisionConfig(hidden_size=32, intermediate_size=64,
                           num_hidden_layers=1, num_attention_heads=2,
                           image_size=28, patch_size=14)
    txt = MistralConfig(hidden_size=32, intermediate_size=64,
                        num_hidden_layers=2, num_attention_heads=4,
                        num_key_value_heads=2, vocab_size=128,
                        max_position_embeddings=128, sliding_window=3,
                        attn_implementation="eager")
    hf_cfg = LlavaConfig(vision_config=vis, text_config=txt,
                         image_token_index=100, vision_feature_layer=-2,
                         vision_feature_select_strategy="default")
    torch.manual_seed(0)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()
    cfg = config_from_hf(hf_cfg)
    assert cfg.sliding_window == 3
    model = LlavaJax(cfg)
    variables = convert_hf_llava_state_dict(hf.state_dict(), cfg)
    ids = np.array([[1, 5, 7, 9, 11, 2, 8, 6]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long)).logits
    ours, _ = model.apply(variables, ids)
    np.testing.assert_allclose(np.asarray(ours), ref.numpy(), rtol=5e-3,
                               atol=3e-3)


def test_prefill_attn_chunking_parity(tiny_pair):
    """Query-chunked prefill attention (the memory fix that lets the
    B=5 anyres prefill fit next to the weights) must reproduce the
    unchunked logits, including an uneven final chunk, left padding,
    and the generate path."""
    import dataclasses
    import jax.numpy as jnp
    _, model, variables, cfg = tiny_pair
    rng = np.random.default_rng(4)
    px = rng.normal(size=(2, 28, 28, 3)).astype(np.float32)
    ids = np.array([[1, 100, 100, 100, 100, 5, 9, 12, 7, 3],
                    [0, 0, 1, 100, 100, 100, 100, 8, 3, 6]], np.int32)
    pad = np.array([0, 2], np.int32)
    positions = np.maximum(np.arange(ids.shape[1])[None, :]
                           - pad[:, None], 0)
    t = ids.shape[1]
    mask = np.tril(np.ones((t, t), bool))[None, None] \
        & (np.arange(t)[None, None, None, :] >= pad[:, None, None, None])

    base, _ = model.apply(variables, ids, pixel_values=px,
                          positions=positions, mask=mask)
    for chunk in (4, 3, 1):               # uneven + degenerate sizes
        m_c = LlavaJax(dataclasses.replace(cfg,
                                           prefill_attn_chunk=chunk))
        ours, _ = m_c.apply(variables, ids, pixel_values=px,
                            positions=positions, mask=mask)
        np.testing.assert_allclose(np.asarray(ours), np.asarray(base),
                                   rtol=1e-5, atol=1e-5)

    gen_base = greedy_generate_llava(model, variables,
                                     jnp.asarray(ids),
                                     pixel_values=jnp.asarray(px),
                                     max_new_tokens=4,
                                     pad_lens=jnp.asarray(pad))
    m_c = LlavaJax(dataclasses.replace(cfg, prefill_attn_chunk=4))
    gen_c = greedy_generate_llava(m_c, variables, jnp.asarray(ids),
                                  pixel_values=jnp.asarray(px),
                                  max_new_tokens=4,
                                  pad_lens=jnp.asarray(pad))
    np.testing.assert_array_equal(np.asarray(gen_c),
                                  np.asarray(gen_base))


def test_bf16_compute_dtype(tiny_pair):
    """bf16 compute path runs and agrees with f32 on the greedy argmax
    (serving dtype for the 7B on a 16 GB chip)."""
    import dataclasses
    from leafgrasp_tpu.vla.llava_jax import LlavaJax
    hf, model, variables, cfg = tiny_pair
    bcfg = dataclasses.replace(cfg, dtype="bfloat16")
    bmodel = LlavaJax(bcfg)
    ids = np.array([[1, 5, 100, 100, 100, 100, 7, 9]], np.int32)
    px = np.random.default_rng(0).normal(
        size=(1, 28, 28, 3)).astype(np.float32)
    a, _ = model.apply(variables, ids, pixel_values=px)
    b, _ = bmodel.apply(variables, ids, pixel_values=px)
    assert np.asarray(b).dtype == np.float32   # logits upcast
    agree = (np.argmax(np.asarray(a), -1)
             == np.argmax(np.asarray(b), -1)).mean()
    assert agree >= 0.8


def test_bf16_generate_runs(tiny_pair):
    """greedy_generate_llava must work in the bf16 compute dtype (the KV
    caches must be allocated in the compute dtype; regression for the
    f32-cache/bf16-update dtype crash found by the VLA bench)."""
    import dataclasses
    import jax.numpy as jnp
    _, model, variables, cfg = tiny_pair
    bcfg = dataclasses.replace(cfg, dtype="bfloat16")
    bmodel = LlavaJax(bcfg)
    ids = np.array([[1, 5, 7]], np.int32)
    gen = greedy_generate_llava(bmodel, variables, jnp.asarray(ids),
                                max_new_tokens=4)
    out = np.asarray(gen)
    assert out.shape == (1, 4)
    # bf16 logits may legitimately diverge from f32 argmax on near-ties;
    # just require valid token ids
    assert (out >= 0).all() and (out < bcfg.vocab_size).all()


def test_padded_batch_generate_equals_sequential(tiny_pair):
    """Left-pad-batched generation must reproduce each row's solo
    greedy decode exactly (positions pad-relative, pad keys masked)."""
    import jax.numpy as jnp
    _, model, variables, cfg = tiny_pair
    rng = np.random.default_rng(3)
    px = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    rows = [[1, 100, 100, 100, 100, 5, 9, 12, 7],
            [1, 100, 100, 100, 100, 8, 3],
            [1, 100, 100, 100, 100, 22, 17, 30, 41, 6]]
    solo = []
    for r in rows:
        g = greedy_generate_llava(
            model, variables, jnp.asarray([r], jnp.int32),
            pixel_values=jnp.asarray(px), max_new_tokens=5)
        solo.append(np.asarray(g)[0])
    t = max(len(r) for r in rows)
    ids = np.zeros((len(rows), t), np.int32)
    pad = np.zeros((len(rows),), np.int32)
    for i, r in enumerate(rows):
        pad[i] = t - len(r)
        ids[i, pad[i]:] = r
    batched = greedy_generate_llava(
        model, variables, jnp.asarray(ids),
        pixel_values=jnp.asarray(np.repeat(px, len(rows), axis=0)),
        max_new_tokens=5, pad_lens=jnp.asarray(pad))
    np.testing.assert_array_equal(np.asarray(batched), np.stack(solo))


def test_scorer_batched_matches_sequential(tiny_pair):
    """LlavaJaxScorer's one-pass batched scoring must return the same
    decoded scores as candidate-at-a-time generation."""
    import jax.numpy as jnp
    from leafgrasp_tpu.vla.llava_runtime import (LlavaJaxScorer,
                                                 preprocess_image)

    class _VarTok:
        """Variable-length prompts + token-dependent decode so a
        batching bug actually changes the output."""

        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode("utf-8")
                          ][:len(text) % 13 + 4]

        def decode(self, ids):
            return f"0.{abs(sum(ids)) % 100:02d}"

    _, model, variables, cfg = tiny_pair
    tok = _VarTok()
    scorer = LlavaJaxScorer(model, variables, tok, max_new_tokens=4)
    cands = [dict(x=3, y=4, geometric_score=0.9),
             dict(x=91, y=200, geometric_score=0.41),
             dict(x=7, y=7, geometric_score=0.77)]
    img = np.random.default_rng(1).random((50, 60, 3)).astype(np.float32)
    batched = scorer.score(img, cands, "pick the best leaf")

    from leafgrasp_tpu.vla.processor import build_prompt, parse_score
    px = jnp.asarray(preprocess_image(img, cfg.image_size))
    seq = []
    for c in cands:
        ids = scorer._encode(build_prompt(c, "pick the best leaf"),
                             cfg.num_patches)
        g = greedy_generate_llava(model, variables,
                                  jnp.asarray([ids], jnp.int32),
                                  pixel_values=px, max_new_tokens=4)
        seq.append(parse_score(tok.decode(np.asarray(g)[0].tolist())))
    assert batched == seq


def test_scorer_max_batch_subbatching(tiny_pair):
    """max_batch=2 must split 3 candidates into 2+1 generates with the
    same scores as the all-at-once batch."""
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer

    class _Tok:
        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode()][:9]

        def decode(self, ids):
            return f"0.{abs(sum(ids)) % 100:02d}"

    _, model, variables, cfg = tiny_pair
    cands = [dict(x=i, y=i * 2, geometric_score=0.5 + 0.1 * i)
             for i in range(3)]
    img = np.random.default_rng(2).random((30, 30, 3)).astype(np.float32)
    full = LlavaJaxScorer(model, variables, _Tok(),
                          max_new_tokens=3).score(img, cands, "go")
    sub = LlavaJaxScorer(model, variables, _Tok(), max_new_tokens=3,
                         max_batch=2).score(img, cands, "go")
    assert full == sub


def test_decode_mode_steps_equals_scan(tiny_pair):
    """Per-step decode programs must emit the same tokens as the fused
    scan (same caches, masks, positions)."""
    import jax.numpy as jnp
    _, model, variables, cfg = tiny_pair
    ids = jnp.asarray([[1, 5, 7, 9], [0, 1, 8, 3]], jnp.int32)
    pads = jnp.asarray([0, 1], jnp.int32)
    a = greedy_generate_llava(model, variables, ids, max_new_tokens=5,
                              pad_lens=pads, decode_mode="scan")
    b = greedy_generate_llava(model, variables, ids, max_new_tokens=5,
                              pad_lens=pads, decode_mode="steps")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_prepare_decode_layout_matches_default(tiny_pair):
    """The decode-format-compiled step program (AUTO weight layouts,
    weights relayouted into its preference) must emit exactly the
    tokens the default path does; on CPU the chosen layouts are
    trivially default but the full compile/relayout/call mechanism is
    exercised."""
    import jax.numpy as jnp
    from leafgrasp_tpu.vla.llava_jax import prepare_decode_layout
    _, model, variables, cfg = tiny_pair
    ids = jnp.asarray([[1, 5, 7, 9], [0, 1, 8, 3]], jnp.int32)
    pads = jnp.asarray([0, 1], jnp.int32)
    ref = greedy_generate_llava(model, variables, ids, max_new_tokens=5,
                                pad_lens=pads, decode_mode="steps")

    box = [variables]
    vars_opt, step_call, n = prepare_decode_layout(
        model, box, batch=2, prompt_len=4, max_new_tokens=5)
    assert box == []          # ownership consumed
    assert n >= 0
    out = greedy_generate_llava(model, vars_opt, ids, max_new_tokens=5,
                                pad_lens=pads, decode_mode="steps",
                                decode_step_call=step_call)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))


def test_scorer_auto_decode_layout(tiny_pair):
    """decode_weight_layout='auto' + steps mode scores identically to
    the default scorer (prepared call is compiled once per shape)."""
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer

    class _Tok:
        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode()][:9]

        def decode(self, ids):
            return f"0.{abs(sum(ids)) % 100:02d}"

    _, model, variables, cfg = tiny_pair
    cands = [dict(x=i, y=i * 3, geometric_score=0.4 + 0.1 * i)
             for i in range(3)]
    img = np.random.default_rng(5).random((40, 40, 3)).astype(np.float32)
    base = LlavaJaxScorer(model, variables, _Tok(), max_new_tokens=3,
                          decode_mode="steps").score(img, cands, "go")
    auto = LlavaJaxScorer(model, variables, _Tok(), max_new_tokens=3,
                          decode_mode="steps",
                          decode_weight_layout="auto")
    got = auto.score(img, cands, "go")
    assert got == base
    assert (auto.decode_weight_layout == "default"   # graceful fallback
            or len(auto._decode_calls) == 1)
    # second frame, same shape: reuses the prepared program
    assert auto.score(img, cands, "go") == base


def test_llava_full_param_pretrain(tiny_pair):
    """train_full=True updates base weights (the pretraining mode that
    gives LoRA a base with skill to steer); loss decreases and non-LoRA
    leaves move."""
    import jax
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax,
                                             convert_hf_llava_state_dict)
    from leafgrasp_tpu.vla.llava_trainer import LlavaLoRATrainer
    from leafgrasp_tpu.vla.trainer import make_synthetic_vla_dataset
    import flax.traverse_util as tu
    hf, _, _, cfg = tiny_pair
    model = LlavaJax(cfg)
    variables = {"params": convert_hf_llava_state_dict(
        hf.state_dict(), cfg)["params"]}

    class Tok:
        def encode(self, text):
            return [1] + [b % 90 + 2 for b in text.encode()][:60]

        def decode(self, ids):
            return "0.5"

    before = tu.flatten_dict(jax.tree.map(np.asarray, variables["params"]))
    trainer = LlavaLoRATrainer(model, variables, Tok(),
                               learning_rate=1e-3, max_len=96,
                               train_full=True)
    samples = make_synthetic_vla_dataset(2, seed=0, num_candidates=2,
                                         image_size=28)
    out = trainer.fine_tune(samples, epochs=3, batch_size=2)
    assert np.isfinite(out["final_loss"])
    assert out["final_loss"] < out["loss_history"][0]
    after = tu.flatten_dict(trainer.variables["params"])
    moved = sum(not np.allclose(before[k], np.asarray(after[k]))
                for k in before)
    assert moved > len(before) // 2, "full-param mode left weights frozen"
