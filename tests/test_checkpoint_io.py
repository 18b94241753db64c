"""Self-contained checkpoint IO: safetensors + sentencepiece readers and
the zero-transformers LLaVA load path (checkpoint dir -> scorer), cross
-checked against the transformers/torch pipeline it replaces
(reference vla_system/llava_processor.py:18-51)."""

import json
import os
import sys

import numpy as np
import pytest

from leafgrasp_tpu.vla.checkpoint_io import (
    DictConfig, SentencePieceTokenizer, load_llava_checkpoint,
    read_safetensors, write_safetensors, write_sentencepiece_model)


# ------------------------------------------------------- safetensors --

def test_safetensors_roundtrip_vs_reference_lib(tmp_path):
    import ml_dtypes
    rng = np.random.default_rng(0)
    tensors = {
        "a.weight": rng.normal(size=(3, 5)).astype(np.float32),
        "b.bias": rng.normal(size=(7,)).astype(np.float16),
        "c.int": rng.integers(0, 100, size=(2, 2)).astype(np.int64),
        "d.bf16": rng.normal(size=(4, 3)).astype(ml_dtypes.bfloat16),
        "e.bool": np.array([True, False]),
    }
    p = str(tmp_path / "m.safetensors")
    write_safetensors(p, tensors, metadata={"format": "np"})

    back = read_safetensors(p)
    for k, v in tensors.items():
        assert back[k].dtype == v.dtype
        np.testing.assert_array_equal(np.asarray(back[k], np.float64),
                                      np.asarray(v, np.float64))

    # cross-check with the reference safetensors implementation
    st = pytest.importorskip("safetensors.numpy")
    lib = st.load_file(p)
    for k in ("a.weight", "b.bias", "c.int", "e.bool"):
        np.testing.assert_array_equal(lib[k], tensors[k])

    p2 = str(tmp_path / "lib.safetensors")
    st.save_file({k: tensors[k] for k in ("a.weight", "c.int")}, p2)
    ours = read_safetensors(p2)
    np.testing.assert_array_equal(ours["a.weight"], tensors["a.weight"])
    np.testing.assert_array_equal(ours["c.int"], tensors["c.int"])


# ------------------------------------------------------ sentencepiece --

def _byte_pieces():
    return [(f"<0x{b:02X}>", -20.0, 6) for b in range(256)]


def test_sentencepiece_bpe_merge_order(tmp_path):
    # "hello": h+e merges first (score -1 beats l+l -2), then ll,
    # then he+ll (score -0.5 best), giving ["▁", "hell", "o"].
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁", -5.0, 1),
              ("h", -10.0, 1), ("e", -10.0, 1), ("l", -10.0, 1),
              ("o", -10.0, 1),
              ("he", -1.0, 1), ("ll", -2.0, 1), ("hell", -0.5, 1)]
    p = str(tmp_path / "tok.model")
    write_sentencepiece_model(p, pieces, model_type="bpe",
                              add_dummy_prefix=True, byte_fallback=False)
    tok = SentencePieceTokenizer(p)
    assert tok.model_type == 2 and tok.add_dummy_prefix
    assert tok.bos_id == 1 and tok.eos_id == 2

    ids = tok.encode("hello")
    assert [tok.pieces[i] for i in ids] == ["▁", "hell", "o"]
    assert tok.decode(ids) == "hello"
    assert tok.encode("hello", add_bos=True)[0] == tok.bos_id

    # unknown char without byte fallback -> unk id
    ids = tok.encode("hq")
    assert tok.unk_id in ids


def test_sentencepiece_byte_fallback_roundtrip(tmp_path):
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁", -5.0, 1), ("a", -10.0, 1)] + _byte_pieces()
    p = str(tmp_path / "tok.model")
    write_sentencepiece_model(p, pieces, model_type="bpe",
                              byte_fallback=True)
    tok = SentencePieceTokenizer(p)
    assert tok.byte_fallback
    text = "a é 葉a"          # multi-byte UTF-8 through byte pieces
    ids = tok.encode(text)
    assert tok.unk_id not in ids
    assert tok.decode(ids) == text


def test_sentencepiece_unigram_viterbi(tmp_path):
    # "abc": piece "abc" (-1) beats "ab"+"c" (-2-2) and singles.
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁", -1.0, 1),
              ("a", -3.0, 1), ("b", -3.0, 1), ("c", -3.0, 1),
              ("ab", -2.0, 1), ("abc", -1.0, 1)]
    p = str(tmp_path / "tok.model")
    write_sentencepiece_model(p, pieces, model_type="unigram",
                              add_dummy_prefix=True, byte_fallback=False)
    tok = SentencePieceTokenizer(p)
    ids = tok.encode("abc")
    assert [tok.pieces[i] for i in ids] == ["▁", "abc"]
    # force the split: "abca" -> ▁ abc a
    ids = tok.encode("abca")
    assert [tok.pieces[i] for i in ids] == ["▁", "abc", "a"]
    assert tok.decode(ids) == "abca"


def _fuzz_spm_pieces(rng, alpha, byte_fallback, n_pieces=40):
    """Random piece inventory with distinct scores (ties are the only
    place the two BPE agenda orders can legitimately diverge)."""
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁", -4.0, 1)]
    if byte_fallback:
        pieces += [(f"<0x{b:02X}>", 0.0, 6) for b in range(256)]
    pieces += [(c, -10.0 - i * 0.001, 1) for i, c in enumerate(alpha)]
    seen = {p[0] for p in pieces}
    used_scores = set()
    target = len(pieces) + n_pieces
    while len(pieces) < target:
        w = "".join(rng.choice(alpha) for _ in range(rng.randint(2, 5)))
        if rng.random() < 0.4:
            w = "▁" + w[:-1]
        s = round(rng.uniform(-9.5, -0.5), 4)
        if w in seen or s in used_scores:
            continue
        seen.add(w)
        used_scores.add(s)
        pieces.append((w, s, 1))
    return pieces


@pytest.mark.parametrize("model_type,byte_fallback",
                         [("bpe", False), ("bpe", True),
                          ("unigram", False), ("unigram", True)])
def test_sentencepiece_cross_impl_fuzz(tmp_path, model_type,
                                       byte_fallback):
    """Harden the pure-Python sentencepiece reader against a SECOND
    implementation (VERDICT r3 item 5b): HF's Rust `tokenizers` BPE /
    Unigram models, built from the SAME .model file parsed by
    transformers' vendored sentencepiece protobuf (an independent
    decode of our protobuf writer's wire format). Fuzzes piece
    inventories with distinct scores and random strings, including
    out-of-vocab chars through the byte-fallback path."""
    import random
    pb2 = pytest.importorskip(
        "transformers.utils.sentencepiece_model_pb2_new")
    from transformers.convert_slow_tokenizer import generate_merges
    from tokenizers import Tokenizer, models, normalizers

    alpha = "abc" if byte_fallback else "abcde"
    extra = "  zé€" if byte_fallback else "  "
    rng = random.Random(0)
    for seed in range(3):
        rng.seed(seed)
        pieces = _fuzz_spm_pieces(rng, alpha, byte_fallback)
        path = str(tmp_path / f"fuzz_{seed}.model")
        write_sentencepiece_model(path, pieces, model_type=model_type,
                                  byte_fallback=byte_fallback)
        mine = SentencePieceTokenizer(path)

        # independent protobuf decode must agree field-for-field
        proto = pb2.ModelProto()
        with open(path, "rb") as f:
            proto.ParseFromString(f.read())
        assert [p.piece for p in proto.pieces] == mine.pieces
        np.testing.assert_allclose([p.score for p in proto.pieces],
                                   mine.scores)
        assert [p.type for p in proto.pieces] == mine.types
        assert proto.trainer_spec.model_type == mine.model_type
        assert proto.trainer_spec.byte_fallback == mine.byte_fallback

        vocab_scores = [(p.piece, p.score) for p in proto.pieces]
        if model_type == "bpe":
            vocab = {p.piece: i for i, p in enumerate(proto.pieces)}
            merges = generate_merges(vocab, vocab_scores)
            fast = Tokenizer(models.BPE(
                vocab, merges, unk_token="<unk>", fuse_unk=True,
                byte_fallback=byte_fallback))
        else:
            fast = Tokenizer(models.Unigram(
                vocab_scores, unk_id=0, byte_fallback=byte_fallback))
        # sentencepiece normalization: dummy prefix + ws -> U+2581
        fast.normalizer = normalizers.Sequence([
            normalizers.Prepend("▁"),
            normalizers.Replace(" ", "▁")])

        for _ in range(50):
            n = rng.randint(0, 12)
            s = "".join(rng.choice(alpha + extra)
                        for _ in range(n)).strip()
            ours = mine.encode(s)
            ref = fast.encode(s, add_special_tokens=False).ids
            assert ours == ref, (
                f"{model_type} byte_fallback={byte_fallback} "
                f"diverged on {s!r}: {ours} vs {ref}")
            assert mine.decode(ours) == s


def test_sentencepiece_empty_input_is_empty(tmp_path):
    """sentencepiece returns [] for the empty sentence -- no dummy
    prefix (cross-validated against HF fast tokenizers)."""
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("▁", -5.0, 1), ("a", -10.0, 1)]
    p = str(tmp_path / "tok.model")
    write_sentencepiece_model(p, pieces, model_type="bpe",
                              byte_fallback=False)
    tok = SentencePieceTokenizer(p)
    assert tok.encode("") == []
    assert tok.encode("", add_bos=True) == [tok.bos_id]


def test_dict_config_attribute_view():
    c = DictConfig({"a": 1, "b": {"c": 2}})
    assert c.a == 1 and c.b.c == 2
    assert getattr(c, "missing", "dflt") == "dflt"
    with pytest.raises(AttributeError):
        c.missing


# ---------------------------------------- zero-transformers load path --

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _prompt_vocab_model(path):
    """A byte-fallback BPE tokenizer.model whose ids stay inside the
    tiny text vocab (128)."""
    pieces = ([("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
               ("▁", -5.0, 1)]
              + [(chr(c), -10.0, 1) for c in range(ord("a"), ord("z") + 1)]
              + [(str(d), -10.0, 1) for d in range(10)]
              + [(ch, -10.0, 1) for ch in ".,:()%"])
    write_sentencepiece_model(path, pieces, model_type="bpe",
                              byte_fallback=False)


@pytest.fixture(scope="module")
def tiny_ckpt_dir(tmp_path_factory):
    """A synthesized full-layout HF checkpoint directory: config.json +
    sharded safetensors + index + tokenizer.model."""
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
    torch.manual_seed(7)
    hf = LlavaForConditionalGeneration(hf_cfg).eval()

    d = tmp_path_factory.mktemp("ckpt")
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    names = sorted(sd)
    half = len(names) // 2
    shards = {"model-00001-of-00002.safetensors": names[:half],
              "model-00002-of-00002.safetensors": names[half:]}
    weight_map = {}
    for shard, keys in shards.items():
        write_safetensors(str(d / shard), {k: sd[k] for k in keys})
        weight_map.update({k: shard for k in keys})
    with open(d / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    _prompt_vocab_model(str(d / "tokenizer.model"))
    return str(d), hf


def test_load_checkpoint_matches_transformers(tiny_ckpt_dir, monkeypatch):
    path, hf = tiny_ckpt_dir
    rng = np.random.default_rng(3)
    px = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)
    ids = np.array([[1, 5, 100, 100, 100, 100, 7, 9]], np.int32)
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids, dtype=torch.long),
                 pixel_values=torch.tensor(px)).logits.numpy()

    # prove the loader path needs neither transformers nor torch
    monkeypatch.setitem(sys.modules, "transformers", None)
    monkeypatch.setitem(sys.modules, "torch", None)
    model, variables, tok = load_llava_checkpoint(path)

    ours, _ = model.apply(variables, ids,
                          pixel_values=px.transpose(0, 2, 3, 1))
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=2e-4,
                               atol=2e-4)
    assert isinstance(tok, SentencePieceTokenizer)
    assert tok.decode(tok.encode("score: 85")) == "score: 85"


def test_load_checkpoint_bf16_cast(tiny_ckpt_dir):
    import jax.numpy as jnp
    path, _ = tiny_ckpt_dir
    model, variables, _ = load_llava_checkpoint(path, dtype="bfloat16")
    leaf = variables["params"]["embed_tokens"]["embedding"]
    assert leaf.dtype == jnp.bfloat16


def test_scorer_runs_from_disk_checkpoint(tiny_ckpt_dir, monkeypatch):
    """VERDICT r1 item 2 'done' bar: LlavaJaxScorer scores candidates
    from a disk checkpoint with zero transformers imports."""
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
    path, _ = tiny_ckpt_dir
    monkeypatch.setitem(sys.modules, "transformers", None)
    monkeypatch.setitem(sys.modules, "torch", None)
    model, variables, tok = load_llava_checkpoint(path)
    scorer = LlavaJaxScorer(model, variables, tok, max_new_tokens=4)
    img = np.zeros((28, 28, 3), np.float32)
    cands = [{"x": 3, "y": 4, "leaf_id": 1, "score": 0.5},
             {"x": 9, "y": 2, "leaf_id": 2, "score": 0.7}]
    scores = scorer.score(img, cands, "pick the best leaf")
    assert len(scores) == 2
    assert all(np.isfinite(s) for s in scores)


def test_load_checkpoint_quantized(tiny_ckpt_dir, monkeypatch):
    """quantize=True loads an int8-LM model (vla/quant.py) straight
    from the checkpoint dir; logits stay close to the float load and
    the scorer contract holds."""
    import flax.traverse_util as tu
    path, _ = tiny_ckpt_dir
    monkeypatch.setitem(sys.modules, "transformers", None)
    monkeypatch.setitem(sys.modules, "torch", None)
    fmodel, fvars, _ = load_llava_checkpoint(path)
    model, variables, tok = load_llava_checkpoint(path, quantize=True)
    assert model.cfg.quantized
    flat = tu.flatten_dict(variables)
    assert ("params", "layer_0", "self_attn", "q_proj",
            "kernel_q") in flat
    assert ("params", "lm_head", "kernel_q") in flat

    rng = np.random.default_rng(3)
    px = rng.normal(size=(1, 28, 28, 3)).astype(np.float32)
    ids = np.array([[1, 5, 100, 100, 100, 100, 7, 9]], np.int32)
    ref, _ = fmodel.apply(fvars, ids, pixel_values=px)
    got, _ = model.apply(variables, ids, pixel_values=px)
    # int8 weight rounding perturbs logits but not their scale
    err = np.abs(np.asarray(got) - np.asarray(ref)).max()
    assert err < 0.1 * max(1.0, np.abs(np.asarray(ref)).max())


def test_load_checkpoint_quantized_qlora(tiny_ckpt_dir):
    """quantize composes with lora_rank: int8 base under 'base', float
    adapters beside it (QLoRA serving layout)."""
    import flax.traverse_util as tu
    path, _ = tiny_ckpt_dir
    model, variables, _ = load_llava_checkpoint(path, lora_rank=2,
                                                quantize=True)
    flat = tu.flatten_dict(variables)
    assert ("params", "layer_0", "self_attn", "q_proj", "base",
            "kernel_q") in flat
    assert ("params", "layer_0", "self_attn", "q_proj", "lora_a") in flat
    ids = np.array([[1, 5, 100, 100, 100, 100, 7, 9]], np.int32)
    px = np.zeros((1, 28, 28, 3), np.float32)
    logits, _ = model.apply(variables, ids, pixel_values=px)
    assert np.isfinite(np.asarray(logits)).all()


def test_sentencepiece_negative_int32_ids(tmp_path):
    """protobuf int32 negatives are 64-bit two's-complement varints on
    the wire (real Llama/Mistral tokenizer.model files carry
    pad_id=-1); the reader must fold them back and the writer must emit
    the conformant 10-byte form."""
    pieces = [("<unk>", 0.0, 2), ("<s>", 0.0, 3), ("</s>", 0.0, 3),
              ("a", -1.0, 1)]
    p = str(tmp_path / "tok.model")
    write_sentencepiece_model(p, pieces, model_type="bpe",
                              byte_fallback=False, pad_id=-1)
    tok = SentencePieceTokenizer(p)
    assert tok.pad_id == -1
    # the wire bytes for pad_id must be the 10-byte sign-extended form
    raw = open(p, "rb").read()
    assert bytes([0xFF] * 8 + [0x01]) in raw
    # a hand-built 64-bit wire value also decodes to -1
    from leafgrasp_tpu.vla.checkpoint_io import _emit_i32
    assert _emit_i32(-1) == b"\xff\xff\xff\xff\xff\xff\xff\xff\xff\x01"
    assert _emit_i32(3) == b"\x03"


# -------------------------------------------- full 7B v1.6 metadata --

# The COMPLETE llava-v1.6-mistral-7b-hf config.json metadata (the
# reference's served model, vla_system/llava_processor.py:18-31): real
# dims + the five anyres grid pinpoints. Weights stay stubs -- this
# walks the exact serving config path at true scale.
FULL_7B_V16_CONFIG = {
    "architectures": ["LlavaNextForConditionalGeneration"],
    "model_type": "llava_next",
    "ignore_index": -100,
    "image_token_index": 32000,
    "projector_hidden_act": "gelu",
    "vision_feature_layer": -2,
    "vision_feature_select_strategy": "default",
    "image_grid_pinpoints": [[336, 672], [672, 336], [672, 672],
                             [1008, 336], [336, 1008]],
    "text_config": {
        "model_type": "mistral",
        "hidden_size": 4096,
        "intermediate_size": 14336,
        "num_attention_heads": 32,
        "num_hidden_layers": 32,
        "num_key_value_heads": 8,
        "rms_norm_eps": 1e-05,
        "rope_theta": 1000000.0,
        "sliding_window": None,
        "vocab_size": 32064,
        "max_position_embeddings": 32768,
        "torch_dtype": "bfloat16",
    },
    "vision_config": {
        "model_type": "clip_vision_model",
        "hidden_size": 1024,
        "intermediate_size": 4096,
        "num_attention_heads": 16,
        "num_hidden_layers": 24,
        "image_size": 336,
        "patch_size": 14,
        "projection_dim": 768,
        "vocab_size": 32000,
    },
    "torch_dtype": "float16",
    "vocab_size": 32064,
}


def test_parse_full_7b_v16_config_metadata():
    """The real llava-v1.6-mistral-7b config.json metadata flows
    through the exact load_llava_checkpoint parsing into a
    LlavaJaxConfig with the true 7B dims and anyres pinpoints."""
    from leafgrasp_tpu.vla.checkpoint_io import parse_llava_config
    cfg = parse_llava_config(FULL_7B_V16_CONFIG)
    assert (cfg.hidden, cfg.intermediate, cfg.layers) == (4096, 14336, 32)
    assert (cfg.heads, cfg.kv_heads, cfg.head_dim) == (32, 8, 128)
    assert cfg.vocab_size == 32064
    assert cfg.rope_theta == 1e6 and cfg.rms_eps == 1e-5
    assert cfg.sliding_window is None
    assert (cfg.vis_hidden, cfg.vis_layers, cfg.vis_heads) == (1024, 24, 16)
    assert (cfg.image_size, cfg.patch_size, cfg.num_patches) == (336, 14,
                                                                 576)
    assert cfg.image_token_index == 32000
    assert cfg.image_grid_pinpoints == ((336, 672), (672, 336),
                                        (672, 672), (1008, 336),
                                        (336, 1008))
    # anyres bookkeeping at the real dims: a 1080x1440 camera frame
    # selects the 672x672 pinpoint -> 4 spatial tiles + base
    from leafgrasp_tpu.vla.llava_next import (select_best_resolution,
                                              anyres_grid_shape)
    assert select_best_resolution((1080, 1440),
                                  cfg.image_grid_pinpoints) == (672, 672)
    assert anyres_grid_shape((1080, 1440), cfg.image_grid_pinpoints,
                             cfg.image_size) == (2, 2)


@pytest.fixture(scope="module")
def tiny_next_ckpt_dir(tmp_path_factory):
    """A synthesized v1.6 (LlavaNext) checkpoint directory: anyres
    pinpoints in config.json + image_newline in the safetensors."""
    import torch
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
    torch.manual_seed(11)
    hf = LlavaNextForConditionalGeneration(hf_cfg).eval()
    d = tmp_path_factory.mktemp("ckpt_next")
    with open(d / "config.json", "w") as f:
        json.dump(hf_cfg.to_dict(), f)
    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    write_safetensors(str(d / "model.safetensors"), sd)
    _prompt_vocab_model(str(d / "tokenizer.model"))
    return str(d)


def test_anyres_scorer_from_disk_checkpoint(tiny_next_ckpt_dir,
                                            monkeypatch):
    """v1.6 checkpoint dir -> anyres scorer, no transformers/torch:
    checkpoint_io carries image_grid_pinpoints AND image_newline
    end-to-end into LlavaJaxScorer(anyres=True)."""
    from leafgrasp_tpu.vla.llava_runtime import LlavaJaxScorer
    monkeypatch.setitem(sys.modules, "transformers", None)
    monkeypatch.setitem(sys.modules, "torch", None)
    model, variables, tok = load_llava_checkpoint(tiny_next_ckpt_dir)
    assert model.cfg.image_grid_pinpoints == ((28, 56), (56, 28),
                                              (56, 56))
    assert "image_newline" in variables["params"]
    scorer = LlavaJaxScorer(model, variables, tok, max_new_tokens=4,
                            anyres=True)
    img = (np.random.default_rng(5).random((40, 50, 3)) * 255
           ).astype(np.uint8)
    cands = [{"x": 3, "y": 4, "leaf_id": 1, "geometric_score": 0.8},
             {"x": 9, "y": 2, "leaf_id": 2, "geometric_score": 0.6}]
    scores = scorer.score(img, cands, "pick the best leaf")
    assert len(scores) == 2 and all(np.isfinite(s) for s in scores)


# ------------------------------------ real-7B-shape sharded load path --

_V16_TEXT = dict(hidden=4096, intermediate=14336, heads=32, kv_heads=8,
                 vocab=32064)
_V16_VISION = dict(hidden=1024, intermediate=4096, heads=16,
                   image_size=336, patch_size=14)


def _synth_v16_state_dict(n_layers=2, n_vis_layers=2, seed=0):
    """HF-named llava-v1.6-mistral-7b state dict at the REAL per-tensor
    shapes (hidden 4096, intermediate 14336, 32/8 heads, vocab 32064,
    CLIP-L/336 tower), truncated to a 2-layer slice of each stack --
    ~1.5 GB bf16, synthesized without torch/transformers. Yields
    (name, bf16 array) pairs one tensor at a time to bound RAM."""
    import ml_dtypes
    t, v = _V16_TEXT, _V16_VISION
    rng = np.random.default_rng(seed)
    bf16 = ml_dtypes.bfloat16

    def randn(*shape, scale=0.02):
        return (rng.standard_normal(shape, dtype=np.float32)
                * scale).astype(bf16)

    def ones(*shape):
        return np.ones(shape, bf16)

    def zeros(*shape):
        return np.zeros(shape, bf16)

    vt = "vision_tower.vision_model"
    n_pos = (v["image_size"] // v["patch_size"]) ** 2 + 1      # 577
    yield f"{vt}.embeddings.class_embedding", randn(v["hidden"])
    yield (f"{vt}.embeddings.position_embedding.weight",
           randn(n_pos, v["hidden"]))
    yield (f"{vt}.embeddings.patch_embedding.weight",
           randn(v["hidden"], 3, v["patch_size"], v["patch_size"]))
    yield f"{vt}.pre_layrnorm.weight", ones(v["hidden"])
    yield f"{vt}.pre_layrnorm.bias", zeros(v["hidden"])
    for i in range(n_vis_layers):
        li = f"{vt}.encoder.layers.{i}"
        for ln in ("layer_norm1", "layer_norm2"):
            yield f"{li}.{ln}.weight", ones(v["hidden"])
            yield f"{li}.{ln}.bias", zeros(v["hidden"])
        for proj in ("q_proj", "k_proj", "v_proj", "out_proj"):
            yield (f"{li}.self_attn.{proj}.weight",
                   randn(v["hidden"], v["hidden"]))
            yield f"{li}.self_attn.{proj}.bias", zeros(v["hidden"])
        yield f"{li}.mlp.fc1.weight", randn(v["intermediate"], v["hidden"])
        yield f"{li}.mlp.fc1.bias", zeros(v["intermediate"])
        yield f"{li}.mlp.fc2.weight", randn(v["hidden"], v["intermediate"])
        yield f"{li}.mlp.fc2.bias", zeros(v["hidden"])

    yield ("multi_modal_projector.linear_1.weight",
           randn(t["hidden"], v["hidden"]))
    yield "multi_modal_projector.linear_1.bias", zeros(t["hidden"])
    yield ("multi_modal_projector.linear_2.weight",
           randn(t["hidden"], t["hidden"]))
    yield "multi_modal_projector.linear_2.bias", zeros(t["hidden"])
    yield "image_newline", randn(t["hidden"])

    lm = "language_model.model"
    kv_dim = t["hidden"] // t["heads"] * t["kv_heads"]         # 1024
    yield f"{lm}.embed_tokens.weight", randn(t["vocab"], t["hidden"])
    for i in range(n_layers):
        li = f"{lm}.layers.{i}"
        yield f"{li}.input_layernorm.weight", ones(t["hidden"])
        yield f"{li}.post_attention_layernorm.weight", ones(t["hidden"])
        yield f"{li}.self_attn.q_proj.weight", randn(t["hidden"],
                                                     t["hidden"])
        yield f"{li}.self_attn.k_proj.weight", randn(kv_dim, t["hidden"])
        yield f"{li}.self_attn.v_proj.weight", randn(kv_dim, t["hidden"])
        yield f"{li}.self_attn.o_proj.weight", randn(t["hidden"],
                                                     t["hidden"])
        yield f"{li}.mlp.gate_proj.weight", randn(t["intermediate"],
                                                  t["hidden"])
        yield f"{li}.mlp.up_proj.weight", randn(t["intermediate"],
                                                t["hidden"])
        yield f"{li}.mlp.down_proj.weight", randn(t["hidden"],
                                                  t["intermediate"])
    yield f"{lm}.norm.weight", ones(t["hidden"])
    yield "lm_head.weight", randn(t["vocab"], t["hidden"])


@pytest.fixture(scope="module")
def real_dims_ckpt_dir(tmp_path_factory):
    """A 3-shard v1.6 checkpoint at real 7B tensor shapes (2-layer
    slice, bf16, ~1.5 GB): exercises index routing, mmap views, dtype
    handling and quantize-on-load exactly as the full 14 GB checkpoint
    would (VERDICT r3 item 5a)."""
    t, v = _V16_TEXT, _V16_VISION
    d = tmp_path_factory.mktemp("ckpt_7b_slice")
    cfg = {
        "architectures": ["LlavaNextForConditionalGeneration"],
        "image_token_index": 32000,
        "image_grid_pinpoints": [[336, 672], [672, 336], [672, 672],
                                 [1008, 336], [336, 1008]],
        "vision_feature_layer": -2,
        "vision_feature_select_strategy": "default",
        "vision_config": {
            "hidden_size": v["hidden"],
            "intermediate_size": v["intermediate"],
            "num_hidden_layers": 2,
            "num_attention_heads": v["heads"],
            "image_size": v["image_size"],
            "patch_size": v["patch_size"]},
        "text_config": {
            "model_type": "mistral",
            "hidden_size": t["hidden"],
            "intermediate_size": t["intermediate"],
            "num_hidden_layers": 2,
            "num_attention_heads": t["heads"],
            "num_key_value_heads": t["kv_heads"],
            "vocab_size": t["vocab"],
            "rms_norm_eps": 1e-5,
            "rope_theta": 1000000.0},
    }
    with open(d / "config.json", "w") as f:
        json.dump(cfg, f)

    # stream tensors into 3 shards, bounding host RAM to one shard
    n_shards = 3
    names_per_shard = [[] for _ in range(n_shards)]
    shard_bufs = [{} for _ in range(n_shards)]
    for j, (name, arr) in enumerate(_synth_v16_state_dict()):
        shard_bufs[j % n_shards][name] = arr
        names_per_shard[j % n_shards].append(name)
    weight_map = {}
    for s in range(n_shards):
        fname = f"model-{s + 1:05d}-of-{n_shards:05d}.safetensors"
        write_safetensors(str(d / fname), shard_bufs[s])
        weight_map.update({k: fname for k in names_per_shard[s]})
        shard_bufs[s] = None
    with open(d / "model.safetensors.index.json", "w") as f:
        json.dump({"weight_map": weight_map}, f)
    _prompt_vocab_model(str(d / "tokenizer.model"))
    return str(d)


def test_real_dims_sharded_quantized_load_and_serve(real_dims_ckpt_dir,
                                                    capsys, monkeypatch):
    """Load the real-7B-shape sharded checkpoint with quantize=int8 +
    bf16 cast and serve one rerank through the CLI -- the closest
    possible rehearsal of the real llava-v1.6-mistral-7b load
    (vla_system/llava_processor.py:18-31) in a zero-egress environment:
    index routing, bf16 mmap views, quantize-on-load and the serving
    stack all at true tensor shapes."""
    import jax.numpy as jnp
    import flax.traverse_util as tu
    monkeypatch.setitem(sys.modules, "transformers", None)
    monkeypatch.setitem(sys.modules, "torch", None)

    model, variables, tok = load_llava_checkpoint(
        real_dims_ckpt_dir, dtype="bfloat16", quantize=True)
    c = model.cfg
    assert (c.hidden, c.intermediate, c.heads, c.kv_heads,
            c.vocab_size) == (4096, 14336, 32, 8, 32064)
    assert c.image_grid_pinpoints == ((336, 672), (672, 336), (672, 672),
                                      (1008, 336), (336, 1008))
    assert c.quantized and c.quant_bits == 8
    flat = tu.flatten_dict(variables["params"])
    q = flat[("layer_0", "self_attn", "q_proj", "kernel_q")]
    assert q.shape == (4096, 4096) and q.dtype == jnp.int8
    gate = flat[("layer_1", "gate_proj", "kernel_q")]
    assert gate.shape == (4096, 14336) and gate.dtype == jnp.int8
    assert flat[("embed_tokens", "embedding")].dtype == jnp.bfloat16
    assert flat[("image_newline",)].shape == (4096,)

    # one rerank through the CLI at these shapes (single-tile path --
    # the anyres x5-tile prefill at 4096 dims is a chip-scale program,
    # benched separately in tools/bench_vla_anyres.py)
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import serve_llava
    serve_llava.main([real_dims_ckpt_dir, "--dtype", "bfloat16",
                      "--quantize", "int8", "--frame-size", "96", "128",
                      "--seed", "1", "--candidates", "2",
                      "--max-new-tokens", "3", "--json"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["candidates"] and out["best"] is not None
    assert {"leaf_id", "strategy"} <= set(out["best"])


def test_serve_llava_cli_end_to_end(tiny_next_ckpt_dir, capsys):
    """tools/serve_llava.py: checkpoint dir -> leaf stage -> batched
    anyres rerank -> fused choice, one command (VERDICT r2 item 6)."""
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    import serve_llava
    serve_llava.main([tiny_next_ckpt_dir, "--dtype", "float32",
                      "--anyres", "--frame-size", "96", "128",
                      "--seed", "1", "--max-new-tokens", "4", "--json"])
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["candidates"] and out["best"] is not None
    assert {"leaf_id", "x", "y", "strategy"} <= set(out["best"])
