"""Self-contained LLaVA checkpoint IO: zero transformers, zero torch.

The reference serving node loads its 7B VLM through the transformers
pipeline (vla_system/llava_processor.py:18-51).  The JAX stack here
reads the same on-disk HuggingFace checkpoint layout directly:

- ``read_safetensors`` / ``write_safetensors``: the safetensors
  container (8-byte little-endian header length + JSON header + raw
  little-endian tensor bytes), in pure numpy (bf16 via ml_dtypes).
- ``SentencePieceTokenizer``: a pure-Python reader of the
  ``tokenizer.model`` protobuf (sentencepiece ``ModelProto``), with
  BPE-merge and unigram-Viterbi inference, byte fallback, and the
  Llama/Mistral ``add_dummy_prefix`` / ``escape_whitespaces``
  conventions.  No sentencepiece, no protobuf runtime.
- ``load_llava_checkpoint``: checkpoint dir (config.json +
  model.safetensors[.index.json] + tokenizer.model) ->
  (LlavaJax model, variables, tokenizer), ready for
  ``llava_runtime.LlavaJaxScorer``.

The protobuf pieces are hand-decoded from the wire format; only the
fields sentencepiece_model.proto assigns to ModelProto(1=pieces,
2=trainer_spec, 3=normalizer_spec), SentencePiece(1=piece, 2=score,
3=type), TrainerSpec(3=model_type, 35=byte_fallback, 40..43=
unk/bos/eos/pad ids) and NormalizerSpec(3=add_dummy_prefix) are read.
"""

from __future__ import annotations

import json
import os
import struct
from typing import Any, Dict, Iterator, List, Tuple

import numpy as np

__all__ = [
    "read_safetensors", "write_safetensors", "SentencePieceTokenizer",
    "write_sentencepiece_model", "load_llava_checkpoint",
    "parse_llava_config", "DictConfig",
]


# --------------------------------------------------------- safetensors --

_ST_DTYPES: Dict[str, Any] = {
    "F64": np.float64, "F32": np.float32, "F16": np.float16,
    "I64": np.int64, "I32": np.int32, "I16": np.int16, "I8": np.int8,
    "U8": np.uint8, "BOOL": np.bool_,
}


def _bf16():
    import ml_dtypes
    return ml_dtypes.bfloat16


def read_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Parse one .safetensors file into name -> numpy array.

    Tensors are zero-copy views over an mmap of the file: a 7B bf16
    checkpoint (~14 GB) must not be doubled through read()+slice
    copies. Views stay valid for the mmap's lifetime (the buffer keeps
    a reference); device_put / astype copies happen downstream only
    where the caller asks for them.
    """
    import mmap as _mmap
    with open(path, "rb") as f:
        (hlen,) = struct.unpack("<Q", f.read(8))
        header = json.loads(f.read(hlen).decode("utf-8"))
        base = 8 + hlen
        mm = _mmap.mmap(f.fileno(), 0, access=_mmap.ACCESS_READ)
    out: Dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        dt = spec["dtype"]
        dtype = _bf16() if dt == "BF16" else _ST_DTYPES[dt]
        b, e = spec["data_offsets"]
        n = (e - b) // np.dtype(dtype).itemsize
        arr = np.frombuffer(mm, dtype=dtype, count=n, offset=base + b)
        out[name] = arr.reshape(spec["shape"])
    return out


def write_safetensors(path: str, tensors: Dict[str, np.ndarray],
                      metadata: Dict[str, str] | None = None) -> None:
    """Write name -> numpy array as a .safetensors file."""
    rev = {np.dtype(v): k for k, v in _ST_DTYPES.items()}
    header: Dict[str, Any] = {}
    if metadata:
        header["__metadata__"] = metadata
    blobs: List[bytes] = []
    off = 0
    for name, arr in tensors.items():
        arr = np.ascontiguousarray(arr)
        if arr.dtype == _bf16():
            dt = "BF16"
        else:
            dt = rev[arr.dtype]
        raw = arr.tobytes()
        header[name] = {"dtype": dt, "shape": list(arr.shape),
                        "data_offsets": [off, off + len(raw)]}
        blobs.append(raw)
        off += len(raw)
    hjson = json.dumps(header).encode("utf-8")
    with open(path, "wb") as f:
        f.write(struct.pack("<Q", len(hjson)))
        f.write(hjson)
        for b in blobs:
            f.write(b)


def _read_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Checkpoint dir -> merged state_dict (single file or shard index)."""
    index = os.path.join(path, "model.safetensors.index.json")
    if os.path.exists(index):
        with open(index) as f:
            weight_map: Dict[str, str] = json.load(f)["weight_map"]
        sd: Dict[str, np.ndarray] = {}
        for shard in sorted(set(weight_map.values())):
            sd.update(read_safetensors(os.path.join(path, shard)))
        return sd
    single = os.path.join(path, "model.safetensors")
    if os.path.exists(single):
        return read_safetensors(single)
    raise FileNotFoundError(
        f"no model.safetensors[.index.json] under {path}")


# ------------------------------------------------- minimal protobuf IO --

def _varint(buf: bytes, i: int) -> Tuple[int, int]:
    val = shift = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def _fields(buf: bytes) -> Iterator[Tuple[int, int, Any]]:
    """Yield (field_number, wire_type, value) over a protobuf message."""
    i = 0
    while i < len(buf):
        key, i = _varint(buf, i)
        field, wire = key >> 3, key & 7
        if wire == 0:                      # varint
            val, i = _varint(buf, i)
        elif wire == 1:                    # fixed64
            val = buf[i:i + 8]
            i += 8
        elif wire == 2:                    # length-delimited
            n, i = _varint(buf, i)
            val = buf[i:i + n]
            i += n
        elif wire == 5:                    # fixed32
            val = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wire}")
        yield field, wire, val


def _emit_i32(val: int) -> bytes:
    """protobuf int32: negatives are encoded as 64-bit two's-complement
    varints (10 bytes), matching the real sentencepiece runtime."""
    return _emit_varint(val & 0xFFFFFFFFFFFFFFFF if val < 0 else val)


def _emit_varint(val: int) -> bytes:
    out = bytearray()
    while True:
        b = val & 0x7F
        val >>= 7
        if val:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _emit_field(field: int, wire: int, payload: bytes) -> bytes:
    head = _emit_varint((field << 3) | wire)
    if wire == 2:
        return head + _emit_varint(len(payload)) + payload
    return head + payload


def write_sentencepiece_model(
        path: str, pieces: List[Tuple[str, float, int]],
        model_type: str = "bpe", add_dummy_prefix: bool = True,
        byte_fallback: bool = True, unk_id: int = 0, bos_id: int = 1,
        eos_id: int = 2, pad_id: int = -1) -> None:
    """Serialize a minimal sentencepiece ModelProto (for tests/tools).

    pieces: [(piece, score, type)] with type in {1 NORMAL, 2 UNKNOWN,
    3 CONTROL, 4 USER_DEFINED, 6 BYTE}.
    """
    body = bytearray()
    for piece, score, ptype in pieces:
        sp = (_emit_field(1, 2, piece.encode("utf-8"))
              + _emit_field(2, 5, struct.pack("<f", score))
              + _emit_field(3, 0, _emit_varint(ptype)))
        body += _emit_field(1, 2, sp)
    mt = {"unigram": 1, "bpe": 2}[model_type]
    trainer = (_emit_field(3, 0, _emit_varint(mt))
               + _emit_field(35, 0, _emit_varint(int(byte_fallback)))
               + _emit_field(40, 0, _emit_i32(unk_id))
               + _emit_field(41, 0, _emit_i32(bos_id))
               + _emit_field(42, 0, _emit_i32(eos_id))
               + _emit_field(43, 0, _emit_i32(pad_id)))
    body += _emit_field(2, 2, trainer)
    norm = _emit_field(3, 0, _emit_varint(int(add_dummy_prefix)))
    body += _emit_field(3, 2, norm)
    with open(path, "wb") as f:
        f.write(bytes(body))


_SPACE = "▁"        # the sentencepiece whitespace escape
_UNK_PENALTY = 10.0      # sentencepiece unigram_model.cc kUnkPenalty


class SentencePieceTokenizer:
    """Pure-Python sentencepiece inference from a tokenizer.model file.

    Supports the two model types in the wild (BPE: Llama/Mistral;
    unigram: T5-family), byte fallback, and the standard normalizer
    conventions (escape whitespace to U+2581, optional dummy prefix).
    API matches what LlavaJaxScorer needs: encode(text) -> List[int],
    decode(ids) -> str, plus bos/eos/unk/pad ids.
    """

    def __init__(self, model_path: str):
        with open(model_path, "rb") as f:
            buf = f.read()
        self.pieces: List[str] = []
        self.scores: List[float] = []
        self.types: List[int] = []
        self.model_type = 2            # BPE default
        self.byte_fallback = False
        self.add_dummy_prefix = True
        self.unk_id, self.bos_id, self.eos_id, self.pad_id = 0, 1, 2, -1

        def _i32(v: int) -> int:
            # protobuf int32 negatives arrive as 64-bit two's-complement
            # varints (pad_id=-1 in real Llama/Mistral tokenizer.model
            # files is wire value 2^64-1); interpret the low 32 bits as
            # signed after folding the 64-bit sign
            v &= 0xFFFFFFFF
            return v - (1 << 32) if v >= (1 << 31) else v

        for field, wire, val in _fields(buf):
            if field == 1 and wire == 2:           # SentencePiece
                piece, score, ptype = "", 0.0, 1
                for f2, w2, v2 in _fields(val):
                    if f2 == 1:
                        piece = v2.decode("utf-8")
                    elif f2 == 2:
                        (score,) = struct.unpack("<f", v2)
                    elif f2 == 3:
                        ptype = v2
                self.pieces.append(piece)
                self.scores.append(score)
                self.types.append(ptype)
            elif field == 2 and wire == 2:         # TrainerSpec
                for f2, w2, v2 in _fields(val):
                    if f2 == 3:
                        self.model_type = v2
                    elif f2 == 35:
                        self.byte_fallback = bool(v2)
                    elif f2 == 40:
                        self.unk_id = _i32(v2)
                    elif f2 == 41:
                        self.bos_id = _i32(v2)
                    elif f2 == 42:
                        self.eos_id = _i32(v2)
                    elif f2 == 43:
                        self.pad_id = _i32(v2)
            elif field == 3 and wire == 2:         # NormalizerSpec
                for f2, w2, v2 in _fields(val):
                    if f2 == 3:
                        self.add_dummy_prefix = bool(v2)

        self.vocab: Dict[str, int] = {}
        for i, p in enumerate(self.pieces):
            self.vocab.setdefault(p, i)
        # UNKNOWN-typed piece overrides the trainer unk_id if present
        for i, t in enumerate(self.types):
            if t == 2:
                self.unk_id = i
                break

    def __len__(self) -> int:
        return len(self.pieces)

    # ---- encoding ---------------------------------------------------

    def _byte_ids(self, ch: str) -> List[int] | None:
        ids = []
        for b in ch.encode("utf-8"):
            i = self.vocab.get(f"<0x{b:02X}>")
            if i is None:
                return None
            ids.append(i)
        return ids

    def _tokenize_bpe(self, text: str) -> List[int]:
        """sentencepiece BPE: repeatedly merge the adjacent pair whose
        concatenation is a vocab piece with the best (max) score;
        ties resolve to the leftmost pair (bpe_model.cc agenda order)."""
        syms = list(text)
        if not syms:
            return []
        while len(syms) > 1:
            best_score, best_i = None, -1
            for i in range(len(syms) - 1):
                j = self.vocab.get(syms[i] + syms[i + 1])
                if j is None:
                    continue
                s = self.scores[j]
                if best_score is None or s > best_score:
                    best_score, best_i = s, i
            if best_i < 0:
                break
            syms[best_i:best_i + 2] = [syms[best_i] + syms[best_i + 1]]
        out: List[int] = []
        for s in syms:
            j = self.vocab.get(s)
            if j is not None:
                out.append(j)
                continue
            bids = self._byte_ids(s) if self.byte_fallback else None
            out.extend(bids if bids is not None else [self.unk_id])
        return out

    def _tokenize_unigram(self, text: str) -> List[int]:
        """Viterbi segmentation maximizing summed piece log-probs, with
        the sentencepiece unk penalty for single-char unknowns."""
        n = len(text)
        if n == 0:
            return []
        unk_score = min(self.scores) - _UNK_PENALTY if self.scores \
            else -_UNK_PENALTY
        best = [(-np.inf, -1, -1)] * (n + 1)   # (score, prev, piece_id)
        best[0] = (0.0, -1, -1)
        maxlen = max((len(p) for p in self.pieces), default=1)
        for e in range(1, n + 1):
            for s in range(max(0, e - maxlen), e):
                if best[s][0] == -np.inf:
                    continue
                sub = text[s:e]
                j = self.vocab.get(sub)
                if j is not None:
                    sc = best[s][0] + self.scores[j]
                    if sc > best[e][0]:
                        best[e] = (sc, s, j)
                if e - s == 1 and j is None:
                    sc = best[s][0] + unk_score
                    if sc > best[e][0]:
                        best[e] = (sc, s, -1)
        ids: List[int] = []
        e = n
        while e > 0:
            _, s, j = best[e]
            if j >= 0:
                ids.append(j)
            else:
                ch = text[s:e]
                bids = self._byte_ids(ch) if self.byte_fallback else None
                if bids is not None:
                    ids.extend(reversed(bids))
                else:
                    ids.append(self.unk_id)
            e = s
        return ids[::-1]

    def encode(self, text: str, add_bos: bool = False,
               add_eos: bool = False) -> List[int]:
        t = text
        # sentencepiece treats the empty sentence as trivially empty --
        # no dummy prefix (cross-validated against HF fast tokenizers)
        if t and self.add_dummy_prefix and not t.startswith(" "):
            t = " " + t
        t = t.replace(" ", _SPACE)
        ids = (self._tokenize_bpe(t) if self.model_type == 2
               else self._tokenize_unigram(t))
        if add_bos and self.bos_id >= 0:
            ids = [self.bos_id] + ids
        if add_eos and self.eos_id >= 0:
            ids = ids + [self.eos_id]
        return ids

    # ---- decoding ---------------------------------------------------

    def decode(self, ids) -> str:
        out: List[str] = []
        byte_buf = bytearray()

        def flush():
            if byte_buf:
                out.append(byte_buf.decode("utf-8", errors="replace"))
                byte_buf.clear()

        for i in ids:
            i = int(i)
            if not 0 <= i < len(self.pieces):
                continue
            if self.types[i] == 6:                   # BYTE piece <0xXX>
                byte_buf.append(int(self.pieces[i][3:5], 16))
                continue
            flush()
            if self.types[i] in (2, 3):              # UNK / CONTROL
                continue
            out.append(self.pieces[i])
        flush()
        text = "".join(out).replace(_SPACE, " ")
        if self.add_dummy_prefix and text.startswith(" "):
            text = text[1:]
        return text


# ------------------------------------------------------ config loading --

class DictConfig:
    """Attribute view over a JSON config dict (stand-in for the HF
    config object consumed by ``config_from_hf``)."""

    def __init__(self, d: Dict[str, Any]):
        self._d = d

    def __getattr__(self, name: str):
        try:
            v = self._d[name]
        except KeyError:
            raise AttributeError(name) from None
        return DictConfig(v) if isinstance(v, dict) else v


# CLIP-vision / Mistral defaults for fields HF config.json may omit
_VISION_DEFAULTS = {
    "hidden_size": 768, "intermediate_size": 3072,
    "num_hidden_layers": 12, "num_attention_heads": 12,
    "image_size": 224, "patch_size": 32,
}
_TEXT_DEFAULTS = {
    "rope_theta": 10000.0, "rms_norm_eps": 1e-6, "sliding_window": None,
}


def parse_llava_config(raw: Dict[str, Any]):
    """config.json dict -> LlavaJaxConfig (defaults filled for fields
    HF omits). This is the exact parsing ``load_llava_checkpoint``
    uses; factored out so the full 7B metadata (real dims, anyres
    grid pinpoints) can be walked through it without 14 GB of weights.
    """
    from leafgrasp_tpu.vla.llava_jax import config_from_hf
    raw = dict(raw)
    raw["vision_config"] = {**_VISION_DEFAULTS,
                            **raw.get("vision_config", {})}
    tc = {**_TEXT_DEFAULTS, **raw.get("text_config", {})}
    tc.setdefault("num_key_value_heads", tc.get("num_attention_heads"))
    raw["text_config"] = tc
    return config_from_hf(DictConfig(raw))


def load_llava_checkpoint(path: str, lora_rank: int = 0,
                          dtype: str = "float32",
                          quantize: bool = False,
                          quant_bits: int = 8,
                          quant_group: int = 128):
    """Checkpoint dir -> (LlavaJax, variables, tokenizer); no
    transformers, no torch (vla_system/llava_processor.py:18-31 is the
    pipeline this replaces).

    dtype: "float32" | "bfloat16" -- cast applied to every weight leaf.
    quantize: replace every LM projection kernel with weight-only
    quantized serving layers (vla/quant.py) -- the TPU-native analogue
    of the bitsandbytes quantized serving the reference container ships
    (its Dockerfile installs bitsandbytes next to transformers/peft).
    quant_bits selects per-channel int8 (default) or group-wise native
    int4 (quant_group = input-dim group size). Composes with
    lora_rank > 0 (QLoRA layout: quantized frozen base + float
    adapters).
    Tokenizer source: ``tokenizer.model`` (pure-Python sentencepiece
    reader); falls back to ``tokenizer.json`` via the standalone
    ``tokenizers`` wheel when only the fast format is present.
    """
    import dataclasses
    import jax
    import jax.numpy as jnp
    from leafgrasp_tpu.vla.llava_jax import (LlavaJax,
                                             convert_hf_llava_state_dict,
                                             attach_lora)

    with open(os.path.join(path, "config.json")) as f:
        raw = json.load(f)
    cfg = parse_llava_config(raw)
    if lora_rank > 0:
        cfg = dataclasses.replace(cfg, lora_rank=lora_rank)

    sd = _read_state_dict(path)
    variables = convert_hf_llava_state_dict(sd, cfg)
    if dtype != "float32":
        dt = jnp.dtype(dtype)
        variables = jax.tree.map(
            lambda x: x.astype(dt) if jnp.issubdtype(x.dtype,
                                                     jnp.floating) else x,
            variables)
    model = LlavaJax(cfg)
    if lora_rank > 0:
        variables = attach_lora(model, variables, jax.random.PRNGKey(0))
    if quantize:
        from leafgrasp_tpu.vla.quant import quantize_llava_variables
        variables = quantize_llava_variables(variables, bits=quant_bits,
                                             group=quant_group)
        cfg = dataclasses.replace(cfg, quantized=True,
                                  quant_bits=quant_bits,
                                  quant_group=quant_group)
        model = LlavaJax(cfg)

    spm = os.path.join(path, "tokenizer.model")
    if os.path.exists(spm):
        tokenizer = SentencePieceTokenizer(spm)
    else:
        tj = os.path.join(path, "tokenizer.json")
        if not os.path.exists(tj):
            raise FileNotFoundError(
                f"no tokenizer.model or tokenizer.json under {path}")
        from tokenizers import Tokenizer as _FastTokenizer
        fast = _FastTokenizer.from_file(tj)
        tokenizer = _FastWrapper(fast)
    return model, variables, tokenizer


class _FastWrapper:
    """Adapt a ``tokenizers.Tokenizer`` to the encode/decode contract."""

    def __init__(self, fast):
        self._fast = fast

    def encode(self, text: str) -> List[int]:
        return self._fast.encode(text, add_special_tokens=False).ids

    def decode(self, ids) -> str:
        return self._fast.decode([int(i) for i in ids],
                                 skip_special_tokens=True)
