"""LLaVA-NeXT (v1.6) anyres path: tiling, feature packing, forward.

The reference model is llava-v1.6 (NeXT): images are tiled to the best
grid-pinpoint resolution, each tile runs through the vision tower, and
the tile features are re-assembled into one token sequence with
unpadding + a learned per-row newline embedding
(transformers modeling_llava_next.py semantics, re-implemented here and
parity-tested against a randomly initialized HF LlavaNext at tiny
scale).  The packing is host-side numpy (shapes depend on the image
size); the tower/projector and the decoder remain jitted JAX.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from leafgrasp_tpu.vla.llava_jax import (LlavaJax, _VisionProject,
                                         greedy_generate_llava)
from leafgrasp_tpu.vla.llava_runtime import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

__all__ = ["select_best_resolution", "anyres_grid_shape", "unpad_feature_grid",
           "pack_anyres_features", "pack_anyres_features_jnp",
           "preprocess_anyres", "clip_normalize_jnp",
           "llava_next_forward", "llava_next_generate"]


def select_best_resolution(image_hw: Tuple[int, int],
                           pinpoints: Sequence[Sequence[int]]
                           ) -> Tuple[int, int]:
    """HF select_best_resolution: maximize effective resolution, then
    minimize wasted area. image_hw and pinpoints are (height, width)."""
    oh, ow = image_hw
    best, best_eff, best_waste = None, -1, float("inf")
    for ph, pw in pinpoints:
        scale = min(pw / ow, ph / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = pw * ph - eff
        if eff > best_eff or (eff == best_eff and waste < best_waste):
            best, best_eff, best_waste = (ph, pw), eff, waste
    return best


def anyres_grid_shape(image_hw, pinpoints, tile_size: int):
    """(grid_w_tiles, grid_h_tiles) -- HF returns (width//tile,
    height//tile)."""
    ph, pw = select_best_resolution(image_hw, pinpoints)
    return pw // tile_size, ph // tile_size


def unpad_feature_grid(grid: np.ndarray, image_hw) -> np.ndarray:
    """HF unpad_image on a (H, W, D) feature grid: crop the padding that
    letterboxing added for the original aspect ratio."""
    oh, ow = image_hw
    ch, cw = grid.shape[:2]
    original_ar = ow / oh
    current_ar = cw / ch
    if original_ar > current_ar:
        scale = cw / ow
        new_h = int(round(oh * scale, 7))
        pad = (ch - new_h) // 2
        return grid[pad:ch - pad, :]
    scale = ch / oh
    new_w = int(round(ow * scale, 7))
    pad = (cw - new_w) // 2
    return grid[:, pad:cw - pad]


def _pack_plan(image_hw, pinpoints, cfg):
    """Static packing geometry shared by the host and device packers:
    (patches_per_side, grid_w, grid_h, unpad row/col crop). All pure
    Python ints, so the device packer can jit with fixed shapes."""
    pp = cfg.image_size // cfg.patch_size
    gw, gh = anyres_grid_shape(image_hw, pinpoints, cfg.image_size)
    oh, ow = image_hw
    ch, cw = gh * pp, gw * pp
    if ow / oh > cw / ch:                 # mirror unpad_feature_grid
        pad = (ch - int(round(oh * (cw / ow), 7))) // 2
        crop = (pad, ch - pad, 0, cw)
    else:
        pad = (cw - int(round(ow * (ch / oh), 7))) // 2
        crop = (0, ch, pad, cw - pad)
    return pp, gw, gh, crop


def pack_anyres_features(tile_features: np.ndarray, image_hw,
                         pinpoints, cfg, image_newline: np.ndarray
                         ) -> np.ndarray:
    """(num_tiles, patches, D) tile features (tile 0 = base image) ->
    (N, D) packed sequence: base features first, then the unpadded
    spatial grid with a newline embedding appended to every row."""
    tile_features = np.asarray(tile_features)
    base = tile_features[0]
    spatial = tile_features[1:]
    pp, gw, gh, (r0, r1, c0, c1) = _pack_plan(image_hw, pinpoints, cfg)
    d = tile_features.shape[-1]

    grid = spatial.reshape(gh, gw, pp, pp, d)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(gh * pp, gw * pp, d)
    grid = grid[r0:r1, c0:c1]
    newline = np.broadcast_to(np.asarray(image_newline),
                              (grid.shape[0], 1, d))
    grid = np.concatenate([grid, newline], axis=1)
    return np.concatenate([base, grid.reshape(-1, d)], axis=0)


def pack_anyres_features_jnp(tile_features, image_hw, pinpoints, cfg,
                             image_newline):
    """Device twin of pack_anyres_features (same plan, jnp ops): keeps
    the ~40 MB of 7B-dims tile features on the device instead of
    round-tripping them through the host for packing -- jit-safe
    because every shape in the plan is static for a given image size."""
    pp, gw, gh, (r0, r1, c0, c1) = _pack_plan(image_hw, pinpoints, cfg)
    base = tile_features[0]
    spatial = tile_features[1:]
    d = tile_features.shape[-1]
    grid = spatial.reshape(gh, gw, pp, pp, d)
    grid = grid.transpose(0, 2, 1, 3, 4).reshape(gh * pp, gw * pp, d)
    grid = grid[r0:r1, c0:c1]
    newline = jnp.broadcast_to(
        jnp.asarray(image_newline, grid.dtype), (grid.shape[0], 1, d))
    grid = jnp.concatenate([grid, newline], axis=1)
    return jnp.concatenate([base, grid.reshape(-1, d)], axis=0)


def _patch_output_size(oh: int, ow: int, th: int, tw: int):
    """HF get_patch_output_size: the dominant axis fills the target, the
    other CEILs (image_processing_llava_next.py)."""
    import math
    scale_w = tw / ow
    scale_h = th / oh
    if scale_w < scale_h:
        return min(math.ceil(oh * scale_w), th), tw
    return th, min(math.ceil(ow * scale_h), tw)


def clip_normalize_jnp(tiles_u8):
    """Device-side CLIP normalization of uint8 tiles: identical f32
    elementwise math to the host ``norm`` below (u8 -> /255 -> -mean
    -> /std, all f32), so uint8 tiles can ship over the wire at 1/4
    the bytes and normalize on device -- bit-parity-tested against the
    host path (tests/test_llava_jax.py)."""
    mean = jnp.asarray(np.float32(CLIP_IMAGE_MEAN))
    std = jnp.asarray(np.float32(CLIP_IMAGE_STD))
    return (tiles_u8.astype(jnp.float32) / jnp.float32(255.0)
            - mean) / std


def preprocess_anyres(image: np.ndarray, pinpoints, cfg,
                      normalize: bool = True) -> Tuple[
        np.ndarray, Tuple[int, int]]:
    """RGB image -> (num_tiles, tile, tile, 3) CLIP-normalized tiles
    (tile 0 = base resize) + the original (h, w).  Byte-parity with the
    HF LlavaNextImageProcessor (PIL bicubic, HF resize rounding, centred
    zero padding before normalization -- verified in tests).

    normalize=False returns the raw uint8 tiles instead (the serving
    scorer ships those over the wire -- 1/4 the bytes of f32 -- and
    applies ``clip_normalize_jnp`` inside its jitted encode)."""
    from PIL import Image
    img = np.asarray(image)
    if img.dtype != np.uint8:
        img = (np.clip(img, 0, 1) * 255).astype(np.uint8)
    if img.ndim == 2:
        img = np.stack([img] * 3, -1)
    oh, ow = img.shape[:2]
    t = cfg.image_size
    pil = Image.fromarray(img)

    def norm(arr):
        if not normalize:
            return arr
        arr = arr.astype(np.float32) / 255.0
        return (arr - CLIP_IMAGE_MEAN) / CLIP_IMAGE_STD

    tiles = [norm(np.asarray(pil.resize((t, t), Image.BICUBIC)))]

    ph, pw = select_best_resolution((oh, ow), pinpoints)
    nh, nw = _patch_output_size(oh, ow, ph, pw)
    resized = np.asarray(pil.resize((nw, nh), Image.BICUBIC))
    canvas = np.zeros((ph, pw, 3), np.uint8)
    y0 = (ph - nh) // 2
    x0 = (pw - nw) // 2
    canvas[y0:y0 + nh, x0:x0 + nw] = resized
    for ty in range(ph // t):
        for tx in range(pw // t):
            tiles.append(norm(canvas[ty * t:(ty + 1) * t,
                                     tx * t:(tx + 1) * t]))
    return np.stack(tiles), (oh, ow)


def llava_next_forward(model: LlavaJax, variables, input_ids,
                       tiles: np.ndarray, image_hw, pinpoints,
                       positions=None, mask=None, caches=None):
    """Anyres forward: encode tiles (jit), pack (host), splice + decode
    (jit). input_ids must contain exactly packed-N image tokens."""
    feats = _VisionProject(model.cfg).apply(variables, jnp.asarray(tiles))
    packed = pack_anyres_features(
        np.asarray(feats), image_hw, pinpoints, model.cfg,
        np.asarray(variables["params"]["image_newline"]))
    return model.apply(variables, input_ids, positions=positions,
                       mask=mask, caches=caches,
                       image_features=jnp.asarray(packed)), packed.shape[0]


def llava_next_generate(model: LlavaJax, variables, input_ids,
                        tiles, image_hw, pinpoints,
                        max_new_tokens: int = 10):
    """Greedy decode through the anyres path."""
    feats = _VisionProject(model.cfg).apply(variables, jnp.asarray(tiles))
    packed = pack_anyres_features(
        np.asarray(feats), image_hw, pinpoints, model.cfg,
        np.asarray(variables["params"]["image_newline"]))
    return greedy_generate_llava(model, variables, input_ids,
                                 image_features=jnp.asarray(packed),
                                 max_new_tokens=max_new_tokens)
