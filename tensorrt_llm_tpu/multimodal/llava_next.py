"""LLaVA-Next (LLaVA-1.6) anyres tiling.

Behavioral reference: tensorrt_llm/_torch/models/modeling_llava_next.py;
HF modeling_llava_next.py is the numeric spec. On top of LLaVA-1.5:
images are tiled at the best grid from ``image_grid_pinpoints``
(base image + spatial tiles), tile features are re-assembled into the
2D layout, UNPADDED back to the original aspect ratio, and an
``image_newline`` embedding is appended per spatial row. Feature packing
runs host-side in numpy (once per request); the CLIP tower + projector
run on device."""
from __future__ import annotations

import dataclasses
import math
from typing import Any, Dict, List, Tuple

import numpy as np

from ..models.modeling_utils import ModelConfig, register_model
from .llava import LlavaForConditionalGeneration
from .processor import mm_hash, register_input_processor


def select_best_resolution(orig_hw: Tuple[int, int],
                           possible: List[List[int]]) -> Tuple[int, int]:
    """HF select_best_resolution: maximize effective resolution, then
    minimize wasted area."""
    oh, ow = orig_hw
    best, best_fit, min_waste = None, 0, None
    for h, w in possible:
        scale = min(w / ow, h / oh)
        dw, dh = int(ow * scale), int(oh * scale)
        eff = min(dw * dh, ow * oh)
        waste = (w * h) - eff
        if eff > best_fit or (eff == best_fit and
                              (min_waste is None or waste < min_waste)):
            best_fit, min_waste, best = eff, waste, (h, w)
    return best


def get_anyres_image_grid_shape(image_size, pinpoints, patch_size):
    h, w = select_best_resolution(tuple(image_size), pinpoints)
    return h // patch_size, w // patch_size


def unpad_image(tensor: np.ndarray, original_size) -> np.ndarray:
    """Remove the letterbox padding ([C, H, W] feature grid); exact HF
    unpad_image semantics (round-then-floor padding)."""
    oh, ow = original_size
    ch, cw = tensor.shape[1], tensor.shape[2]
    if ow / oh > cw / ch:
        new_h = int(round(oh * (cw / ow), 7))
        pad = (ch - new_h) // 2
        return tensor[:, pad:ch - pad, :]
    new_w = int(round(ow * (ch / oh), 7))
    pad = (cw - new_w) // 2
    return tensor[:, :, pad:cw - pad]


@register_model("llava_next")
class LlavaNextForConditionalGeneration(LlavaForConditionalGeneration):
    architectures = ("LlavaNextForConditionalGeneration",)
    processor_type = "llava_next"

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        self._image_newline = None

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        key = "model.image_newline" if "model.image_newline" in sd \
            else "image_newline"
        self._image_newline = np.asarray(sd[key], np.float32)
        return super().load_hf_state_dict(sd)


@register_input_processor("llava_next")
class LlavaNextInputProcessor:
    """Anyres feature assembly. ``mm_data`` carries HF-image-processor
    outputs: ``image`` = list of per-image tile stacks
    [num_tiles, 3, s, s] and ``image_sizes`` = [(H, W), ...]."""

    def __init__(self, model):
        self.model = model
        self.image_token = model.image_token_index
        cfg = model.vlm_config
        self.pinpoints = cfg.image_grid_pinpoints
        self.vis_size = cfg.vision_config.image_size
        self.grid = self.vis_size // cfg.vision_config.patch_size

    def _pack_one(self, feats: np.ndarray, image_size) -> np.ndarray:
        """feats [num_tiles, g*g, H] → packed [n_tokens, H] (HF
        pack_image_features semantics)."""
        g = self.grid
        H = feats.shape[-1]
        nl = self.model._image_newline
        if feats.shape[0] == 1:
            return np.concatenate([feats[0], nl[None]], axis=0)
        base, tiles = feats[0], feats[1:]
        nph, npw = get_anyres_image_grid_shape(
            image_size, self.pinpoints, self.vis_size)
        f = tiles.reshape(nph, npw, g, g, H)
        f = np.transpose(f, (4, 0, 2, 1, 3))            # [H, nph, g, npw, g]
        f = f.reshape(H, nph * g, npw * g)
        f = unpad_image(f, image_size)
        newline = np.broadcast_to(
            nl.astype(f.dtype)[:, None, None], (H, f.shape[1], 1))
        f = np.concatenate([f, newline], axis=2)
        f = f.reshape(H, -1).T                          # [rows*(cols+1), H]
        return np.concatenate([base, f], axis=0)

    def __call__(self, token_ids: List[int], mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], np.ndarray, str]:
        images = mm_data.get("image") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        sizes = mm_data.get("image_sizes")
        if sizes is None:
            raise ValueError("llava_next needs mm_data['image_sizes']")
        packed = []
        for tiles, sz in zip(images, sizes):
            tiles = np.asarray(tiles, np.float32)
            feats = np.asarray(self.model.encode_images(tiles))
            packed.append(self._pack_one(feats, tuple(int(x)
                                                      for x in sz)))
        # expand one placeholder per image to its packed length
        out_ids: List[int] = []
        img_i = 0
        n_ph = sum(1 for t in token_ids if t == self.image_token)
        for t in token_ids:
            if t == self.image_token and n_ph == len(images):
                out_ids.extend([self.image_token] * len(packed[img_i]))
                img_i += 1
            else:
                out_ids.append(t)
        T = len(out_ids)
        H = packed[0].shape[-1]
        embeds = np.full((T, H), np.nan, np.float32)
        pos = [i for i, t in enumerate(out_ids) if t == self.image_token]
        allfeat = np.concatenate(packed, axis=0)
        if len(pos) != len(allfeat):
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{len(allfeat)} feature rows")
        embeds[np.asarray(pos, np.int64)] = allfeat
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images])
