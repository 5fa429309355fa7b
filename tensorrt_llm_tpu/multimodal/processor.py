"""Multimodal input processors: text+image → (token_ids, prompt_embeds).

Behavioral reference: tensorrt_llm/inputs/registry.py (input processor
registry + mm hashing, inputs/multimodal.py MultimodalParams) — each VLM
registers a processor that expands image placeholders, runs the vision
encoder + projector, and hands the engine a NaN-masked embedding table
(text rows NaN → embedding lookup; image rows carry vision features).

The mm hash doubles as the KV-reuse salt: two requests share cached
prefix blocks only when BOTH the token ids and the image bytes match
(reference: multimodal hashing for kv-cache reuse).
"""
from __future__ import annotations

import hashlib
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

INPUT_PROCESSOR_REGISTRY: Dict[str, Callable] = {}


def register_input_processor(*model_types: str):
    def deco(cls):
        for mt in model_types:
            INPUT_PROCESSOR_REGISTRY[mt] = cls
        return cls
    return deco


def create_input_processor(model) -> Optional[Any]:
    mt = getattr(model.hf, "model_type", None) or \
        getattr(getattr(model, "vlm_config", None), "model_type", None)
    cls = INPUT_PROCESSOR_REGISTRY.get(getattr(model, "processor_type", mt))
    return cls(model) if cls is not None else None


def mm_hash(images: Sequence[np.ndarray]) -> str:
    """Content hash of the image set (reference: mm-hash reuse keys)."""
    h = hashlib.sha256()
    for im in images:
        arr = np.ascontiguousarray(np.asarray(im))
        h.update(str(arr.shape).encode())
        h.update(arr.tobytes())
    return "mm-" + h.hexdigest()[:32]


@register_input_processor("llava")
class LlavaInputProcessor:
    """LLaVA-1.5-style: CLIP penultimate-layer patch features (CLS
    dropped) through a 2-layer GELU projector, spliced at the expanded
    image-token positions."""

    def __init__(self, model):
        self.model = model                 # LlavaForConditionalGeneration
        self.image_token = model.image_token_index
        self.tokens_per_image = model.vision_tokens_per_image

    def expand_placeholders(self, token_ids: List[int],
                            num_images: int) -> List[int]:
        """One placeholder per image → tokens_per_image copies (HF
        processors pre-expand; raw id prompts may carry single
        markers)."""
        n_ph = sum(1 for t in token_ids if t == self.image_token)
        if n_ph == num_images * self.tokens_per_image:
            return list(token_ids)
        out = []
        for t in token_ids:
            if t == self.image_token:
                out.extend([self.image_token] * self.tokens_per_image)
            else:
                out.append(t)
        return out

    def __call__(self, token_ids: List[int],
                 mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], np.ndarray, str]:
        images = mm_data.get("image") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        token_ids = self.expand_placeholders(list(token_ids), len(images))
        feats = self.model.encode_images(
            np.stack([np.asarray(im, np.float32) for im in images]))
        feats = np.asarray(feats)          # [n, tokens_per_image, H]
        T = len(token_ids)
        H = feats.shape[-1]
        embeds = np.full((T, H), np.nan, np.float32)
        pos = [i for i, t in enumerate(token_ids) if t == self.image_token]
        expect = len(images) * self.tokens_per_image
        if len(pos) != expect:
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{expect} feature rows")
        embeds[np.asarray(pos, np.int64)] = feats.reshape(-1, H)
        return token_ids, embeds, mm_hash(images)
