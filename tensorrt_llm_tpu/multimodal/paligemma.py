"""PaliGemma / PaliGemma-2 vision-language model.

Behavioral reference: the reference's paligemma support (multimodal
encoder registry); HF modeling_paligemma.py is the numeric spec.
SigLIP tower (last_hidden_state) → linear projector → divide by
sqrt(text_hidden) (the Gemma embed scale re-multiplies inside the LM).
PaliGemma is a PREFIX-LM: at inference the ENTIRE prompt attends
bidirectionally — the processor assigns image-group 0 to every prompt
token, riding the same per-kv-slot group pool as Gemma3-VL."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gemma import Gemma2ForCausalLM
from ..models.modeling_utils import ModelConfig, register_model
from .encoders import VisionTower
from .processor import mm_hash, register_input_processor


@register_model("paligemma")
class PaliGemmaForConditionalGeneration(Gemma2ForCausalLM):
    architectures = ("PaliGemmaForConditionalGeneration",)
    processor_type = "paligemma"
    uses_mm_groups = True

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        if text_config.model_type not in ("gemma2",):
            raise NotImplementedError(
                "paligemma support covers gemma2 text configs "
                "(PaliGemma-2); gemma-1 text is not implemented")
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        self.image_token_index = self.vlm_config.image_token_index
        self.tower = VisionTower(self.vlm_config.vision_config,
                                 flavor="siglip", dtype=self.dtype)
        self.vision_tokens_per_image = self.tower.num_patches
        self._vision_params = None
        self._projector = None

    def make_kv_pages(self, num_pages: int, page_size: int):
        kv = super().make_kv_pages(num_pages, page_size)
        return {"kv": kv,
                "mm_group": jnp.full((num_pages * page_size,), -1,
                                     jnp.int32)}

    def kv_pspec(self):
        from jax.sharding import PartitionSpec as P
        return {"kv": super().kv_pspec(), "mm_group": P()}

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        pool = kv_pages["mm_group"]
        if metadata.mm_groups_q is not None:
            pool = pool.at[metadata.slot_mapping].set(
                metadata.mm_groups_q, mode="drop")
            metadata = dataclasses.replace(metadata, mm_group_pool=pool)
        logits, kv = super().forward(params, token_ids, kv_pages["kv"],
                                     metadata, input_embeds=input_embeds)
        return logits, {"kv": kv, "mm_group": pool}

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        lm_sd, vis_sd, pj = {}, {}, {}
        for k, v in sd.items():
            k2 = k[len("model."):] if k.startswith("model.") else k
            if k2.startswith("language_model."):
                lm_sd["model." + k2[len("language_model."):]] = v
            elif k2.startswith("vision_tower."):
                vis_sd[k2[len("vision_tower."):]] = v
            elif k2.startswith("multi_modal_projector."):
                pj[k2[len("multi_modal_projector."):]] = v
            elif k2 == "lm_head.weight":
                lm_sd["lm_head.weight"] = v
        dt = self.dtype
        self._vision_params = self.tower.load_hf_state_dict(vis_sd)
        self._projector = {
            "w": jnp.asarray(
                np.ascontiguousarray(np.asarray(pj["linear.weight"]).T),
                dt),
            "b": jnp.asarray(np.asarray(pj["linear.bias"]), dt),
        }
        return super().load_hf_state_dict(lm_sd)

    def init_params(self, rng):
        raise NotImplementedError("paligemma requires checkpoint weights")

    def encode_images(self, pixel_values: np.ndarray) -> np.ndarray:
        h = self.tower(self._vision_params, jnp.asarray(pixel_values),
                       feature_layer=-1, apply_post_ln=True)
        h = jnp.dot(h, self._projector["w"],
                    preferred_element_type=jnp.float32) + \
            self._projector["b"]
        return np.asarray(h / (self.hidden_size ** 0.5), np.float32)


@register_input_processor("paligemma")
class PaliGemmaInputProcessor:
    """Prefix-LM: every PROMPT token gets image-group 0 so the whole
    prefix attends bidirectionally (decode tokens stay causal)."""

    def __init__(self, model):
        self.model = model
        self.image_token = model.image_token_index
        self.tokens_per_image = model.vision_tokens_per_image

    def __call__(self, token_ids: List[int], mm_data: Dict[str, Any]
                 ) -> Tuple[List[int], np.ndarray, str, Dict[str, Any]]:
        images = mm_data.get("image") or []
        if not isinstance(images, (list, tuple)):
            images = [images]
        n_ph = sum(1 for t in token_ids if t == self.image_token)
        if n_ph == len(images):
            out_ids: List[int] = []
            for t in token_ids:
                if t == self.image_token:
                    out_ids.extend([self.image_token]
                                   * self.tokens_per_image)
                else:
                    out_ids.append(t)
        else:
            out_ids = list(token_ids)
        feats = self.model.encode_images(
            np.stack([np.asarray(im, np.float32) for im in images]))
        T = len(out_ids)
        embeds = np.full((T, feats.shape[-1]), np.nan, np.float32)
        pos = [i for i, t in enumerate(out_ids) if t == self.image_token]
        expect = len(images) * self.tokens_per_image
        if len(pos) != expect:
            raise ValueError(
                f"prompt has {len(pos)} image tokens, images supply "
                f"{expect} feature rows")
        embeds[np.asarray(pos, np.int64)] = feats.reshape(-1,
                                                          feats.shape[-1])
        groups = np.zeros(T, np.int32)        # whole prefix bidirectional
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images]), \
            {"mm_group_ids": groups}
