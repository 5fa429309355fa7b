"""LLaVA vision-language model.

Behavioral reference: tensorrt_llm/_torch/models/modeling_llava_next.py
family (the LLaVA-1.5 path): CLIP vision tower → penultimate-layer
patch features (CLS dropped) → 2-layer GELU projector → spliced into
the language model's embedding stream. The LM half IS the scan-stacked
Llama decoder; vision runs as a separate jitted program outside the
decode hot loop (the reference's separate mm-encoder stage)."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaForCausalLM
from ..models.modeling_utils import ModelConfig, register_model
from .encoders import VisionTower


@register_model("llava")
class LlavaForConditionalGeneration(LlamaForCausalLM):
    architectures = ("LlavaForConditionalGeneration",)
    processor_type = "llava"

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        lm_config = dataclasses.replace(model_config, hf_config=text_config)
        super().__init__(lm_config)
        vc = self.vlm_config.vision_config
        self.image_token_index = self.vlm_config.image_token_index
        self.vision_feature_layer = getattr(
            self.vlm_config, "vision_feature_layer", -2)
        self.vision_select = getattr(
            self.vlm_config, "vision_feature_select_strategy", "default")
        self.tower = VisionTower(vc, flavor="clip", dtype=self.dtype)
        self.vision_tokens_per_image = self.tower.num_patches \
            if self.vision_select == "default" else self.tower.num_pos
        self._vision_params = None
        self._projector = None
        self._encode_fn = None

    # -- weights -----------------------------------------------------------
    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        sd = dict(sd)
        lm_sd = {}
        vis_sd = {}
        for k, v in sd.items():
            k2 = k[len("model."):] if k.startswith("model.") else k
            if k2.startswith("language_model."):
                lm_sd["model." + k2[len("language_model."):]] = v
            elif k2.startswith("vision_tower."):
                vis_sd[k2[len("vision_tower."):]] = v
            elif k2 == "lm_head.weight" or k == "lm_head.weight":
                lm_sd["lm_head.weight"] = v
        dt = self.dtype
        self._vision_params = self.tower.load_hf_state_dict(vis_sd)
        pj = "multi_modal_projector."

        def t(name):
            return jnp.asarray(
                np.ascontiguousarray(np.asarray(sd[name]).T), dt)
        self._projector = {
            "l1": {"weight": t("model." + pj + "linear_1.weight"),
                   "bias": jnp.asarray(sd["model." + pj + "linear_1.bias"],
                                       dt)},
            "l2": {"weight": t("model." + pj + "linear_2.weight"),
                   "bias": jnp.asarray(sd["model." + pj + "linear_2.bias"],
                                       dt)},
        }
        return super().load_hf_state_dict(lm_sd)

    def init_params(self, rng):
        raise NotImplementedError(
            "llava requires checkpoint weights (vision tower has no "
            "dummy init path)")

    # -- vision ------------------------------------------------------------
    def encode_images(self, pixel_values: np.ndarray) -> jnp.ndarray:
        """[B, 3, H, W] → projected features [B, tokens_per_image, H_lm]."""
        if self._encode_fn is None:
            import functools

            @functools.partial(jax.jit)
            def run(vis_params, proj, pixels):
                h = self.tower(vis_params, pixels,
                               feature_layer=self.vision_feature_layer)
                if self.vision_select == "default":
                    h = h[:, 1:]            # drop CLS
                x = jnp.dot(h, proj["l1"]["weight"],
                            preferred_element_type=jnp.float32) \
                    .astype(self.dtype) + proj["l1"]["bias"]
                x = jax.nn.gelu(x.astype(jnp.float32), approximate=False)
                x = jnp.dot(x.astype(self.dtype), proj["l2"]["weight"],
                            preferred_element_type=jnp.float32) \
                    .astype(self.dtype) + proj["l2"]["bias"]
                return x
            self._encode_fn = run
        return self._encode_fn(self._vision_params, self._projector,
                               jnp.asarray(pixel_values))
