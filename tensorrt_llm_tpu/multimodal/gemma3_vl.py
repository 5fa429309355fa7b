"""Gemma3 vision-language model (Gemma3ForConditionalGeneration).

Behavioral reference: tensorrt_llm/_torch/models/modeling_gemma3vl.py;
HF modeling_gemma3.py is the numeric spec. SigLIP tower
(last_hidden_state incl. post-LN) → average-pool the patch grid down to
``mm_tokens_per_image`` → zero-centered RMSNorm → a learned [vis_h,
text_h] projection — spliced into the Gemma3 text model. Image tokens
attend BIDIRECTIONALLY within their image (HF token_type_ids or-mask):
per-token image-group ids ride ``metadata.mm_groups_q`` and a
persistent per-kv-slot group pool lives in the cache pytree, scattered
alongside KV writes so chunked prefill and decode see earlier images.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.gemma import Gemma3ForCausalLM
from ..models.modeling_utils import ModelConfig, register_model
from .encoders import VisionTower
from .processor import mm_hash, register_input_processor


@register_model("gemma3", "gemma3_vl")
class Gemma3ForConditionalGeneration(Gemma3ForCausalLM):
    architectures = ("Gemma3ForConditionalGeneration",)
    processor_type = "gemma3_vl"
    uses_mm_groups = True

    def __init__(self, model_config: ModelConfig):
        self.vlm_config = model_config.hf_config
        text_config = model_config.hf_config.text_config
        super().__init__(dataclasses.replace(model_config,
                                             hf_config=text_config))
        vc = self.vlm_config.vision_config
        self.image_token_index = getattr(
            self.vlm_config, "image_token_id",
            getattr(self.vlm_config, "image_token_index", None))
        self.mm_tokens_per_image = self.vlm_config.mm_tokens_per_image
        self.tower = VisionTower(vc, flavor="siglip", dtype=self.dtype)
        self._vision_params = None
        self._projector = None
        self._encode_fn = None

    # cache pytree: paged KV + the per-slot image-group pool ----------- #
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

    # weights ----------------------------------------------------------- #
    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]):
        lm_sd, vis_sd = {}, {}
        pj = {}
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
            # zero-centered gamma (Gemma3RMSNorm): fold the +1 at load
            "norm": jnp.asarray(
                np.asarray(pj["mm_soft_emb_norm.weight"]) + 1.0, dt),
            "proj": jnp.asarray(
                np.asarray(pj["mm_input_projection_weight"]), dt),
        }
        return super().load_hf_state_dict(lm_sd)

    def init_params(self, rng):
        raise NotImplementedError("gemma3_vl requires checkpoint weights")

    # vision ------------------------------------------------------------ #
    def encode_images(self, pixel_values: np.ndarray) -> jnp.ndarray:
        """[B, 3, H, W] → [B, mm_tokens_per_image, text_hidden]."""
        if self._encode_fn is None:
            grid = self.tower.image_size // self.tower.patch
            side = int(self.mm_tokens_per_image ** 0.5)
            ks = grid // side
            eps = getattr(self.vlm_config.vision_config,
                          "layer_norm_eps", 1e-6)

            @jax.jit
            def run(vis_params, proj, pixels):
                h = self.tower(vis_params, pixels, feature_layer=-1,
                               apply_post_ln=True)    # [B, grid*grid, D]
                B, _, D = h.shape
                h = h.reshape(B, grid, grid, D)
                h = h.reshape(B, side, ks, side, ks, D).mean((2, 4))
                h = h.reshape(B, side * side, D)
                hf32 = h.astype(jnp.float32)
                var = jnp.mean(jnp.square(hf32), -1, keepdims=True)
                h = (hf32 * jax.lax.rsqrt(var + eps) *
                     proj["norm"].astype(jnp.float32)).astype(self.dtype)
                return jnp.einsum("btd,dh->bth", h, proj["proj"])
            self._encode_fn = run
        return self._encode_fn(self._vision_params, self._projector,
                               jnp.asarray(pixel_values))


@register_input_processor("gemma3_vl")
class Gemma3VLInputProcessor:
    """mm_data: ``image`` = list of [3, H, W] arrays at the SigLIP input
    size. Placeholders expand to mm_tokens_per_image; per-token image
    group ids ride the request for the bidirectional mask."""

    def __init__(self, model):
        self.model = model
        self.image_token = model.image_token_index
        self.tokens_per_image = model.mm_tokens_per_image

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
        feats = np.asarray(self.model.encode_images(
            np.stack([np.asarray(im, np.float32) for im in images])))
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
        # image-group ids: consecutive runs of image tokens per image
        groups = np.full(T, -1, np.int32)
        for g in range(len(images)):
            idx = pos[g * self.tokens_per_image:
                      (g + 1) * self.tokens_per_image]
            groups[np.asarray(idx, np.int64)] = g
        return out_ids, embeds, mm_hash([np.asarray(i) for i in images]), \
            {"mm_group_ids": groups}
