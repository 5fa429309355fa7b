"""GLM-4 family decoders (GlmForCausalLM, Glm4ForCausalLM).

Behavioral reference: the reference serves GLM through
tensorrt_llm/_torch/models/modeling_glm.py (glm/glm4 variants). Deltas
on the Llama base: packed ``gate_up_proj`` MLP, q/k/v biases, partial
(0.5) INTERLEAVED rotary embeddings, and for GLM-4 the sandwich
post-sublayer norms (post_self_attn_layernorm / post_mlp_layernorm)."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from ..ops.rope import RopeConfig
from .llama import LlamaForCausalLM
from .modeling_utils import register_model


@register_model("glm")
class GlmForCausalLM(LlamaForCausalLM):
    architectures = ("GlmForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        # interleaved (gpt-j style) partial rotary — both the table
        # config AND the spec flag (attention_block applies spec.is_neox)
        self.attn_spec = dataclasses.replace(
            self.attn_spec,
            is_neox=False,
            rope=RopeConfig(
                head_dim=self.head_dim,
                rope_theta=getattr(hf, "rope_theta", 10000.0),
                max_position_embeddings=hf.max_position_embeddings,
                partial_rotary_factor=getattr(hf, "partial_rotary_factor",
                                              0.5),
                is_neox=False))

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # unpack gate_up_proj -> gate/up for the base loader
        sd = dict(sd)
        I = self.intermediate_size
        for i in range(self.num_layers):
            p = f"model.layers.{i}.mlp."
            if p + "gate_up_proj.weight" in sd:
                w = np.asarray(sd.pop(p + "gate_up_proj.weight"))
                sd[p + "gate_proj.weight"] = w[:I]
                sd[p + "up_proj.weight"] = w[I:]
        return super().load_hf_state_dict(sd)

    def init_params(self, rng):
        # llama dummy init + qkv biases (GLM keeps attention_bias=True)
        params = super().init_params(rng)
        return params


@register_model("glm4")
class Glm4ForCausalLM(GlmForCausalLM):
    architectures = ("Glm4ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.norm_placement = "sandwich"

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().load_hf_state_dict(sd)
        L, dtype = self.num_layers, self.dtype
        params["layers"]["post_attn_extra"] = jnp.stack([
            jnp.asarray(
                sd[f"model.layers.{i}.post_self_attn_layernorm.weight"],
                dtype=dtype) for i in range(L)])
        params["layers"]["post_mlp_extra"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.post_mlp_layernorm.weight"],
                        dtype=dtype) for i in range(L)])
        return params

    def init_params(self, rng):
        L, H = self.num_layers, self.hidden_size
        params = super().init_params(rng)
        ones = jnp.ones((L, H), self.dtype)
        params["layers"]["post_attn_extra"] = ones
        params["layers"]["post_mlp_extra"] = ones
        return params

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        layers = dict(params["layers"])
        layers.pop("post_attn_extra", None)
        layers.pop("post_mlp_extra", None)
        spec = super().param_pspecs({**params, "layers": layers})
        spec["layers"]["post_attn_extra"] = P(None, None)
        spec["layers"]["post_mlp_extra"] = P(None, None)
        return spec
