"""Qwen2 / Qwen3 decoders.

Behavioral reference: tensorrt_llm/_torch/models/modeling_qwen.py,
modeling_qwen3.py. Both are Llama-architecture variants:
  * Qwen2: attention projections carry biases.
  * Qwen3: per-head RMS norm on q/k before RoPE (qk_norm_attention.py in
    the reference module set), no attention bias.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaForCausalLM
from .modeling_utils import register_model


@register_model("qwen2")
class Qwen2ForCausalLM(LlamaForCausalLM):
    architectures = ("Qwen2ForCausalLM",)
    # bias loading is automatic: stack_quant picks up `.bias` entries


@register_model("qwen3")
class Qwen3ForCausalLM(LlamaForCausalLM):
    architectures = ("Qwen3ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.use_qk_norm = True

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        params = super().load_hf_state_dict(sd)
        L = self.num_layers
        dtype = self.dtype
        params["layers"]["q_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.q_norm.weight"],
                        dtype=dtype) for i in range(L)])
        params["layers"]["k_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.k_norm.weight"],
                        dtype=dtype) for i in range(L)])
        return params

    def init_params(self, rng):
        # extend the llama dummy state dict with qk-norm weights
        hf = self.hf
        sd_params = super().init_params(rng)
        hd = self.head_dim
        L = self.num_layers
        sd_params["layers"]["q_norm"] = jnp.ones((L, hd), self.dtype)
        sd_params["layers"]["k_norm"] = jnp.ones((L, hd), self.dtype)
        return sd_params

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        spec = super().param_pspecs(params)
        spec["layers"]["q_norm"] = P(None, None)
        spec["layers"]["k_norm"] = P(None, None)
        return spec
