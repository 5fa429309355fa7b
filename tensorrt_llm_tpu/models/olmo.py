"""AI2 OLMo-2 decoder.

Behavioral reference: HF transformers Olmo2ForCausalLM numerics (the
reference serves OLMo through its llama-family path). Differences from
Llama: RMSNorm applied to the attention/MLP OUTPUTS (reordered
residual), and q/k RMSNorm over the full projected vector before RoPE.
HF names: post_attention_layernorm (after attention) and
post_feedforward_layernorm (after MLP) — mapped onto the llama param
slots input_norm/post_norm with the "post" placement knob.
"""
from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from .llama import LlamaForCausalLM
from .modeling_utils import register_model


@register_model("olmo2")
class Olmo2ForCausalLM(LlamaForCausalLM):
    architectures = ("Olmo2ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.use_qk_norm = True
        self.qk_norm_full = True
        self.norm_placement = "post"

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # map output-norm names onto the llama slots
        remap = {}
        for k, v in sd.items():
            k = k.replace("post_attention_layernorm", "input_layernorm")
            k = k.replace("post_feedforward_layernorm",
                          "post_attention_layernorm")
            remap[k] = v
        params = super().load_hf_state_dict(remap)
        L, dtype = self.num_layers, self.dtype
        params["layers"]["q_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.q_norm.weight"],
                        dtype=dtype) for i in range(L)])
        params["layers"]["k_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.k_norm.weight"],
                        dtype=dtype) for i in range(L)])
        return params

    def init_params(self, rng):
        params = super().init_params(rng)
        L = self.num_layers
        params["layers"]["q_norm"] = jnp.ones(
            (L, self.num_heads * self.head_dim), self.dtype)
        params["layers"]["k_norm"] = jnp.ones(
            (L, self.num_kv_heads * self.head_dim), self.dtype)
        return params

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        spec = super().param_pspecs(params)
        pp = "pp" if self.config.mapping.pp_size > 1 else None
        spec["layers"]["q_norm"] = P(pp, None)
        spec["layers"]["k_norm"] = P(pp, None)
        return spec
