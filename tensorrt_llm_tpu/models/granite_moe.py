"""Granite-MoE decoder.

Behavioral reference: the reference's granite support
(tensorrt_llm/_torch/models/ granite path): Granite's four scalar
multipliers (embedding/attention/residual/logits) combined with a
Mixtral-style MoE whose experts are stored PACKED —
``block_sparse_moe.input_linear.weight`` [E, 2I, H] (gate|up fused) and
``output_linear.weight`` [E, H, I]; router at
``block_sparse_moe.router.layer.weight``."""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .mixtral import MixtralForCausalLM
from .modeling_utils import register_model


@register_model("granitemoe")
class GraniteMoeForCausalLM(MixtralForCausalLM):
    architectures = ("GraniteMoeForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.embedding_multiplier = getattr(hf, "embedding_multiplier", 1.0)
        self.residual_multiplier = getattr(hf, "residual_multiplier", 1.0)
        self.logits_scaling = getattr(hf, "logits_scaling", 1.0)
        am = getattr(hf, "attention_multiplier", None)
        if am:
            self.attn_spec = dataclasses.replace(self.attn_spec,
                                                 sm_scale=am)
        self.renormalize = True     # GraniteMoe softmaxes the top-k

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        sd = dict(sd)
        I = self.intermediate_size
        for i in range(self.num_layers):
            p = f"model.layers.{i}.block_sparse_moe."
            if p + "input_linear.weight" in sd:
                w_in = np.asarray(sd.pop(p + "input_linear.weight"))
                w_out = np.asarray(sd.pop(p + "output_linear.weight"))
                for e in range(self.num_experts):
                    sd[p + f"experts.{e}.w1.weight"] = w_in[e, :I]
                    sd[p + f"experts.{e}.w3.weight"] = w_in[e, I:]
                    sd[p + f"experts.{e}.w2.weight"] = w_out[e]
                sd[p + "gate.weight"] = sd.pop(p + "router.layer.weight")
        return super().load_hf_state_dict(sd)
