"""Phi-3 decoder.

Behavioral reference: tensorrt_llm/_torch/models/modeling_phi3.py. A
Llama-architecture variant whose HF checkpoint stores fused projections:
``qkv_proj`` [(<nq+2nkv>)*hd, H] and ``gate_up_proj`` [2I, H]. We split
them at load into the per-projection layout (the GSPMD-safe form — see
modeling_utils.attention_block) and reuse the Llama forward unchanged.

Note: Phi-3's ``longrope`` scaling applies distinct short/long factors
beyond original_max_position_embeddings; within the original window the
unscaled table is exact, which is what we use (long-factor support tracked
for the long-context round).
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .llama import LlamaForCausalLM
from .modeling_utils import register_model


@register_model("phi3")
class Phi3ForCausalLM(LlamaForCausalLM):
    architectures = ("Phi3ForCausalLM",)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        I = self.intermediate_size
        split = {}
        for name, w in sd.items():
            if "qkv_proj.weight" in name:
                q, k, v = np.split(np.asarray(w),
                                   [nq * hd, nq * hd + nkv * hd], axis=0)
                split[name.replace("qkv_proj", "q_proj")] = q
                split[name.replace("qkv_proj", "k_proj")] = k
                split[name.replace("qkv_proj", "v_proj")] = v
            elif "gate_up_proj.weight" in name:
                g, u = np.split(np.asarray(w), [I], axis=0)
                split[name.replace("gate_up_proj", "gate_proj")] = g
                split[name.replace("gate_up_proj", "up_proj")] = u
            else:
                split[name] = w
        return super().load_hf_state_dict(split)
