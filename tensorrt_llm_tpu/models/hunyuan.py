"""HunYuan v1 dense + MoE and SeedOSS decoders.

Behavioral reference: tensorrt_llm/_torch/models/modeling_hunyuan_dense
.py / modeling_hunyuan_moe.py / modeling_seedoss.py; HF
modeling_hunyuan_v1_* and modeling_seed_oss are the numeric specs.

  * HunYuanDenseV1: llama body + per-head-dim q/k RMSNorm named
    ``query_layernorm``/``key_layernorm``.
  * HunYuanMoEV1: mixtral-shaped MoE (softmax→topk→renorm), router at
    ``mlp.gate.wg``, plus an always-on UNGATED shared MLP
    (``mlp.shared_mlp``), same qk norms.
  * SeedOSS: llama with q/k/v biases (attention_bias=True,
    attention_out_bias=False) — the stacked loader picks biases up
    automatically.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np

from .llama import LlamaForCausalLM
from .modeling_utils import register_model
from .qwen import Qwen3ForCausalLM
from .qwen_moe import _QwenMoeBase


def _remap_hunyuan(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    out = {}
    for k, v in sd.items():
        k = k.replace("self_attn.query_layernorm.", "self_attn.q_norm.")
        k = k.replace("self_attn.key_layernorm.", "self_attn.k_norm.")
        k = k.replace("mlp.gate.wg.weight", "mlp.gate.weight")
        k = k.replace("mlp.shared_mlp.", "mlp.shared_expert.")
        out[k] = v
    return out


@register_model("hunyuan_v1_dense")
class HunYuanDenseV1ForCausalLM(Qwen3ForCausalLM):
    architectures = ("HunYuanDenseV1ForCausalLM",)

    def load_hf_state_dict(self, sd):
        return super().load_hf_state_dict(_remap_hunyuan(sd))


@register_model("hunyuan_v1_moe")
class HunYuanMoEV1ForCausalLM(_QwenMoeBase):
    architectures = ("HunYuanMoEV1ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.num_experts = hf.num_experts
        self.renormalize = True
        self.use_qk_norm = True
        self.has_shared_expert = True
        self.shared_expert_gated = False
        tk = getattr(hf, "moe_topk", 1)
        self.top_k = tk[0] if isinstance(tk, (list, tuple)) else tk

    @property
    def moe_intermediate(self) -> int:
        mi = getattr(self.hf, "moe_intermediate_size", None) or \
            self.hf.intermediate_size
        return mi[0] if isinstance(mi, (list, tuple)) else mi

    def load_hf_state_dict(self, sd):
        return super().load_hf_state_dict(_remap_hunyuan(sd))

    def init_params(self, rng):
        import torch
        from transformers import HunYuanMoEV1ForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)


@register_model("seed_oss")
class SeedOssForCausalLM(LlamaForCausalLM):
    architectures = ("SeedOssForCausalLM",)


@register_model("ernie4_5")
class Ernie45ForCausalLM(LlamaForCausalLM):
    """Ernie 4.5 dense: llama body with GLM-style INTERLEAVED rotary
    (optional qkv biases picked up by the stacked loader). Reference:
    the ernie rows of the reference model matrix."""
    architectures = ("Ernie4_5ForCausalLM",)

    def __init__(self, model_config):
        import dataclasses as _dc
        super().__init__(model_config)
        self.attn_spec = _dc.replace(
            self.attn_spec, is_neox=False,
            rope=_dc.replace(self.attn_spec.rope, is_neox=False))
