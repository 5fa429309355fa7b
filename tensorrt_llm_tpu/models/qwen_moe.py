"""Qwen2-MoE and Qwen3-MoE decoders.

Behavioral reference: tensorrt_llm/_torch/models/modeling_qwen_moe.py,
modeling_qwen3_moe.py. Both are Mixtral-shaped sparse MoE models with
different trims:

  * Qwen2-MoE: softmax routing WITHOUT top-k renormalization
    (norm_topk_prob=False) plus an always-on shared expert whose output
    is scaled by a per-token sigmoid gate.
  * Qwen3-MoE: renormalized routing, per-head q/k RMSNorm (the Qwen3
    attention), no shared expert.
"""
from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .mixtral import MixtralForCausalLM
from .modeling_utils import quantize_linear, register_model


class _QwenMoeBase(MixtralForCausalLM):
    """Weight naming shared by Qwen2/Qwen3 MoE: mlp.gate (router),
    mlp.experts.{e}.{gate,up,down}_proj."""

    @property
    def moe_intermediate(self) -> int:
        return self.hf.moe_intermediate_size

    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        hf = self.hf
        H, E, L = self.hidden_size, self.num_experts, self.num_layers
        I = self.moe_intermediate
        V = self.vocab_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        r = np.random.default_rng(0)

        def mat(shape):
            return r.standard_normal(shape, np.float32) * 0.02

        sd: Dict[str, np.ndarray] = {
            "model.embed_tokens.weight": mat((V, H)),
            "model.norm.weight": np.ones(H, np.float32),
            "lm_head.weight": mat((V, H)),
        }
        for i in range(L):
            for name, shape in [("self_attn.q_proj", (nq * hd, H)),
                                ("self_attn.k_proj", (nkv * hd, H)),
                                ("self_attn.v_proj", (nkv * hd, H)),
                                ("self_attn.o_proj", (H, nq * hd))]:
                sd[f"model.layers.{i}.{name}.weight"] = mat(shape)
            sd[f"model.layers.{i}.mlp.gate.weight"] = mat((E, H))
            for e in range(E):
                for n2, shape in [("gate_proj", (I, H)), ("up_proj", (I, H)),
                                  ("down_proj", (H, I))]:
                    sd[f"model.layers.{i}.mlp.experts.{e}.{n2}.weight"] = \
                        mat(shape)
            sd[f"model.layers.{i}.input_layernorm.weight"] = \
                np.ones(H, np.float32)
            sd[f"model.layers.{i}.post_attention_layernorm.weight"] = \
                np.ones(H, np.float32)
            if self.has_shared_expert:
                SI = self.hf.shared_expert_intermediate_size
                sd[f"model.layers.{i}.mlp.shared_expert.gate_proj.weight"] = \
                    mat((SI, H))
                sd[f"model.layers.{i}.mlp.shared_expert.up_proj.weight"] = \
                    mat((SI, H))
                sd[f"model.layers.{i}.mlp.shared_expert.down_proj.weight"] = \
                    mat((H, SI))
                sd[f"model.layers.{i}.mlp.shared_expert_gate.weight"] = \
                    mat((1, H))
            if self.use_qk_norm:
                sd[f"model.layers.{i}.self_attn.q_norm.weight"] = \
                    np.ones(hd, np.float32)
                sd[f"model.layers.{i}.self_attn.k_norm.weight"] = \
                    np.ones(hd, np.float32)
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # remap qwen naming onto the mixtral loader's expectations
        remap = {}
        for k, v in sd.items():
            k = k.replace("mlp.gate.weight", "block_sparse_moe.gate.weight")
            k = k.replace("mlp.experts.", "block_sparse_moe.experts.")
            k = k.replace(".gate_proj.weight", ".w1.weight") \
                if "experts." in k else k
            k = k.replace(".up_proj.weight", ".w3.weight") \
                if "experts." in k else k
            k = k.replace(".down_proj.weight", ".w2.weight") \
                if "experts." in k else k
            remap[k] = v
        params = super().load_hf_state_dict(remap)
        L, dtype = self.num_layers, self.dtype

        def t(name):
            return np.ascontiguousarray(np.transpose(sd[name]))

        def stack(method, fmt):
            per = [quantize_linear(method, t(fmt.format(i)), dtype=dtype)
                   for i in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        if self.has_shared_expert:
            layers = params["layers"]
            layers["se_gate"] = stack(
                self.m_mlp, "model.layers.{}.mlp.shared_expert.gate_proj.weight")
            layers["se_up"] = stack(
                self.m_mlp, "model.layers.{}.mlp.shared_expert.up_proj.weight")
            layers["se_down"] = stack(
                self.m_mlp, "model.layers.{}.mlp.shared_expert.down_proj.weight")
            if getattr(self, "shared_expert_gated", True):
                layers["se_gate_w"] = jnp.stack([
                    jnp.asarray(
                        t(f"model.layers.{i}.mlp.shared_expert_gate.weight"),
                        dtype=dtype) for i in range(L)])
        if self.use_qk_norm:
            layers = params["layers"]
            layers["q_norm"] = jnp.stack([
                jnp.asarray(sd[f"model.layers.{i}.self_attn.q_norm.weight"],
                            dtype=dtype) for i in range(L)])
            layers["k_norm"] = jnp.stack([
                jnp.asarray(sd[f"model.layers.{i}.self_attn.k_norm.weight"],
                            dtype=dtype) for i in range(L)])
        return params

    def param_pspecs(self, params) -> Any:
        from jax.sharding import PartitionSpec as P
        extra = ("se_gate", "se_up", "se_down", "se_gate_w",
                 "q_norm", "k_norm")
        trimmed = {**params,
                   "layers": {k: v for k, v in params["layers"].items()
                              if k not in extra}}
        spec = super().param_pspecs(trimmed)
        for k in extra:
            if k in params["layers"]:
                v = params["layers"][k]
                nd = v["weight"].ndim if isinstance(v, dict) else v.ndim
                if isinstance(v, dict):
                    spec["layers"][k] = jax.tree.map(
                        lambda a: P(*([None] * a.ndim)), v)
                else:
                    spec["layers"][k] = P(*([None] * nd))
        return spec


@register_model("qwen2_moe")
class Qwen2MoeForCausalLM(_QwenMoeBase):
    architectures = ("Qwen2MoeForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.num_experts = hf.num_experts
        self.renormalize = getattr(hf, "norm_topk_prob", False)
        self.has_shared_expert = True
        if getattr(hf, "mlp_only_layers", None) or \
                getattr(hf, "decoder_sparse_step", 1) != 1:
            raise NotImplementedError(
                "qwen2_moe with dense interleaved layers not supported")


@register_model("qwen3_moe")
class Qwen3MoeForCausalLM(_QwenMoeBase):
    architectures = ("Qwen3MoeForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.num_experts = hf.num_experts
        self.renormalize = getattr(hf, "norm_topk_prob", True)
        self.use_qk_norm = True


@register_model("olmoe")
class OlmoeForCausalLM(_QwenMoeBase):
    """OLMoE: qwen-moe weight naming, FULL-projection qk RMS norms,
    softmax-then-topk routing WITHOUT renormalization
    (norm_topk_prob=False default). Reference serves it via the
    AutoModel fallback; here it is a first-class family."""
    architectures = ("OlmoeForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.use_qk_norm = True
        self.qk_norm_full = True
        self.renormalize = bool(getattr(self.hf, "norm_topk_prob", False))
        self.has_shared_expert = False

    @property
    def moe_intermediate(self) -> int:
        return self.hf.intermediate_size

    def init_params(self, rng):
        # base writes per-head-dim qk norm dummies; OLMoE norms span the
        # full projections
        import numpy as _np
        sd_build = super().init_params
        # easiest: build the dummy state dict by calling the base's
        # generator with patched shapes — replicate minimal logic here
        hf = self.hf
        H, E, L = self.hidden_size, self.num_experts, self.num_layers
        I = self.moe_intermediate
        V = self.vocab_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        r = _np.random.default_rng(0)

        def mat(shape):
            return r.standard_normal(shape, _np.float32) * 0.02

        sd = {"model.embed_tokens.weight": mat((V, H)),
              "model.norm.weight": _np.ones(H, _np.float32),
              "lm_head.weight": mat((V, H))}
        for i in range(L):
            p = f"model.layers.{i}."
            sd[p + "self_attn.q_proj.weight"] = mat((nq * hd, H))
            sd[p + "self_attn.k_proj.weight"] = mat((nkv * hd, H))
            sd[p + "self_attn.v_proj.weight"] = mat((nkv * hd, H))
            sd[p + "self_attn.o_proj.weight"] = mat((H, nq * hd))
            sd[p + "self_attn.q_norm.weight"] = _np.ones(nq * hd,
                                                         _np.float32)
            sd[p + "self_attn.k_norm.weight"] = _np.ones(nkv * hd,
                                                         _np.float32)
            sd[p + "mlp.gate.weight"] = mat((E, H))
            for e in range(E):
                for n2, shape in [("gate_proj", (I, H)),
                                  ("up_proj", (I, H)),
                                  ("down_proj", (H, I))]:
                    sd[p + f"mlp.experts.{e}.{n2}.weight"] = mat(shape)
            sd[p + "input_layernorm.weight"] = _np.ones(H, _np.float32)
            sd[p + "post_attention_layernorm.weight"] = \
                _np.ones(H, _np.float32)
        return self.load_hf_state_dict(sd)
