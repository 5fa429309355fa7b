"""Llama-architecture variants: EXAONE-4, SmolLM3, Helium, Arcee.

Behavioral references: tensorrt_llm/_torch/models/modeling_exaone4.py
(post-norm + QK-norm + rope-on-sliding-only), and the HF architectures
for SmolLM3 (NoPE every 4th layer) / Helium (plain llama shape) which
the reference serves through its AutoModel fallback. Each variant is a
thin delta on the scan-stacked Llama base: per-layer flags ride the
scan, rope variants select via the ``_rope_variants``/``_layer_rope``
hooks.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .llama import LlamaForCausalLM
from .modeling_utils import register_model


@register_model("exaone4")
class Exaone4ForCausalLM(LlamaForCausalLM):
    """EXAONE-4.0: pure post-norm residuals (sublayer OUTPUT normed, no
    input norms), per-head QK RMS norm, 3:1 sliding/global alternation
    with RoPE applied ONLY on sliding layers (global layers are NoPE)."""
    architectures = ("Exaone4ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.use_qk_norm = True
        self.norm_placement = "post"
        hf = self.hf
        sw = getattr(hf, "sliding_window", None)
        self._layer_sliding = [
            lt == "sliding_attention"
            for lt in (getattr(hf, "layer_types", None) or
                       [("sliding_attention" if sw else "full_attention")]
                       * self.num_layers)]
        if sw and any(self._layer_sliding):
            # the base spec inherits hf.sliding_window — the global
            # (full-attention, NoPE) layers must NOT carry the window
            self.attn_spec = dataclasses.replace(
                self.attn_spec, sliding_window=None)
            self.sliding_spec = dataclasses.replace(
                self.attn_spec, sliding_window=sw)

    # rope only on sliding layers (all layers when no sliding config)
    def _rope_variants(self, positions, cos_sin):
        cos, sin = cos_sin
        return (cos, sin, jnp.ones_like(cos), jnp.zeros_like(sin))

    def _layer_rope(self, layer, variants):
        cos, sin, one, zero = variants
        if self.sliding_spec is None:
            return cos, sin
        use = layer["is_sliding"]
        return jnp.where(use, cos, one), jnp.where(use, sin, zero)

    def _extra_layer_arrays(self, params):
        L = self.num_layers
        params["layers"]["is_sliding"] = jnp.asarray(
            self._layer_sliding[:L], jnp.bool_)
        return params

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        # post-norm weight names -> the base loader's slots: the "post"
        # placement norms the attn output with `input_norm` and the mlp
        # output with `post_norm`
        sd = dict(sd)
        for i in range(self.num_layers):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = \
                sd[p + "post_attention_layernorm.weight"]
            sd[p + "post_attention_layernorm.weight"] = \
                sd[p + "post_feedforward_layernorm.weight"]
        params = super().load_hf_state_dict(sd)
        L, dtype = self.num_layers, self.dtype
        params["layers"]["q_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.q_norm.weight"],
                        dtype=dtype) for i in range(L)])
        params["layers"]["k_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.k_norm.weight"],
                        dtype=dtype) for i in range(L)])
        return self._extra_layer_arrays(params)

    def init_params(self, rng):
        hf = self.hf
        L, H = self.num_layers, self.hidden_size
        sd: Dict[str, np.ndarray] = {}
        rngnp = np.random.default_rng(0)

        def mat(shape):
            return rngnp.standard_normal(shape, np.float32) * 0.02
        sd["model.embed_tokens.weight"] = mat((self.vocab_size, H))
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        for i in range(L):
            p = f"model.layers.{i}."
            sd[p + "self_attn.q_proj.weight"] = mat((nq * hd, H))
            sd[p + "self_attn.k_proj.weight"] = mat((nkv * hd, H))
            sd[p + "self_attn.v_proj.weight"] = mat((nkv * hd, H))
            sd[p + "self_attn.o_proj.weight"] = mat((H, nq * hd))
            sd[p + "self_attn.q_norm.weight"] = np.ones(hd, np.float32)
            sd[p + "self_attn.k_norm.weight"] = np.ones(hd, np.float32)
            sd[p + "mlp.gate_proj.weight"] = mat((self.intermediate_size, H))
            sd[p + "mlp.up_proj.weight"] = mat((self.intermediate_size, H))
            sd[p + "mlp.down_proj.weight"] = mat((H, self.intermediate_size))
            sd[p + "post_attention_layernorm.weight"] = np.ones(H, np.float32)
            sd[p + "post_feedforward_layernorm.weight"] = \
                np.ones(H, np.float32)
        sd["model.norm.weight"] = np.ones(H, np.float32)
        if not self.tie_embeddings:
            sd["lm_head.weight"] = mat((self.vocab_size, H))
        return self.load_hf_state_dict(sd)

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        layers = dict(params["layers"])
        is_sliding = layers.pop("is_sliding", None)
        spec = super().param_pspecs({**params, "layers": layers})
        spec["layers"]["q_norm"] = P(None, None)
        spec["layers"]["k_norm"] = P(None, None)
        if is_sliding is not None:
            spec["layers"]["is_sliding"] = P(None)
        return spec


@register_model("smollm3")
class SmolLM3ForCausalLM(LlamaForCausalLM):
    """SmolLM3: llama body with NoPE — every ``no_rope_layer_interval``-th
    layer skips rotary embeddings (config.no_rope_layers, 1 = has rope)."""
    architectures = ("SmolLM3ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self._use_rope = [bool(x) for x in (
            getattr(hf, "no_rope_layers", None) or [1] * self.num_layers)]

    def _rope_variants(self, positions, cos_sin):
        cos, sin = cos_sin
        return (cos, sin, jnp.ones_like(cos), jnp.zeros_like(sin))

    def _layer_rope(self, layer, variants):
        cos, sin, one, zero = variants
        use = layer["use_rope"]
        return jnp.where(use, cos, one), jnp.where(use, sin, zero)

    def load_hf_state_dict(self, sd):
        params = super().load_hf_state_dict(sd)
        params["layers"]["use_rope"] = jnp.asarray(
            self._use_rope[:self.num_layers], jnp.bool_)
        return params

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        layers = dict(params["layers"])
        layers.pop("use_rope", None)
        spec = super().param_pspecs({**params, "layers": layers})
        spec["layers"]["use_rope"] = P(None)
        return spec


@register_model("helium")
class HeliumForCausalLM(LlamaForCausalLM):
    """Kyutai Helium: llama architecture byte-for-byte (own theta/eps)."""
    architectures = ("HeliumForCausalLM",)


@register_model("arcee")
class ArceeForCausalLM(LlamaForCausalLM):
    """Arcee AFM: llama body with a ReLU² gateless MLP
    (down(relu(up(x))²)). Loaded as gate := up with a relu activation:
    relu(u)·u == relu(u)² exactly (relu zeroes the negative branch)."""
    architectures = ("ArceeForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.mlp_act = "relu"

    def load_hf_state_dict(self, sd):
        sd = dict(sd)
        for i in range(self.num_layers):
            p = f"model.layers.{i}.mlp."
            if p + "gate_proj.weight" not in sd:
                sd[p + "gate_proj.weight"] = sd[p + "up_proj.weight"]
        return super().load_hf_state_dict(sd)
