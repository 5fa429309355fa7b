"""GLM-4.5 / GLM-4.6 (glm4_moe): GQA + DeepSeek-style routed MoE.

Behavioral reference: the reference's GLM support (modeling_glm.py) +
the DeepseekV3 MoE block; HF modeling_glm4_moe.py is the numeric spec.
Standard paged GQA with partial rotary (0.5) and optional per-head qk
RMSNorm; ``first_k_dense_replace`` dense layers then MoE layers with
sigmoid routing + e_score_correction_bias, top-k renormalization,
routed_scaling_factor, and always-on shared experts."""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.moe import moe_mlp_ragged
from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig, rope_cos_sin
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("glm4_moe")
class Glm4MoeForCausalLM(DecoderModelForCausalLM):
    architectures = ("Glm4MoeForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.first_dense = getattr(hf, "first_k_dense_replace", 0)
        self.n_experts = hf.n_routed_experts
        self.top_k = hf.num_experts_per_tok
        self.norm_topk = getattr(hf, "norm_topk_prob", True)
        self.routed_scale = getattr(hf, "routed_scaling_factor", 1.0)
        self.use_qk_norm = bool(getattr(hf, "use_qk_norm", False))
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=RopeConfig.from_hf_config(hf, self.head_dim))
        self.m_lin = self._method("attn")
        self.m_mlp = self._method("mlp")
        self.m_lm_head = self._method("lm_head")

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import Glm4MoeForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L, dtype = self.num_layers, self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        arr = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dtype)

        def attn_layer(i):
            a = f"model.layers.{i}.self_attn."
            out = {
                "q": quantize_linear(
                    self.m_lin, t(a + "q_proj.weight"),
                    bias=np.asarray(sd[a + "q_proj.bias"])
                    if a + "q_proj.bias" in sd else None, dtype=dtype),
                "k": quantize_linear(
                    self.m_lin, t(a + "k_proj.weight"),
                    bias=np.asarray(sd[a + "k_proj.bias"])
                    if a + "k_proj.bias" in sd else None, dtype=dtype),
                "v": quantize_linear(
                    self.m_lin, t(a + "v_proj.weight"),
                    bias=np.asarray(sd[a + "v_proj.bias"])
                    if a + "v_proj.bias" in sd else None, dtype=dtype),
                "o": quantize_linear(self.m_lin, t(a + "o_proj.weight"),
                                     dtype=dtype),
                "input_norm": arr(
                    f"model.layers.{i}.input_layernorm.weight"),
                "post_norm": arr(
                    f"model.layers.{i}.post_attention_layernorm.weight"),
            }
            if self.use_qk_norm:
                out["q_norm"] = arr(a + "q_norm.weight")
                out["k_norm"] = arr(a + "k_norm.weight")
            return out

        def dense_layer(i):
            p = f"model.layers.{i}.mlp."
            out = attn_layer(i)
            out["gate"] = quantize_linear(self.m_mlp,
                                          t(p + "gate_proj.weight"),
                                          dtype=dtype)
            out["up"] = quantize_linear(self.m_mlp,
                                        t(p + "up_proj.weight"),
                                        dtype=dtype)
            out["down"] = quantize_linear(self.m_mlp,
                                          t(p + "down_proj.weight"),
                                          dtype=dtype)
            return out

        def moe_layer(i):
            p = f"model.layers.{i}.mlp."
            E = self.n_experts
            out = attn_layer(i)
            out["router"] = arr(p + "gate.weight").T
            out["router_bias"] = arr(p + "gate.e_score_correction_bias",
                                     jnp.float32)
            for mod, hfn in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                             ("w_down", "down_proj")):
                out[mod] = jnp.stack([
                    jnp.asarray(t(p + f"experts.{e}.{hfn}.weight"), dtype)
                    for e in range(E)])
            for mod, hfn in (("s_gate", "gate_proj"), ("s_up", "up_proj"),
                             ("s_down", "down_proj")):
                out[mod] = quantize_linear(
                    self.m_mlp, t(p + f"shared_experts.{hfn}.weight"),
                    dtype=dtype)
            return out

        k = self.first_dense
        stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls) \
            if ls else None
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "dense_layers": stack([dense_layer(i) for i in range(k)]),
            "moe_layers": stack([moe_layer(i) for i in range(k, L)]),
            "final_norm": arr("model.norm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T),
                dtype=dtype),
        }

    # ------------------------------------------------------------------ #
    def _moe_block(self, layer, x):
        logits = jnp.dot(x.astype(jnp.float32),
                         layer["router"].astype(jnp.float32))
        scores = jax.nn.sigmoid(logits)
        choice = scores + layer["router_bias"][None, :]
        _, idx = jax.lax.top_k(choice, self.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1)
        if self.norm_topk:
            w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
        w = w * self.routed_scale
        routed = moe_mlp_ragged(x, layer["w_gate"], layer["w_up"],
                                layer["w_down"], w, idx.astype(jnp.int32))
        g = self.m_mlp.apply(layer["s_gate"], x)
        u = self.m_mlp.apply(layer["s_up"], x)
        shared = self.m_mlp.apply(
            layer["s_down"],
            jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u)
        return routed + shared

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        eps = self.eps
        cos_sin = rope_cos_sin(spec.rope, metadata.positions)
        shard_mesh, shard_axis = self.attn_shard_args()
        qn = (lambda l, u: rms_norm(u, l["q_norm"], eps)) \
            if self.use_qk_norm else None
        kn = (lambda l, u: rms_norm(u, l["k_norm"], eps)) \
            if self.use_qk_norm else None

        def attn(layer, h, pages):
            out, pages = attention_block(
                layer, rms_norm(h, layer["input_norm"], eps), pages,
                metadata, spec, self.m_lin, self.m_lin,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale, rope_cos_sin=cos_sin,
                q_norm=qn, k_norm=kn, mesh=shard_mesh,
                tp_axis=shard_axis)
            return h + out, pages

        def dense_body(h, xs):
            layer, pool = xs
            h, pool = attn(layer, h, pool)
            normed = rms_norm(h, layer["post_norm"], eps)
            g = self.m_mlp.apply(layer["gate"], normed)
            u = self.m_mlp.apply(layer["up"], normed)
            h = h + self.m_mlp.apply(
                layer["down"],
                jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u)
            return h, pool

        def moe_body(h, xs):
            layer, pool = xs
            h, pool = attn(layer, h, pool)
            normed = rms_norm(h, layer["post_norm"], eps)
            h = h + self._moe_block(layer, normed)
            return h, pool

        kd = self.first_dense
        dense_pool, moe_pool = kv_pages[:kd], kv_pages[kd:]
        if params["dense_layers"] is not None:
            h, dense_pool = jax.lax.scan(
                dense_body, h, (params["dense_layers"], dense_pool))
        if params["moe_layers"] is not None:
            h, moe_pool = jax.lax.scan(
                moe_body, h, (params["moe_layers"], moe_pool))
        kv_pages = jnp.concatenate([dense_pool, moe_pool], axis=0)
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), kv_pages

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)


@register_model("ernie4_5_moe")
class Ernie45MoeForCausalLM(Glm4MoeForCausalLM):
    """Ernie 4.5 MoE: the glm4_moe body with GLM-style interleaved
    rotary and Ernie routing — softmax scores, SELECTION by
    bias-corrected scores, raw-softmax weights renormalized with a
    clamped denominator (HF Ernie4_5_MoeSparseMoeBlock)."""
    architectures = ("Ernie4_5_MoeForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        import dataclasses as _dc
        hf = model_config.hf_config
        # map ernie attr names onto the glm4_moe expectations
        hf.first_k_dense_replace = getattr(hf, "moe_layer_start_index", 0)
        hf.n_routed_experts = hf.moe_num_experts
        hf.num_experts_per_tok = hf.moe_k
        super().__init__(model_config)
        self.norm_min = getattr(hf, "moe_norm_min", 1e-12)
        self.attn_spec = _dc.replace(
            self.attn_spec, is_neox=False,
            rope=_dc.replace(self.attn_spec.rope, is_neox=False))

    def init_params(self, rng):
        import torch
        from transformers import Ernie4_5_MoeForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd):
        sd = {k.replace("mlp.moe_statics.e_score_correction_bias",
                        "mlp.gate.e_score_correction_bias"): v
              for k, v in sd.items()}
        # the bias is stored [1, E]
        sd = {k: (np.asarray(v).reshape(-1)
                  if k.endswith("e_score_correction_bias") else v)
              for k, v in sd.items()}
        return super().load_hf_state_dict(sd)

    def _moe_block(self, layer, x):
        logits = jnp.dot(x.astype(jnp.float32),
                         layer["router"].astype(jnp.float32))
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores + layer["router_bias"][None, :]
        _, idx = jax.lax.top_k(choice, self.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1)
        w = w / jnp.clip(jnp.sum(w, axis=-1, keepdims=True),
                         self.norm_min, None)
        routed = moe_mlp_ragged(x, layer["w_gate"], layer["w_up"],
                                layer["w_down"], w, idx.astype(jnp.int32))
        g = self.m_mlp.apply(layer["s_gate"], x)
        u = self.m_mlp.apply(layer["s_up"], x)
        shared = self.m_mlp.apply(
            layer["s_down"],
            jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u)
        return routed + shared
