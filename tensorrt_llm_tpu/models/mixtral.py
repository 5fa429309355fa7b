"""Mixtral (sparse MoE Llama) decoder.

Behavioral reference: tensorrt_llm/_torch/models/modeling_mixtral.py +
the fused-MoE module stack (SURVEY.md §2.2 MoE row). Attention is the
Llama block; the MLP is top-2-of-8 expert routing through the grouped
GEMM in ops/moe.py. Expert weights stay bf16 in round 1 (weight-only
quant of experts lands with the EP shard_map path).
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.moe import moe_mlp
from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig, rope_cos_sin
from .llama import LlamaForCausalLM
from .modeling_utils import attention_block, quantize_linear, register_model


@register_model("mixtral")
class MixtralForCausalLM(LlamaForCausalLM):
    architectures = ("MixtralForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        self.num_experts = getattr(self.hf, "num_local_experts", None) or \
            getattr(self.hf, "num_experts", 0)
        self.top_k = getattr(self.hf, "num_experts_per_tok", 1)
        self.moe_backend = "auto"
        # routing renormalization (Mixtral yes; Qwen2-MoE no by default)
        self.renormalize = True
        # Qwen2-MoE style always-on shared expert gated by a sigmoid
        self.has_shared_expert = False

    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        hf = self.hf
        H, I, E, L = (self.hidden_size, self.intermediate_size,
                      self.num_experts, self.num_layers)
        nprng = np.random.default_rng(0)

        def mat(shape):
            return nprng.standard_normal(shape, np.float32) * 0.02

        sd: Dict[str, np.ndarray] = {}
        V = self.vocab_size
        sd["model.embed_tokens.weight"] = mat((V, H))
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        for name, shape in [("self_attn.q_proj", (nq * hd, H)),
                            ("self_attn.k_proj", (nkv * hd, H)),
                            ("self_attn.v_proj", (nkv * hd, H)),
                            ("self_attn.o_proj", (H, nq * hd))]:
            base = mat((L,) + shape)
            for i in range(L):
                sd[f"model.layers.{i}.{name}.weight"] = base[i]
        gate = mat((L, E, H))
        w1 = mat((L, E, I, H))
        w2 = mat((L, E, H, I))
        w3 = mat((L, E, I, H))
        for i in range(L):
            sd[f"model.layers.{i}.block_sparse_moe.gate.weight"] = gate[i]
            for e in range(E):
                sd[f"model.layers.{i}.block_sparse_moe.experts.{e}.w1.weight"] = w1[i, e]
                sd[f"model.layers.{i}.block_sparse_moe.experts.{e}.w2.weight"] = w2[i, e]
                sd[f"model.layers.{i}.block_sparse_moe.experts.{e}.w3.weight"] = w3[i, e]
            sd[f"model.layers.{i}.input_layernorm.weight"] = np.ones(H, np.float32)
            sd[f"model.layers.{i}.post_attention_layernorm.weight"] = \
                np.ones(H, np.float32)
        sd["model.norm.weight"] = np.ones(H, np.float32)
        sd["lm_head.weight"] = mat((V, H))
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L, E = self.num_layers, self.num_experts
        dtype = self.dtype

        def t(name):
            return np.ascontiguousarray(np.transpose(sd[name]))

        def stack_quant(method, fmt):
            per = [quantize_linear(method, t(fmt.format(i)), dtype=dtype)
                   for i in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        layers = {
            "input_norm": jnp.stack([
                jnp.asarray(sd[f"model.layers.{i}.input_layernorm.weight"],
                            dtype=dtype) for i in range(L)]),
            "post_norm": jnp.stack([
                jnp.asarray(
                    sd[f"model.layers.{i}.post_attention_layernorm.weight"],
                    dtype=dtype) for i in range(L)]),
            "q": stack_quant(self.m_q, "model.layers.{}.self_attn.q_proj.weight"),
            "k": stack_quant(self.m_kv, "model.layers.{}.self_attn.k_proj.weight"),
            "v": stack_quant(self.m_kv, "model.layers.{}.self_attn.v_proj.weight"),
            "o": stack_quant(self.m_o, "model.layers.{}.self_attn.o_proj.weight"),
            "router": jnp.stack([
                jnp.asarray(t(f"model.layers.{i}.block_sparse_moe.gate.weight"),
                            dtype=dtype) for i in range(L)]),
            # experts: [L, E, H, I] (already x@w layout after transpose)
            "w_gate": jnp.stack([jnp.stack([
                jnp.asarray(t(f"model.layers.{i}.block_sparse_moe.experts.{e}.w1.weight"), dtype=dtype)
                for e in range(E)]) for i in range(L)]),
            "w_up": jnp.stack([jnp.stack([
                jnp.asarray(t(f"model.layers.{i}.block_sparse_moe.experts.{e}.w3.weight"), dtype=dtype)
                for e in range(E)]) for i in range(L)]),
            "w_down": jnp.stack([jnp.stack([
                jnp.asarray(t(f"model.layers.{i}.block_sparse_moe.experts.{e}.w2.weight"), dtype=dtype)
                for e in range(E)]) for i in range(L)]),
        }
        params = {
            "embed": {"weight": jnp.asarray(sd["model.embed_tokens.weight"],
                                            dtype=dtype)},
            "layers": layers,
            "final_norm": jnp.asarray(sd["model.norm.weight"], dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head,
                np.ascontiguousarray(np.transpose(sd["lm_head.weight"])),
                dtype=dtype),
        }
        return params

    # ------------------------------------------------------------------ #
    def _base_cos_sin(self, metadata):
        """Rope tables hook (Qwen3-VL-MoE overrides with M-RoPE)."""
        return rope_cos_sin(self.attn_spec.rope, metadata.positions)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, deepstack=None,
                collect_moe_stats=False, **_ignored):
        h = self._embed(params, token_ids, input_embeds)
        if self.embedding_multiplier != 1.0:   # granite-moe
            h = h * self.embedding_multiplier
        rm = self.residual_multiplier
        spec = self.attn_spec
        eps = self.rms_eps
        cos_sin = self._base_cos_sin(metadata)
        mapping = self.config.mapping

        shard_mesh, shard_axis = self.attn_shard_args()

        if self.use_qk_norm and getattr(self, "qk_norm_full", False):
            # OLMoE-style: RMS over the whole flattened projection
            def _full(x, w):
                T = x.shape[0]
                return rms_norm(x.reshape(T, -1), w, eps).reshape(x.shape)

            def q_norm(layer, q):
                return _full(q, layer["q_norm"])

            def k_norm(layer, k):
                return _full(k, layer["k_norm"])
        elif self.use_qk_norm:
            def q_norm(layer, q):
                return rms_norm(q, layer["q_norm"], eps)

            def k_norm(layer, k):
                return rms_norm(k, layer["k_norm"], eps)
        else:
            q_norm = k_norm = None

        # pool-as-carry threading (ops/attention.py layer_metadata)
        from ..ops.attention import layer_metadata
        L_n, P_n, ps_n = kv_pages.shape[:3]
        kv_flat0 = kv_pages.reshape((L_n * P_n,) + kv_pages.shape[2:])

        def layer_body(carry, xs):
            h, kvf = carry
            layer, layer_idx = xs
            md_l = layer_metadata(metadata, layer_idx, P_n, ps_n, L_n)
            normed = rms_norm(h, layer["input_norm"], eps)
            attn_out, new_pages = attention_block(
                layer, normed, kvf, md_l, spec,
                self.m_q, self.m_o, attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale, rope_cos_sin=cos_sin,
                q_norm=q_norm, k_norm=k_norm,
                mesh=shard_mesh, tp_axis=shard_axis)
            h = h + (attn_out if rm == 1.0 else rm * attn_out)
            normed = rms_norm(h, layer["post_norm"], eps)
            if "w_gate_slots" in layer:
                # wide-EP: replica-slot weights installed by
                # rebalance_moe (reference: fused_moe_wide_ep.py)
                from ..ops.moe import moe_mlp_wide_ep, topk_routing
                logits_r = jnp.dot(normed, layer["router"],
                                   preferred_element_type=jnp.float32)
                probs, eidx = topk_routing(logits_r, self.top_k,
                                           renormalize=self.renormalize)
                moe_out = moe_mlp_wide_ep(
                    normed, layer["w_gate_slots"], layer["w_up_slots"],
                    layer["w_down_slots"], probs, eidx,
                    layer["moe_rep_count"], layer["moe_rep_slots"],
                    self.mesh)
            else:
                moe_out = moe_mlp(normed, layer["w_gate"], layer["w_up"],
                                  layer["w_down"], layer["router"],
                                  top_k=self.top_k,
                                  backend=self.moe_backend,
                                  mapping=mapping, mesh=self.mesh,
                                  renormalize=self.renormalize)
            if self.has_shared_expert:
                # always-on shared expert, sigmoid-gated for Qwen2-MoE
                # (shared_expert_gate); added directly for HunYuan-MoE
                g = self.m_mlp.apply(layer["se_gate"], normed)
                u = self.m_mlp.apply(layer["se_up"], normed)
                a = jax.nn.silu(g.astype(jnp.float32)) \
                    .astype(self.dtype) * u
                se = self.m_mlp.apply(layer["se_down"], a)
                if getattr(self, "shared_expert_gated", True):
                    gate = jax.nn.sigmoid(
                        jnp.dot(normed, layer["se_gate_w"],
                                preferred_element_type=jnp.float32))
                    se = gate.astype(self.dtype) * se
                moe_out = moe_out + se
            h = h + (moe_out if rm == 1.0 else rm * moe_out)
            if deepstack is not None:
                nds = deepstack.shape[0]
                add = jnp.where(
                    layer_idx < nds,
                    deepstack[jnp.minimum(layer_idx, nds - 1)], 0.0)
                h = h + add.astype(h.dtype)
            mc = None
            if collect_moe_stats:
                # per-expert routed-token counts (reference:
                # moe_load_balancer.py statistic collection). The
                # routing recomputes here; XLA CSEs it against the MoE
                # forward's own topk so the stats are free.
                from ..ops.moe import topk_routing
                E_n = layer["router"].shape[-1]
                lr = jnp.dot(normed, layer["router"],
                             preferred_element_type=jnp.float32)
                _, eidx_s = topk_routing(lr, self.top_k,
                                         renormalize=self.renormalize)
                mc = jnp.zeros((E_n,), jnp.int32).at[
                    eidx_s.reshape(-1)].add(1)
            return (h, new_pages), mc

        (h, kv_flat), moe_counts = jax.lax.scan(
            layer_body, (h, kv_flat0),
            (params["layers"], jnp.arange(L_n, dtype=jnp.int32)))
        kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        if collect_moe_stats:
            return logits, kv_pages, moe_counts   # [L, E]
        return logits, kv_pages

    # ------------------------------------------------------------------ #
    def param_pspecs(self, params) -> Any:
        # rebuild: llama pspecs minus gate/up/down, plus MoE experts
        base = LlamaForCausalLM.param_pspecs(
            self, {**params, "layers": {
                **{k: v for k, v in params["layers"].items()
                   if k not in ("router", "w_gate", "w_up", "w_down")},
                "gate": params["layers"]["q"],   # placeholder shapes
                "up": params["layers"]["q"],
                "down": params["layers"]["o"],
            }})
        layers = base["layers"]
        for k in ("gate", "up", "down"):
            layers.pop(k)
        # experts sharded over the (cp, tp) block — the reference's
        # moe_ep factorization of the attention axes (mapping.py:81);
        # the shard_map EP path (ops/moe.py moe_mlp_ep) runs local
        # grouped GEMMs per expert shard with a psum combine
        layers["router"] = P(None, None, None)
        layers["w_gate"] = P(None, ("cp", "tp"), None, None)
        layers["w_up"] = P(None, ("cp", "tp"), None, None)
        layers["w_down"] = P(None, ("cp", "tp"), None, None)
        return base
