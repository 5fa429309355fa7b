"""MiniMax-Text-01: lightning (decayed linear) attention hybrid.

Behavioral reference: tensorrt_llm/_torch/models/modeling_minimaxm2.py;
HF modeling_minimax.py is the numeric spec. Alternating layers:

  * ``linear_attention``: silu(qkv_proj) per-head streams with the
    exponential-decay recurrence S_t = e^{−slope_h}·S_{t−1} + k_t⊗v_t,
    y_t = q_t·S_t — exactly the ssd_scan recurrence with dt=1,
    A=−slope, B=k, C=q, D=0 (the HF block-chunked form telescopes to
    it). Output: full-width RMSNorm, sigmoid output gate on the layer
    input, out_proj.
  * ``full_attention``: llama-style GQA with rope.
  * Mixtral-shaped sparse MoE FFN every layer (w1/w3/w2 naming).

TPU structure mirrors Bamba/Qwen3-Next: same-type runs scan over
stacked params; cache pytree {paged KV, decay state}."""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.moe import moe_mlp
from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig
from ..ops.ssm import ssd_scan
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("minimax")
class MiniMaxForCausalLM(DecoderModelForCausalLM):
    architectures = ("MiniMaxForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.num_experts = hf.num_local_experts
        self.top_k = hf.num_experts_per_tok
        # POST-norm residual mixing (deepnorm-style alpha/beta factors;
        # HF MiniMaxDecoderLayer: residual IS the normed stream)
        self.lin_a = getattr(hf, "linear_attn_alpha_factor", 1.0)
        self.lin_b = getattr(hf, "linear_attn_beta_factor", 1.0)
        self.full_a = getattr(hf, "full_attn_alpha_factor", 1.0)
        self.full_b = getattr(hf, "full_attn_beta_factor", 1.0)
        self.mlp_a = getattr(hf, "mlp_alpha_factor", 1.0)
        self.mlp_b = getattr(hf, "mlp_beta_factor", 1.0)
        self.block_types: List[str] = list(hf.layer_types)
        self._runs: List[Tuple[str, int, int]] = []
        counts = {"linear_attention": 0, "full_attention": 0}
        for bt in self.block_types:
            if self._runs and self._runs[-1][0] == bt:
                kk, o, n = self._runs[-1]
                self._runs[-1] = (kk, o, n + 1)
            else:
                self._runs.append((bt, counts[bt], 1))
            counts[bt] += 1
        self.n_attn = counts["full_attention"]
        self.n_linear = counts["linear_attention"]
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=RopeConfig.from_hf_config(hf, self.head_dim))
        self.m_lin = self._method("mlp")
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")
        self._num_slots = 0

    def kv_pool_shape(self, num_pages: int, page_size: int):
        return (max(self.n_attn, 1), num_pages, page_size,
                2 * self.num_kv_heads, self.head_dim)

    def make_kv_pages(self, num_pages: int, page_size: int):
        slots = max(self._num_slots, 1)
        hd = self.head_dim
        return {
            "kv": jnp.zeros(self.kv_pool_shape(num_pages, page_size),
                            self.config.kv_cache_dtype),
            "ssm_state": jnp.zeros(
                (max(self.n_linear, 1), slots, self.num_heads, hd, hd),
                jnp.float32),
        }

    def kv_pspec(self):
        return {"kv": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import MiniMaxForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def _moe_params(self, sd, i):
        dt = self.dtype
        p = f"model.layers.{i}.block_sparse_moe."
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        E = self.num_experts
        return {
            "router": jnp.asarray(t(p + "gate.weight"), dt),
            "w_gate": jnp.stack([jnp.asarray(
                t(p + f"experts.{e}.w1.weight"), dt) for e in range(E)]),
            "w_up": jnp.stack([jnp.asarray(
                t(p + f"experts.{e}.w3.weight"), dt) for e in range(E)]),
            "w_down": jnp.stack([jnp.asarray(
                t(p + f"experts.{e}.w2.weight"), dt) for e in range(E)]),
        }

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        arr = lambda n: jnp.asarray(np.asarray(sd[n]), dt)
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        nh, hd = self.num_heads, self.head_dim

        def common(i):
            return {
                "norm": arr(f"model.layers.{i}.input_layernorm.weight"),
                "ff_norm": arr(
                    f"model.layers.{i}.post_attention_layernorm.weight"),
                **self._moe_params(sd, i),
            }

        def linear_layer(i):
            p = f"model.layers.{i}.self_attn."
            w = np.asarray(sd[p + "qkv_proj.weight"]).T   # [H, nh*3hd]
            H = w.shape[0]
            w = w.reshape(H, nh, 3 * hd)
            return {
                "w_q": jnp.asarray(np.ascontiguousarray(
                    w[:, :, :hd].reshape(H, nh * hd)), dt),
                "w_k": jnp.asarray(np.ascontiguousarray(
                    w[:, :, hd:2 * hd].reshape(H, nh * hd)), dt),
                "w_v": jnp.asarray(np.ascontiguousarray(
                    w[:, :, 2 * hd:].reshape(H, nh * hd)), dt),
                "slope": jnp.asarray(
                    np.asarray(sd[p + "slope_rate"]).reshape(nh),
                    jnp.float32),
                "attn_norm": arr(p + "norm.weight"),
                "w_gate_out": jnp.asarray(t(p + "output_gate.weight"), dt),
                "out": quantize_linear(self.m_o, t(p + "out_proj.weight"),
                                       dtype=dt),
                **common(i),
            }

        def attn_layer(i):
            a = f"model.layers.{i}.self_attn."
            return {
                "q": quantize_linear(self.m_q, t(a + "q_proj.weight"),
                                     dtype=dt),
                "k": quantize_linear(self.m_q, t(a + "k_proj.weight"),
                                     dtype=dt),
                "v": quantize_linear(self.m_q, t(a + "v_proj.weight"),
                                     dtype=dt),
                "o": quantize_linear(self.m_o, t(a + "o_proj.weight"),
                                     dtype=dt),
                **common(i),
            }

        stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
        runs, li = [], 0
        for kind, _, n in self._runs:
            mk = linear_layer if kind == "linear_attention" else attn_layer
            runs.append(stack([mk(li + j) for j in range(n)]))
            li += n
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dt)},
            "runs": tuple(runs),
            "final_norm": arr("model.norm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dt),
        }

    # ------------------------------------------------------------------ #
    def _ff(self, layer, h):
        # post-norm: the NORMED stream is the residual
        h = rms_norm(h, layer["ff_norm"], self.eps)
        out = moe_mlp(h, layer["w_gate"], layer["w_up"],
                      layer["w_down"], layer["router"], top_k=self.top_k,
                      backend="ragged", renormalize=True)
        return h * self.mlp_a + out * self.mlp_b

    def _lightning(self, layer, normed, ssm_state, metadata):
        T = normed.shape[0]
        nh, hd = self.num_heads, self.head_dim

        def proj(w):
            return jax.nn.silu(
                jnp.dot(normed, w, preferred_element_type=jnp.float32)) \
                .astype(jnp.float32).reshape(T, nh, hd)
        q = proj(layer["w_q"])
        k = proj(layer["w_k"])
        v = proj(layer["w_v"])
        ones = jnp.ones((T, nh), jnp.float32)
        y, new_ssm = ssd_scan(v, ones, -layer["slope"], k, q,
                              jnp.zeros((nh,), jnp.float32),
                              ssm_state, metadata)
        y = y.reshape(T, nh * hd)
        # HF constructs the lightning norm WITHOUT the config eps —
        # MiniMaxRMSNorm's default 1e-6 applies here, not rms_norm_eps
        y = rms_norm(y.astype(self.dtype), layer["attn_norm"], 1e-6)
        gate = jax.nn.sigmoid(jnp.dot(
            normed, layer["w_gate_out"],
            preferred_element_type=jnp.float32))
        y = y * gate.astype(self.dtype)
        return self.m_o.apply(layer["out"], y), new_ssm

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        shard_mesh, shard_axis = self.attn_shard_args()
        kv = kv_pages["kv"]
        ssm = kv_pages["ssm_state"]

        def linear_body(h, xs):
            layer, ss = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            out, ns = self._lightning(layer, normed, ss, metadata)
            h = normed * self.lin_a + out * self.lin_b
            h = self._ff(layer, h)
            return h, ns

        def attn_body(h, xs):
            layer, pages = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            attn_out, pages = attention_block(
                layer, normed, pages,
                metadata, spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale,
                mesh=shard_mesh, tp_axis=shard_axis)
            h = normed * self.full_a + attn_out * self.full_b
            h = self._ff(layer, h)
            return h, pages

        new_kv, new_ssm = [], []
        for run, (kind, o, n) in zip(params["runs"], self._runs):
            if kind == "linear_attention":
                h, ns = jax.lax.scan(linear_body, h, (run, ssm[o:o + n]))
                new_ssm.append(ns)
            else:
                h, pages = jax.lax.scan(attn_body, h, (run, kv[o:o + n]))
                new_kv.append(pages)
        out_cache = {
            "kv": jnp.concatenate(new_kv, axis=0) if new_kv else kv,
            "ssm_state": jnp.concatenate(new_ssm, axis=0)
            if new_ssm else ssm,
        }
        h = rms_norm(h, params["final_norm"], self.eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
