"""Qwen3-Next: gated DeltaNet linear attention + gated full attention
hybrid with Qwen2-MoE-style sparse FFN.

Behavioral reference: tensorrt_llm/_torch/models/modeling_qwen3_next.py;
HF modeling_qwen3_next.py is the numeric spec.

  * ``linear_attention`` layers: GatedDeltaNet — packed qkvz/ba
    projections (per-k-head interleaved; de-interleaved at LOAD into
    plain column blocks), causal conv over [q;k;v], l2-normalized q/k,
    per-v-head decay g = −exp(A_log)·softplus(a + dt_bias) and mixing
    β = σ(b), the rank-1 delta-rule recurrence (ops.ssm.gated_delta_scan)
    and a gated RMSNorm with the z stream.
  * ``full_attention`` layers: Qwen3 attention with per-head qk norms,
    partial rotary, and an OUTPUT GATE — attn·σ(x·W_gate) before o_proj
    (attention_block's pre_o hook).
  * Every layer: top-k softmax-renormalized MoE + sigmoid-gated shared
    expert (Qwen2-MoE shape).

TPU structure mirrors Bamba: runs of consecutive same-type layers scan
over stacked params; hybrid cache {paged KV, conv_state, delta state}.
"""
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
from ..ops.ssm import causal_conv1d, gated_delta_scan
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("qwen3_next")
class Qwen3NextForCausalLM(DecoderModelForCausalLM):
    architectures = ("Qwen3NextForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.num_experts = hf.num_experts
        self.top_k = hf.num_experts_per_tok
        # deltanet geometry
        self.vh = hf.linear_num_value_heads
        self.kh = hf.linear_num_key_heads
        self.dk = hf.linear_key_head_dim
        self.dv = hf.linear_value_head_dim
        self.conv_k = hf.linear_conv_kernel_dim
        self.key_dim = self.kh * self.dk
        self.value_dim = self.vh * self.dv
        self.conv_dim = 2 * self.key_dim + self.value_dim
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
        return {
            "kv": jnp.zeros(self.kv_pool_shape(num_pages, page_size),
                            self.config.kv_cache_dtype),
            "conv_state": jnp.zeros(
                (max(self.n_linear, 1), slots, self.conv_dim,
                 self.conv_k - 1), jnp.float32),
            "ssm_state": jnp.zeros(
                (max(self.n_linear, 1), slots, self.vh, self.dk, self.dv),
                jnp.float32),
        }

    def kv_pspec(self):
        return {"kv": P(), "conv_state": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import Qwen3NextForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def _moe_params(self, sd, i):
        dt = self.dtype
        p = f"model.layers.{i}.mlp."
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        E = self.num_experts
        out = {
            "router": jnp.asarray(t(p + "gate.weight"), dt),
            "w_gate": jnp.stack([jnp.asarray(
                t(p + f"experts.{e}.gate_proj.weight"), dt)
                for e in range(E)]),
            "w_up": jnp.stack([jnp.asarray(
                t(p + f"experts.{e}.up_proj.weight"), dt)
                for e in range(E)]),
            "w_down": jnp.stack([jnp.asarray(
                t(p + f"experts.{e}.down_proj.weight"), dt)
                for e in range(E)]),
            "se_gate": quantize_linear(
                self.m_lin, t(p + "shared_expert.gate_proj.weight"),
                dtype=dt),
            "se_up": quantize_linear(
                self.m_lin, t(p + "shared_expert.up_proj.weight"),
                dtype=dt),
            "se_down": quantize_linear(
                self.m_lin, t(p + "shared_expert.down_proj.weight"),
                dtype=dt),
            "se_gate_w": jnp.asarray(t(p + "shared_expert_gate.weight"),
                                     dt),
        }
        return out

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        arr = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)
        # Qwen3NextRMSNorm is ZERO-CENTERED (output * (1 + weight)):
        # fold the +1 into the stored weight at load; the deltanet's
        # gated norm is plain and stays as-is
        zc = lambda n: jnp.asarray(np.asarray(sd[n]) + 1.0, dt)
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        kh, dk, vh, dv = self.kh, self.dk, self.vh, self.dv
        rep = vh // kh

        def common(i):
            return {
                "norm": zc(f"model.layers.{i}.input_layernorm.weight"),
                "ff_norm": zc(
                    f"model.layers.{i}.post_attention_layernorm.weight"),
                **self._moe_params(sd, i),
            }

        def linear_layer(i):
            p = f"model.layers.{i}.linear_attn."
            w = np.asarray(sd[p + "in_proj_qkvz.weight"]).T  # [H, total]
            H = w.shape[0]
            g = 2 * dk + 2 * rep * dv
            w = w.reshape(H, kh, g)
            wq = w[:, :, :dk].reshape(H, kh * dk)
            wk = w[:, :, dk:2 * dk].reshape(H, kh * dk)
            wv = w[:, :, 2 * dk:2 * dk + rep * dv].reshape(H, vh * dv)
            wz = w[:, :, 2 * dk + rep * dv:].reshape(H, vh * dv)
            ba = np.asarray(sd[p + "in_proj_ba.weight"]).T \
                .reshape(H, kh, 2 * rep)
            wb = ba[:, :, :rep].reshape(H, vh)
            wa = ba[:, :, rep:].reshape(H, vh)
            return {
                "w_qkv": jnp.asarray(
                    np.ascontiguousarray(np.concatenate(
                        [wq, wk, wv], axis=1)), dt),
                "w_z": jnp.asarray(np.ascontiguousarray(wz), dt),
                "w_b": jnp.asarray(np.ascontiguousarray(wb), dt),
                "w_a": jnp.asarray(np.ascontiguousarray(wa), dt),
                "conv_w": jnp.asarray(
                    np.asarray(sd[p + "conv1d.weight"])[:, 0, :],
                    jnp.float32),
                "conv_b": jnp.asarray(
                    sd.get(p + "conv1d.bias",
                           np.zeros(self.conv_dim, np.float32)),
                    jnp.float32),
                "A_log": arr(p + "A_log", jnp.float32),
                "dt_bias": arr(p + "dt_bias", jnp.float32),
                "gate_norm": arr(p + "norm.weight"),
                "out": quantize_linear(self.m_o, t(p + "out_proj.weight"),
                                       dtype=dt),
                **common(i),
            }

        def attn_layer(i):
            a = f"model.layers.{i}.self_attn."
            nh, hd = self.num_heads, self.head_dim
            wq = np.asarray(sd[a + "q_proj.weight"]).T  # [H, nh*2hd]
            H = wq.shape[0]
            wq = wq.reshape(H, nh, 2 * hd)
            return {
                "q": quantize_linear(self.m_q, np.ascontiguousarray(
                    wq[:, :, :hd].reshape(H, nh * hd)), dtype=dt),
                "gate": jnp.asarray(np.ascontiguousarray(
                    wq[:, :, hd:].reshape(H, nh * hd)), dt),
                "k": quantize_linear(self.m_q, t(a + "k_proj.weight"),
                                     dtype=dt),
                "v": quantize_linear(self.m_q, t(a + "v_proj.weight"),
                                     dtype=dt),
                "o": quantize_linear(self.m_o, t(a + "o_proj.weight"),
                                     dtype=dt),
                "q_norm": zc(a + "q_norm.weight"),
                "k_norm": zc(a + "k_norm.weight"),
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
            "final_norm": zc("model.norm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dt),
        }

    # ------------------------------------------------------------------ #
    def _ff(self, layer, h):
        normed = rms_norm(h, layer["ff_norm"], self.eps)
        out = moe_mlp(normed, layer["w_gate"], layer["w_up"],
                      layer["w_down"], layer["router"], top_k=self.top_k,
                      backend="ragged", renormalize=True)
        g = self.m_lin.apply(layer["se_gate"], normed)
        u = self.m_lin.apply(layer["se_up"], normed)
        a = jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u
        se = self.m_lin.apply(layer["se_down"], a)
        gate = jax.nn.sigmoid(jnp.dot(normed, layer["se_gate_w"],
                                      preferred_element_type=jnp.float32))
        return h + out + gate.astype(self.dtype) * se

    def _deltanet(self, layer, normed, conv_state, ssm_state, metadata):
        T = normed.shape[0]
        kh, dk, vh, dv = self.kh, self.dk, self.vh, self.dv
        qkv = jnp.dot(normed, layer["w_qkv"],
                      preferred_element_type=jnp.float32) \
            .astype(self.dtype)
        z = jnp.dot(normed, layer["w_z"],
                    preferred_element_type=jnp.float32) \
            .reshape(T, vh, dv)
        b = jnp.dot(normed, layer["w_b"],
                    preferred_element_type=jnp.float32)
        a = jnp.dot(normed, layer["w_a"],
                    preferred_element_type=jnp.float32)

        qkv, new_conv = causal_conv1d(qkv, layer["conv_w"],
                                      layer["conv_b"], conv_state,
                                      metadata)
        qkv = jax.nn.silu(qkv)
        q = qkv[:, :self.key_dim].reshape(T, kh, dk)
        k = qkv[:, self.key_dim:2 * self.key_dim].reshape(T, kh, dk)
        v = qkv[:, 2 * self.key_dim:].reshape(T, vh, dv)

        def l2n(u):
            return u * jax.lax.rsqrt(
                jnp.sum(jnp.square(u), -1, keepdims=True) + 1e-6)
        q = l2n(q) / math.sqrt(dk)
        k = l2n(k)
        rep = vh // kh
        if rep > 1:
            q = jnp.repeat(q, rep, axis=1)
            k = jnp.repeat(k, rep, axis=1)

        beta = jax.nn.sigmoid(b)
        g = -jnp.exp(layer["A_log"])[None, :] * jax.nn.softplus(
            a + layer["dt_bias"][None, :])
        y, new_ssm = gated_delta_scan(q, k, v, g, beta, ssm_state,
                                      metadata)
        # gated RMSNorm over dv then silu(z) (Qwen3NextRMSNormGated)
        yf = y.astype(jnp.float32)
        var = jnp.mean(jnp.square(yf), -1, keepdims=True)
        yf = yf * jax.lax.rsqrt(var + self.eps) * \
            layer["gate_norm"].astype(jnp.float32)
        yf = yf * jax.nn.silu(z)
        out = self.m_o.apply(layer["out"],
                             yf.reshape(T, vh * dv).astype(self.dtype))
        return out, new_conv, new_ssm

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        shard_mesh, shard_axis = self.attn_shard_args()
        kv = kv_pages["kv"]
        conv, ssm = kv_pages["conv_state"], kv_pages["ssm_state"]
        hd = self.head_dim

        def qk_norm(which):
            def f(layer, u):
                return rms_norm(u, layer[which], self.eps)
            return f

        def pre_o(layer, x, attn_flat):
            gate = jnp.dot(x, layer["gate"],
                           preferred_element_type=jnp.float32)
            return attn_flat * jax.nn.sigmoid(gate).astype(attn_flat.dtype)

        def linear_body(h, xs):
            layer, cs, ss = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            out, nc, ns = self._deltanet(layer, normed, cs, ss, metadata)
            h = self._ff(layer, h + out)
            return h, (nc, ns)

        def attn_body(h, xs):
            layer, pages = xs
            attn_out, pages = attention_block(
                layer, rms_norm(h, layer["norm"], self.eps), pages,
                metadata, spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale,
                q_norm=qk_norm("q_norm"), k_norm=qk_norm("k_norm"),
                pre_o=pre_o, mesh=shard_mesh, tp_axis=shard_axis)
            h = self._ff(layer, h + attn_out)
            return h, pages

        new_kv, new_conv, new_ssm = [], [], []
        for run, (kind, o, n) in zip(params["runs"], self._runs):
            if kind == "linear_attention":
                h, (nc, ns) = jax.lax.scan(
                    linear_body, h, (run, conv[o:o + n], ssm[o:o + n]))
                new_conv.append(nc)
                new_ssm.append(ns)
            else:
                h, pages = jax.lax.scan(attn_body, h, (run, kv[o:o + n]))
                new_kv.append(pages)
        out_cache = {
            "kv": jnp.concatenate(new_kv, axis=0) if new_kv else kv,
            "conv_state": jnp.concatenate(new_conv, axis=0)
            if new_conv else conv,
            "ssm_state": jnp.concatenate(new_ssm, axis=0)
            if new_ssm else ssm,
        }
        h = rms_norm(h, params["final_norm"], self.eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
