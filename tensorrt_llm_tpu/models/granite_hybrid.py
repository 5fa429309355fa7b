"""GraniteMoeHybrid (Granite 4.0): Mamba2 + attention hybrid with
packed-MoE FFN, shared MLP, and Granite's scalar multipliers.

Behavioral reference: the reference's granite support +
modeling_nemotron_h.py SSD-hybrid structure; HF
modeling_granitemoehybrid.py is the numeric spec. Each layer is
(mamba2 | attention) + (MoE + shared MLP); attention is NoPE unless
``position_embedding_type == "rope"``; every residual add is scaled by
``residual_multiplier`` and logits divide by ``logits_scaling``.

TPU structure mirrors Bamba (bamba.py): runs of consecutive same-type
layers, one ``lax.scan`` per run, hybrid cache pytree."""
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
from .mamba2 import Mamba2Geom, load_mamba2_layer, mamba2_mixer
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("granitemoehybrid")
class GraniteMoeHybridForCausalLM(DecoderModelForCausalLM):
    architectures = ("GraniteMoeHybridForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.num_experts = getattr(hf, "num_local_experts", 0)
        self.top_k = getattr(hf, "num_experts_per_tok", 0)
        self.shared_inter = getattr(hf, "shared_intermediate_size", 0)
        self.embedding_multiplier = getattr(hf, "embedding_multiplier", 1.0)
        self.residual_multiplier = getattr(hf, "residual_multiplier", 1.0)
        self.logits_scaling = getattr(hf, "logits_scaling", 1.0)
        lim = getattr(hf, "time_step_limit", (0.0, float("inf")))
        inner = int(hf.mamba_expand * hf.hidden_size)
        self.geom = Mamba2Geom(
            intermediate=inner, num_heads=hf.mamba_n_heads,
            head_dim=getattr(hf, "mamba_d_head", inner // hf.mamba_n_heads),
            n_groups=hf.mamba_n_groups, state_size=hf.mamba_d_state,
            conv_kernel=hf.mamba_d_conv, dt_min=lim[0], dt_max=lim[1],
            eps=self.eps)
        self.block_types: List[str] = list(hf.layer_types)
        self._runs: List[Tuple[str, int, int]] = []
        counts = {"mamba": 0, "attention": 0}
        for bt in self.block_types:
            if self._runs and self._runs[-1][0] == bt:
                k, o, n = self._runs[-1]
                self._runs[-1] = (k, o, n + 1)
            else:
                self._runs.append((bt, counts[bt], 1))
            counts[bt] += 1
        self.n_attn = counts["attention"]
        self.n_mamba = counts["mamba"]
        rope = RopeConfig.from_hf_config(hf, self.head_dim) \
            if getattr(hf, "position_embedding_type", None) == "rope" \
            else None
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=getattr(hf, "attention_multiplier", None)
            or 1.0 / math.sqrt(self.head_dim),
            rope=rope)
        self.m_lin = self._method("mlp")
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")
        self._num_slots = 0

    def kv_pool_shape(self, num_pages: int, page_size: int):
        return (max(self.n_attn, 1), num_pages, page_size,
                2 * self.num_kv_heads, self.head_dim)

    def make_kv_pages(self, num_pages: int, page_size: int):
        g = self.geom
        slots = max(self._num_slots, 1)
        return {
            "kv": jnp.zeros(self.kv_pool_shape(num_pages, page_size),
                            self.config.kv_cache_dtype),
            "conv_state": jnp.zeros(
                (max(self.n_mamba, 1), slots, g.conv_dim,
                 g.conv_kernel - 1), jnp.float32),
            "ssm_state": jnp.zeros(
                (max(self.n_mamba, 1), slots, g.num_heads, g.head_dim,
                 g.state_size), jnp.float32),
        }

    def kv_pspec(self):
        return {"kv": P(), "conv_state": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import GraniteMoeHybridForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def _ff_params(self, sd, i):
        """MoE (packed input/output_linear) + shared MLP (packed)."""
        dt = self.dtype
        out = {}
        p = f"model.layers.{i}."
        b = p + "block_sparse_moe."
        if self.num_experts and b + "input_linear.weight" in sd:
            I = self.hf.intermediate_size
            w_in = np.asarray(sd[b + "input_linear.weight"])  # [E, 2I, H]
            w_out = np.asarray(sd[b + "output_linear.weight"])  # [E, H, I]
            out["moe_router"] = jnp.asarray(np.ascontiguousarray(
                np.transpose(np.asarray(sd[b + "router.layer.weight"]))),
                dt)
            out["moe_gate"] = jnp.asarray(
                np.transpose(w_in[:, :I, :], (0, 2, 1)), dt)
            out["moe_up"] = jnp.asarray(
                np.transpose(w_in[:, I:, :], (0, 2, 1)), dt)
            out["moe_down"] = jnp.asarray(
                np.transpose(w_out, (0, 2, 1)), dt)
        s = p + "shared_mlp."
        SI = self.shared_inter
        w_in = np.asarray(sd[s + "input_linear.weight"])      # [2SI, H]
        out["s_gate"] = quantize_linear(
            self.m_lin, np.ascontiguousarray(w_in[:SI].T), dtype=dt)
        out["s_up"] = quantize_linear(
            self.m_lin, np.ascontiguousarray(w_in[SI:].T), dtype=dt)
        out["s_down"] = quantize_linear(
            self.m_lin, np.ascontiguousarray(
                np.transpose(np.asarray(sd[s + "output_linear.weight"]))),
            dtype=dt)
        return out

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        arr = lambda n: jnp.asarray(np.asarray(sd[n]), dt)

        def layer_common(i):
            return {
                "norm": arr(f"model.layers.{i}.input_layernorm.weight"),
                "ff_norm": arr(
                    f"model.layers.{i}.post_attention_layernorm.weight"),
                **self._ff_params(sd, i),
            }

        def mamba_layer(i):
            out = load_mamba2_layer(sd, f"model.layers.{i}.mamba",
                                    self.m_lin, dt)
            out.update(layer_common(i))
            return out

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
                **layer_common(i),
            }

        stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
        runs, li = [], 0
        for kind, _, n in self._runs:
            mk = mamba_layer if kind == "mamba" else attn_layer
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
        normed = rms_norm(h, layer["ff_norm"], self.eps)
        out = jnp.zeros_like(h)
        if "moe_router" in layer:
            out = moe_mlp(normed, layer["moe_gate"], layer["moe_up"],
                          layer["moe_down"], layer["moe_router"],
                          top_k=self.top_k, backend="ragged",
                          renormalize=True)
        g = self.m_lin.apply(layer["s_gate"], normed)
        u = self.m_lin.apply(layer["s_up"], normed)
        a = jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u
        out = out + self.m_lin.apply(layer["s_down"], a)
        return h + self.residual_multiplier * out

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        if self.embedding_multiplier != 1.0:
            h = h * self.embedding_multiplier
        spec = self.attn_spec
        shard_mesh, shard_axis = self.attn_shard_args()
        kv = kv_pages["kv"]
        conv, ssm = kv_pages["conv_state"], kv_pages["ssm_state"]
        rm = self.residual_multiplier

        def mamba_body(h, xs):
            layer, cs, ss = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            out, nc, ns = mamba2_mixer(layer, normed, cs, ss, metadata,
                                       self.geom, self.m_lin, self.dtype)
            h = self._ff(layer, h + rm * out)
            return h, (nc, ns)

        def attn_body(h, xs):
            layer, pages = xs
            attn_out, pages = attention_block(
                layer, rms_norm(h, layer["norm"], self.eps), pages,
                metadata, spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale,
                mesh=shard_mesh, tp_axis=shard_axis)
            h = self._ff(layer, h + rm * attn_out)
            return h, pages

        new_kv, new_conv, new_ssm = [], [], []
        for run, (kind, o, n) in zip(params["runs"], self._runs):
            if kind == "mamba":
                h, (nc, ns) = jax.lax.scan(
                    mamba_body, h, (run, conv[o:o + n], ssm[o:o + n]))
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
        logits = logits.astype(jnp.float32)
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        return logits, out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
