"""Bamba: hybrid Mamba2 + attention decoder (IBM Bamba-9B family).

Behavioral reference: tensorrt_llm/_torch/models/modeling_nemotron_h.py
is the reference's analogous SSD-hybrid (layers_block_type walk,
hybrid cache); HF modeling_bamba.py is the numeric spec. Every layer is
(mamba2 | attention) + dense MLP with input/pre_ff RMSNorms; attention
uses GQA with PARTIAL rotary (partial_rotary_factor, typically 0.5).

TPU structure: consecutive same-type layers form RUNS; each run is one
``lax.scan`` over its stacked parameters and cache slice (run
boundaries are static), so the compiled graph is O(#runs), not
O(#layers). The hybrid cache is {paged KV for attention layers,
slot-indexed conv/ssm states for mamba layers}; chunked prefill and
prefix reuse are disabled (recurrent state is not block-addressable).
"""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig
from .mamba2 import Mamba2Geom, load_mamba2_layer, mamba2_mixer
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("bamba")
class BambaForCausalLM(DecoderModelForCausalLM):
    architectures = ("BambaForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        lim = getattr(hf, "time_step_limit", (0.0, float("inf")))
        inner = int(hf.mamba_expand * hf.hidden_size)
        self.geom = Mamba2Geom(
            intermediate=inner, num_heads=hf.mamba_n_heads,
            head_dim=inner // hf.mamba_n_heads,
            n_groups=hf.mamba_n_groups, state_size=hf.mamba_d_state,
            conv_kernel=hf.mamba_d_conv, dt_min=lim[0], dt_max=lim[1],
            eps=self.eps)
        self.block_types: List[str] = list(hf.layers_block_type)
        # runs of consecutive same-type layers; each becomes one scan
        self._runs: List[Tuple[str, int, int]] = []  # (kind, ord0, len)
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
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=RopeConfig.from_hf_config(hf, self.head_dim))
        self.m_lin = self._method("mlp")
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")
        self._num_slots = 0           # set by the engine

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
        from transformers import BambaForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def _ff_params(self, sd, i):
        dt = self.dtype
        p = f"model.layers.{i}.feed_forward."
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        return {
            "gate": quantize_linear(self.m_lin, t(p + "gate_proj.weight"),
                                    dtype=dt),
            "up": quantize_linear(self.m_lin, t(p + "up_proj.weight"),
                                  dtype=dt),
            "down": quantize_linear(self.m_lin, t(p + "down_proj.weight"),
                                    dtype=dt),
        }

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        arr = lambda n: jnp.asarray(np.asarray(sd[n]), dt)

        def layer_common(i):
            return {
                "norm": arr(f"model.layers.{i}.input_layernorm.weight"),
                "ff_norm": arr(f"model.layers.{i}.pre_ff_layernorm.weight"),
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
            "final_norm": arr("model.final_layernorm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dt),
        }

    # ------------------------------------------------------------------ #
    def _ff(self, layer, h):
        normed = rms_norm(h, layer["ff_norm"], self.eps)
        g = self.m_lin.apply(layer["gate"], normed)
        u = self.m_lin.apply(layer["up"], normed)
        a = jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u
        return h + self.m_lin.apply(layer["down"], a)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        shard_mesh, shard_axis = self.attn_shard_args()
        kv = kv_pages["kv"]
        conv, ssm = kv_pages["conv_state"], kv_pages["ssm_state"]

        def mamba_body(h, xs):
            layer, cs, ss = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            out, nc, ns = mamba2_mixer(layer, normed, cs, ss, metadata,
                                       self.geom, self.m_lin, self.dtype)
            h = self._ff(layer, h + out)
            return h, (nc, ns)

        def attn_body(h, xs):
            layer, pages = xs
            attn_out, pages = attention_block(
                layer, rms_norm(h, layer["norm"], self.eps), pages,
                metadata, spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale,
                mesh=shard_mesh, tp_axis=shard_axis)
            h = self._ff(layer, h + attn_out)
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
        return logits.astype(jnp.float32), out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
