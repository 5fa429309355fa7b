"""GPT-OSS (OpenAI open-weight MoE): attention sinks + alternating
sliding/full attention + clamped-SwiGLU MoE with biases.

Behavioral reference: tensorrt_llm/_torch/models/modeling_gpt_oss.py
(sinks through the attention op, swiglu clamp in the MoE); HF
modeling_gpt_oss.py is the numeric spec. Specifics:

  * GQA with biases on q/k/v/o and a learned per-head SINK logit that
    joins the softmax and is dropped after normalization
    (ops/attention.py sinks= path).
  * ``layer_types`` alternates sliding/full attention — handled like
    Gemma-2 with a ``lax.cond`` over two AttentionSpecs in one scan.
  * MoE every layer: router (bias) → top-k → softmax over the selected
    logits; experts store INTERLEAVED gate/up columns and biases;
    activation is clamp(gate)·sigmoid(1.702·gate)·(clamp(up)+1).
  * YaRN rope at full head_dim.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig, rope_cos_sin
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)

_SWIGLU_ALPHA = 1.702


@register_model("gpt_oss")
class GptOssForCausalLM(DecoderModelForCausalLM):
    architectures = ("GptOssForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.num_experts = hf.num_local_experts
        self.top_k = hf.num_experts_per_tok
        self.sliding_window = hf.sliding_window
        self.swiglu_limit = getattr(hf, "swiglu_limit", 7.0)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=RopeConfig.from_hf_config(hf, self.head_dim),
            use_sinks=True)
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")

    def _layer_is_sliding(self, idx: int) -> bool:
        lt = getattr(self.hf, "layer_types", None)
        if lt is not None:
            return lt[idx] == "sliding_attention"
        return idx % 2 == 0

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import GptOssForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L, dtype = self.num_layers, self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))

        def stack_quant(method, fmt, bias_fmt=None):
            per = [quantize_linear(
                method, t(fmt.format(i)),
                bias=np.asarray(sd[bias_fmt.format(i)])
                if bias_fmt else None, dtype=dtype) for i in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        def stack_arr(fmt, dt=None):
            return jnp.stack([jnp.asarray(np.asarray(sd[fmt.format(i)]),
                                          dt or dtype) for i in range(L)])

        p = "model.layers.{}."
        a = p + "self_attn."
        e = p + "mlp.experts."
        if any(k.endswith("gate_up_proj_blocks") for k in sd):
            # MXFP4 checkpoint (the GPT-OSS release format): dequantize
            # *_blocks/*_scales pairs (quantization/mxfp4.py; reference:
            # modeling_gpt_oss.py:703, linear.py:2053) — blocks store
            # [E, out, in], the bf16 layout this loader expects is
            # [E, in, out]
            from ..quantization.mxfp4 import normalize_mxfp4_state_dict
            sd = normalize_mxfp4_state_dict(sd)
            for i in range(L):
                for nm in ("gate_up_proj", "down_proj"):
                    kk = e.format(i) + nm
                    sd[kk] = np.ascontiguousarray(
                        np.transpose(np.asarray(sd[kk]), (0, 2, 1)))
        # de-interleave the packed gate/up columns once at load
        gates, ups = [], []
        for i in range(L):
            gu = np.asarray(sd[e.format(i) + "gate_up_proj"])  # [E, H, 2I]
            gub = np.asarray(sd[e.format(i) + "gate_up_proj_bias"])
            gates.append((jnp.asarray(gu[:, :, 0::2], dtype),
                          jnp.asarray(gub[:, 0::2], jnp.float32)))
            ups.append((jnp.asarray(gu[:, :, 1::2], dtype),
                        jnp.asarray(gub[:, 1::2], jnp.float32)))
        layers = {
            "input_norm": stack_arr(p + "input_layernorm.weight"),
            "post_norm": stack_arr(p + "post_attention_layernorm.weight"),
            "q": stack_quant(self.m_q, a + "q_proj.weight",
                             a + "q_proj.bias"),
            "k": stack_quant(self.m_q, a + "k_proj.weight",
                             a + "k_proj.bias"),
            "v": stack_quant(self.m_q, a + "v_proj.weight",
                             a + "v_proj.bias"),
            "o": stack_quant(self.m_o, a + "o_proj.weight",
                             a + "o_proj.bias"),
            "sinks": stack_arr(a + "sinks", jnp.float32),
            "router": stack_arr(p + "mlp.router.weight""", dtype)
            .transpose(0, 2, 1),
            "router_bias": stack_arr(p + "mlp.router.bias", jnp.float32),
            "w_gate": jnp.stack([g for g, _ in gates]),
            "b_gate": jnp.stack([b for _, b in gates]),
            "w_up": jnp.stack([u for u, _ in ups]),
            "b_up": jnp.stack([b for _, b in ups]),
            "w_down": stack_arr(e + "down_proj", dtype),
            "b_down": stack_arr(e + "down_proj_bias", jnp.float32),
            "is_sliding": jnp.asarray(
                [self._layer_is_sliding(i) for i in range(L)], jnp.bool_),
        }
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "layers": layers,
            "final_norm": jnp.asarray(sd["model.norm.weight"], dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dtype),
        }

    # ------------------------------------------------------------------ #
    def _moe(self, layer, x):
        """Top-k clamped-SwiGLU MoE with expert biases (ragged GEMM)."""
        T, H = x.shape
        E, k, lim = self.num_experts, self.top_k, self.swiglu_limit
        logits = jnp.dot(x, layer["router"],
                         preferred_element_type=jnp.float32) + \
            layer["router_bias"][None, :]
        top_vals, idx = jax.lax.top_k(logits, k)
        w = jax.nn.softmax(top_vals, axis=-1)

        M = T * k
        flat_e = idx.reshape(M)
        order = jnp.argsort(flat_e)
        tok_of = order // k
        xs = x[tok_of]
        se = flat_e[order]
        group_sizes = jnp.bincount(se, length=E).astype(jnp.int32)

        g = jax.lax.ragged_dot(xs, layer["w_gate"], group_sizes) \
            .astype(jnp.float32) + layer["b_gate"][se]
        u = jax.lax.ragged_dot(xs, layer["w_up"], group_sizes) \
            .astype(jnp.float32) + layer["b_up"][se]
        g = jnp.minimum(g, lim)
        u = jnp.clip(u, -lim, lim)
        act = (u + 1.0) * (g * jax.nn.sigmoid(_SWIGLU_ALPHA * g))
        y = jax.lax.ragged_dot(act.astype(x.dtype), layer["w_down"],
                               group_sizes).astype(jnp.float32) + \
            layer["b_down"][se]
        wv = w.reshape(M)[order]
        out = jnp.zeros((T, H), jnp.float32).at[tok_of].add(y * wv[:, None])
        return out.astype(x.dtype)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        eps = self.eps
        cos_sin = rope_cos_sin(spec.rope, metadata.positions)
        import dataclasses
        sliding_spec = dataclasses.replace(
            spec, sliding_window=self.sliding_window)
        shard_mesh, shard_axis = self.attn_shard_args()

        def attn(which_spec, layer, normed, layer_kv, md):
            return attention_block(
                layer, normed, layer_kv, md, which_spec,
                self.m_q, self.m_o, attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale, rope_cos_sin=cos_sin,
                mesh=shard_mesh, tp_axis=shard_axis)

        # pool-as-carry threading (ops/attention.py layer_metadata)
        from ..ops.attention import layer_metadata
        L_n, P_n, ps_n = kv_pages.shape[:3]
        kv_flat = kv_pages.reshape((L_n * P_n,) + kv_pages.shape[2:])

        def layer_body(carry, xs):
            h, kvf = carry
            layer, li = xs
            md_l = layer_metadata(metadata, li, P_n, ps_n, L_n)
            normed = rms_norm(h, layer["input_norm"], eps)
            attn_out, kvf = jax.lax.cond(
                layer["is_sliding"],
                lambda args: attn(sliding_spec, *args),
                lambda args: attn(spec, *args),
                (layer, normed, kvf, md_l))
            h = h + attn_out
            normed = rms_norm(h, layer["post_norm"], eps)
            h = h + self._moe(layer, normed)
            return (h, kvf), None

        (h, kv_flat), _ = jax.lax.scan(
            layer_body, (h, kv_flat),
            (params["layers"], jnp.arange(L_n, dtype=jnp.int32)))
        kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), kv_pages

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
