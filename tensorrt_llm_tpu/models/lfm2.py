"""LFM2 (Liquid) short-conv hybrid + Apertus decoders.

Behavioral reference: the reference model matrix rows; HF
modeling_lfm2.py / modeling_apertus.py are the numeric specs.

  * LFM2: ``conv`` layers — in_proj → (B, C, x); depthwise causal conv
    over B·x (slot-cached, rides causal_conv1d); y = C · conv; out_proj
    — alternating with qk-layernormed GQA attention layers; swiglu FFN
    (w1/w3/w2) every layer; final ``embedding_norm``.
  * Apertus: llama body with per-head qk RMSNorm and a GATELESS MLP
    whose activation is xIELU (learnable alpha_p/alpha_n/beta/eps)."""
from __future__ import annotations

import math
from typing import Any, Dict, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig
from ..ops.ssm import causal_conv1d
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("lfm2")
class Lfm2ForCausalLM(DecoderModelForCausalLM):
    architectures = ("Lfm2ForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "norm_eps", getattr(hf, "rms_norm_eps",
                                                   1e-5))
        self.conv_k = hf.conv_L_cache
        self.block_types: List[str] = [
            "conv" if bt == "conv" else "full_attention"
            for bt in hf.layer_types]
        self._runs: List[Tuple[str, int, int]] = []
        counts = {"conv": 0, "full_attention": 0}
        for bt in self.block_types:
            if self._runs and self._runs[-1][0] == bt:
                kk, o, n = self._runs[-1]
                self._runs[-1] = (kk, o, n + 1)
            else:
                self._runs.append((bt, counts[bt], 1))
            counts[bt] += 1
        self.n_attn = counts["full_attention"]
        self.n_conv = counts["conv"]
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
                (max(self.n_conv, 1), slots, self.hidden_size,
                 self.conv_k - 1), jnp.float32),
        }

    def kv_pspec(self):
        return {"kv": P(), "conv_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import Lfm2ForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        arr = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)

        def common(i):
            p = f"model.layers.{i}."
            return {
                "norm": arr(p + "operator_norm.weight"),
                "ff_norm": arr(p + "ffn_norm.weight"),
                "w1": quantize_linear(self.m_lin,
                                      t(p + "feed_forward.w1.weight"),
                                      dtype=dt),
                "w3": quantize_linear(self.m_lin,
                                      t(p + "feed_forward.w3.weight"),
                                      dtype=dt),
                "w2": quantize_linear(self.m_lin,
                                      t(p + "feed_forward.w2.weight"),
                                      dtype=dt),
            }

        def conv_layer(i):
            p = f"model.layers.{i}.conv."
            H = self.hidden_size
            return {
                "in_proj": quantize_linear(
                    self.m_lin, t(p + "in_proj.weight"),
                    bias=np.asarray(sd[p + "in_proj.bias"])
                    if p + "in_proj.bias" in sd else None, dtype=dt),
                "conv_w": jnp.asarray(
                    np.asarray(sd[p + "conv.weight"])[:, 0, :],
                    jnp.float32),
                "conv_b": jnp.asarray(
                    sd.get(p + "conv.bias", np.zeros(H, np.float32)),
                    jnp.float32),
                "out_proj": quantize_linear(
                    self.m_lin, t(p + "out_proj.weight"),
                    bias=np.asarray(sd[p + "out_proj.bias"])
                    if p + "out_proj.bias" in sd else None, dtype=dt),
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
                "o": quantize_linear(self.m_o, t(a + "out_proj.weight"),
                                     dtype=dt),
                "q_norm": arr(a + "q_layernorm.weight"),
                "k_norm": arr(a + "k_layernorm.weight"),
                **common(i),
            }

        stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls)
        runs, li = [], 0
        for kind, _, n in self._runs:
            mk = conv_layer if kind == "conv" else attn_layer
            runs.append(stack([mk(li + j) for j in range(n)]))
            li += n
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dt)},
            "runs": tuple(runs),
            "final_norm": arr("model.embedding_norm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dt),
        }

    # ------------------------------------------------------------------ #
    def _ff(self, layer, h):
        normed = rms_norm(h, layer["ff_norm"], self.eps)
        g = self.m_lin.apply(layer["w1"], normed)
        u = self.m_lin.apply(layer["w3"], normed)
        a = jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u
        return h + self.m_lin.apply(layer["w2"], a)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        shard_mesh, shard_axis = self.attn_shard_args()
        kv = kv_pages["kv"]
        conv = kv_pages["conv_state"]
        H = self.hidden_size

        def qk_norm(which):
            def f(layer, u):
                return rms_norm(u, layer[which], self.eps)
            return f

        def conv_body(h, xs):
            layer, cs = xs
            normed = rms_norm(h, layer["norm"], self.eps)
            bcx = self.m_lin.apply(layer["in_proj"], normed)
            b, c, x = bcx[:, :H], bcx[:, H:2 * H], bcx[:, 2 * H:]
            bx = (b.astype(jnp.float32) * x.astype(jnp.float32)) \
                .astype(self.dtype)
            y, nc = causal_conv1d(bx, layer["conv_w"], layer["conv_b"],
                                  cs, metadata)
            y = (c.astype(jnp.float32) * y).astype(self.dtype)
            h = h + self.m_lin.apply(layer["out_proj"], y)
            h = self._ff(layer, h)
            return h, nc

        def attn_body(h, xs):
            layer, pages = xs
            attn_out, pages = attention_block(
                layer, rms_norm(h, layer["norm"], self.eps), pages,
                metadata, spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale,
                q_norm=qk_norm("q_norm"), k_norm=qk_norm("k_norm"),
                mesh=shard_mesh, tp_axis=shard_axis)
            h = self._ff(layer, h + attn_out)
            return h, pages

        new_kv, new_conv = [], []
        for run, (kind, o, n) in zip(params["runs"], self._runs):
            if kind == "conv":
                h, nc = jax.lax.scan(conv_body, h, (run, conv[o:o + n]))
                new_conv.append(nc)
            else:
                h, pages = jax.lax.scan(attn_body, h, (run, kv[o:o + n]))
                new_kv.append(pages)
        out_cache = {
            "kv": jnp.concatenate(new_kv, axis=0) if new_kv else kv,
            "conv_state": jnp.concatenate(new_conv, axis=0)
            if new_conv else conv,
        }
        h = rms_norm(h, params["final_norm"], self.eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)


@register_model("apertus")
class ApertusForCausalLM(DecoderModelForCausalLM):
    """Apertus: llama-shaped GQA with per-head qk RMSNorm and a
    GATELESS MLP using the learnable xIELU activation
    (softplus-parameterized alpha_p/alpha_n, fixed beta/eps buffers)."""
    architectures = ("ApertusForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=RopeConfig.from_hf_config(hf, self.head_dim))
        self.m_lin = self._method("mlp")
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")

    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import ApertusForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L, dt = self.num_layers, self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        arr = lambda n, d=None: jnp.asarray(np.asarray(sd[n]), d or dt)

        def layer(i):
            p = f"model.layers.{i}."
            a = p + "self_attn."
            return {
                "norm": arr(p + "attention_layernorm.weight"),
                "ff_norm": arr(p + "feedforward_layernorm.weight"),
                "q": quantize_linear(self.m_q, t(a + "q_proj.weight"),
                                     dtype=dt),
                "k": quantize_linear(self.m_q, t(a + "k_proj.weight"),
                                     dtype=dt),
                "v": quantize_linear(self.m_q, t(a + "v_proj.weight"),
                                     dtype=dt),
                "o": quantize_linear(self.m_o, t(a + "o_proj.weight"),
                                     dtype=dt),
                "q_norm": arr(a + "q_norm.weight"),
                "k_norm": arr(a + "k_norm.weight"),
                "up": quantize_linear(self.m_lin,
                                      t(p + "mlp.up_proj.weight"),
                                      dtype=dt),
                "down": quantize_linear(self.m_lin,
                                        t(p + "mlp.down_proj.weight"),
                                        dtype=dt),
                "alpha_p": jnp.asarray(
                    np.asarray(sd[p + "mlp.act_fn.alpha_p"]).reshape(()),
                    jnp.float32),
                "alpha_n": jnp.asarray(
                    np.asarray(sd[p + "mlp.act_fn.alpha_n"]).reshape(()),
                    jnp.float32),
                "act_beta": jnp.asarray(
                    np.asarray(sd[p + "mlp.act_fn.beta"]).reshape(()),
                    jnp.float32),
                "act_eps": jnp.asarray(
                    np.asarray(sd[p + "mlp.act_fn.eps"]).reshape(()),
                    jnp.float32),
            }

        layers = jax.tree.map(lambda *xs: jnp.stack(xs),
                              *[layer(i) for i in range(L)])
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dt)},
            "layers": layers,
            "final_norm": arr("model.norm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dt),
        }

    @staticmethod
    def _xielu(x, alpha_p, alpha_n, beta, eps):
        """HF XIELUActivation._xielu_python."""
        ap = jax.nn.softplus(alpha_p)
        an = beta + jax.nn.softplus(alpha_n)
        return jnp.where(
            x > 0,
            ap * x * x + beta * x,
            (jnp.expm1(jnp.minimum(x, eps)) - x) * an + beta * x)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        from ..ops.rope import rope_cos_sin
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        eps = self.eps
        cos_sin = rope_cos_sin(spec.rope, metadata.positions)
        shard_mesh, shard_axis = self.attn_shard_args()

        def qk_norm(which):
            def f(layer, u):
                return rms_norm(u, layer[which], eps)
            return f

        def body(h, xs):
            layer, pages = xs
            attn_out, pages = attention_block(
                layer, rms_norm(h, layer["norm"], eps), pages, metadata,
                spec, self.m_q, self.m_o,
                attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale, rope_cos_sin=cos_sin,
                q_norm=qk_norm("q_norm"), k_norm=qk_norm("k_norm"),
                mesh=shard_mesh, tp_axis=shard_axis)
            h = h + attn_out
            normed = rms_norm(h, layer["ff_norm"], eps)
            u = self.m_lin.apply(layer["up"], normed).astype(jnp.float32)
            a = self._xielu(u, layer["alpha_p"], layer["alpha_n"],
                            layer["act_beta"], layer["act_eps"])
            h = h + self.m_lin.apply(layer["down"], a.astype(self.dtype))
            return h, pages

        h, kv_pages = jax.lax.scan(body, h, (params["layers"], kv_pages))
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), kv_pages

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
