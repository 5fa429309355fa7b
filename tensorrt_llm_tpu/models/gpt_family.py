"""LayerNorm-family decoders: GPT-NeoX/Pythia, GPT-J, Falcon,
StarCoder2, Nemotron.

Behavioral reference: tensorrt_llm/_torch/models/modeling_gpt_neox-like
paths and HF transformers numerics. One generic block with knobs
instead of five near-copies:

  * block style: sequential (h += attn(ln1 h); h += mlp(ln2 h)) or
    parallel (h += attn(ln1 h) + mlp(ln2 h or ln1 h)) — the GPT-J /
    Falcon / NeoX parallel-residual form.
  * norm: LayerNorm with/without bias; Nemotron's layernorm1p is folded
    at load (weight+1).
  * MLP: plain fc→act→proj with gelu / tanh-gelu / relu².
  * RoPE: partial rotary fraction, neox or interleaved style.

Each subclass only maps HF weight names (and fused-QKV layouts) onto
the shared layer layout {ln1, ln2, q, k, v, o, fc, proj}.
"""
from __future__ import annotations

import math
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttentionMetadata
from ..ops.norm import layer_norm
from ..ops.rope import RopeConfig, rope_cos_sin
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)

_ACTS: Dict[str, Callable] = {
    "gelu": jax.nn.gelu,
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "gelu_pytorch_tanh": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "relu2": lambda x: jnp.square(jax.nn.relu(x)),
    "silu": jax.nn.silu,
}


class LnFamilyModel(DecoderModelForCausalLM):
    """Shared forward for the LayerNorm GPT family."""

    # knobs set by subclasses
    parallel_block = False
    shared_ln = False          # parallel with ONE ln (gpt-j, falcon-7b)
    act_name = "gelu"
    attn_bias = True
    mlp_bias = True
    final_ln_bias = True
    gated_mlp = False          # cohere: silu(gate) * up -> proj
    logit_scale = 1.0

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.inner = self._inner_size()
        self.ln_eps = self._ln_eps()
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=self._rope_config())
        self.m_attn = self._method("attn")
        self.m_mlp = self._method("mlp")
        self.m_lm_head = self._method("lm_head")
        # per-layer sliding alternation + rope variants (Cohere2-style);
        # same hook contract as the Llama base
        self.sliding_spec = None
        # learned-position offset (OPT stores positions at index pos+2)
        self.pos_offset = 0

    def _rope_variants(self, positions, cos_sin):
        return cos_sin

    def _layer_rope(self, layer, variants):
        return variants

    # ---- subclass hooks ------------------------------------------------
    def _inner_size(self) -> int:
        return getattr(self.hf, "intermediate_size", None) or \
            4 * self.hf.hidden_size

    def _ln_eps(self) -> float:
        for name in ("layer_norm_eps", "layer_norm_epsilon", "norm_eps"):
            if getattr(self.hf, name, None) is not None:
                return getattr(self.hf, name)
        return 1e-5

    def _rope_config(self) -> Optional[RopeConfig]:
        return RopeConfig.from_hf_config(self.hf, self.head_dim)

    # ---- init/load -----------------------------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        H, V, I = self.hidden_size, self.vocab_size, self.inner
        L = self.num_layers
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        r = np.random.default_rng(0)

        def mat(shape):
            return (r.standard_normal(shape, np.float32) * 0.02)

        def lin(method, kshape, bias):
            per = [quantize_linear(method, mat(kshape),
                                   bias=np.zeros(kshape[1], np.float32)
                                   if bias else None, dtype=self.dtype)
                   for _ in range(L)]
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        layers = {
            "ln1": {"w": jnp.ones((L, H), self.dtype),
                    "b": jnp.zeros((L, H), self.dtype)},
            "q": lin(self.m_attn, (H, nq * hd), self.attn_bias),
            "k": lin(self.m_attn, (H, nkv * hd), self.attn_bias),
            "v": lin(self.m_attn, (H, nkv * hd), self.attn_bias),
            "o": lin(self.m_attn, (nq * hd, H), self.attn_bias),
            "fc": lin(self.m_mlp, (H, I), self.mlp_bias),
            "proj": lin(self.m_mlp, (I, H), self.mlp_bias),
        }
        if self.gated_mlp:
            layers["fc2"] = lin(self.m_mlp, (H, I), self.mlp_bias)
        if not (self.parallel_block and self.shared_ln):
            layers["ln2"] = {"w": jnp.ones((L, H), self.dtype),
                             "b": jnp.zeros((L, H), self.dtype)}
        return {
            "embed": {"weight": jnp.asarray(mat((V, H)), self.dtype)},
            "layers": layers,
            "final_norm": {"w": jnp.ones((H,), self.dtype),
                           "b": jnp.zeros((H,), self.dtype)},
            "lm_head": quantize_linear(self.m_lm_head, mat((H, V)),
                                       dtype=self.dtype),
        }

    # ---- forward -------------------------------------------------------
    def forward(self, params: Dict[str, Any], token_ids: jax.Array,
                kv_pages: jax.Array, metadata: AttentionMetadata,
                input_embeds=None, lora=None, lora_slots=None,
                collect_kv_stats: bool = False):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        eps = self.ln_eps
        act = _ACTS[self.act_name]
        if "wpe" in params:      # learned positions (OPT stores at +2)
            h = h + params["wpe"][metadata.positions
                                  + self.pos_offset].astype(self.dtype)
        if "embed_ln" in params:   # bloom word_embeddings_layernorm
            h = layer_norm(h, params["embed_ln"]["w"],
                           params["embed_ln"].get("b"), eps)
        cos_sin = rope_cos_sin(spec.rope, metadata.positions) \
            if spec.rope is not None else None
        shard_mesh, shard_axis = self.attn_shard_args()

        def ln(x, p):
            return layer_norm(x, p["w"], p.get("b"), eps)

        def mlp(layer, x):
            if self.gated_mlp:
                g = self.m_mlp.apply(layer["fc"], x)
                u = self.m_mlp.apply(layer["fc2"], x)
                a = (act(g.astype(jnp.float32)).astype(self.dtype) * u)
            else:
                a = act(self.m_mlp.apply(layer["fc"], x)
                        .astype(jnp.float32)).astype(self.dtype)
            return self.m_mlp.apply(layer["proj"], a)

        rope_variants = self._rope_variants(metadata.positions, cos_sin)

        # pool-as-carry threading (ops/attention.py layer_metadata)
        from ..ops.attention import layer_metadata
        L_n, P_n, ps_n = kv_pages.shape[:3]
        kv_flat = kv_pages.reshape((L_n * P_n,) + kv_pages.shape[2:])

        def layer_body(carry, xs):
            h, kvf = carry
            layer, li = xs
            md_l = layer_metadata(metadata, li, P_n, ps_n, L_n)
            x1 = ln(h, layer["ln1"])
            cs = self._layer_rope(layer, rope_variants)

            def run_attn(which_spec):
                return attention_block(
                    layer, x1, kvf, md_l, which_spec,
                    self.m_attn, self.m_attn,
                    attn_backend=self.attn_backend,
                    kv_scale=self.config.kv_scale, rope_cos_sin=cs,
                    mesh=shard_mesh, tp_axis=shard_axis)

            if self.sliding_spec is not None:
                attn_out, kvf = jax.lax.cond(
                    layer["is_sliding"],
                    lambda _: run_attn(self.sliding_spec),
                    lambda _: run_attn(spec), None)
            else:
                attn_out, kvf = run_attn(spec)
            if self.parallel_block:
                x2 = x1 if self.shared_ln else ln(h, layer["ln2"])
                h = h + attn_out + mlp(layer, x2)
            else:
                h = h + attn_out
                h = h + mlp(layer, ln(h, layer["ln2"]))
            return (h, kvf), None

        (h, kv_flat), _ = jax.lax.scan(
            layer_body, (h, kv_flat),
            (params["layers"], jnp.arange(L_n, dtype=jnp.int32)))
        kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        h = layer_norm(h, params["final_norm"]["w"],
                       params["final_norm"].get("b"), eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if self.logit_scale != 1.0:
            logits = logits * self.logit_scale
        return logits, kv_pages

    # ---- sharding ------------------------------------------------------
    def param_pspecs(self, params) -> Any:
        def linear_spec(p, col: bool):
            spec = {}
            for k, v in p.items():
                nd = v.ndim
                lead = [None] * (nd - 2)
                if k == "weight":
                    spec[k] = P(*lead, "tp" if not col else None,
                                "tp" if col else None)
                else:
                    spec[k] = P(*([None] * (nd - 1)),
                                "tp" if col else None) if nd >= 1 else P()
            return spec

        layers = params["layers"]
        ls = {
            "ln1": jax.tree.map(lambda _: P(None, None), layers["ln1"]),
            "q": linear_spec(layers["q"], True),
            "k": linear_spec(layers["k"], True),
            "v": linear_spec(layers["v"], True),
            "o": linear_spec(layers["o"], False),
            "fc": linear_spec(layers["fc"], True),
            "proj": linear_spec(layers["proj"], False),
        }
        if "ln2" in layers:
            ls["ln2"] = jax.tree.map(lambda _: P(None, None), layers["ln2"])
        if "fc2" in layers:
            ls["fc2"] = linear_spec(layers["fc2"], True)
        return {
            "embed": {"weight": P(None, None)},
            "layers": ls,
            "final_norm": jax.tree.map(lambda _: P(None),
                                       params["final_norm"]),
            "lm_head": linear_spec(params["lm_head"], True),
        }

    # ---- load helpers --------------------------------------------------
    def _stack_lin(self, method, sd, fmt, L, transpose=True,
                   bias_fmt=None):
        from .modeling_utils import hf_transpose
        per = []
        for i in range(L):
            w = sd[fmt.format(i)]
            if transpose:
                w = hf_transpose(w)
            bias = sd.get((bias_fmt or fmt.replace(".weight", ".bias"))
                          .format(i))
            per.append(quantize_linear(method, w, bias=bias,
                                       dtype=self.dtype))
        return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

    def _stack_ln(self, sd, wfmt, L, bfmt=None, plus_one=False):
        w = np.stack([np.asarray(sd[wfmt.format(i)], np.float32)
                      for i in range(L)])
        if plus_one:
            w = w + 1.0
        out = {"w": jnp.asarray(w, self.dtype)}
        if bfmt is not None and bfmt.format(0) in sd:
            out["b"] = jnp.stack([
                jnp.asarray(sd[bfmt.format(i)], self.dtype)
                for i in range(L)])
        return out


@register_model("gpt_neox")
class GPTNeoXForCausalLM(LnFamilyModel):
    """Pythia / GPT-NeoX: fused per-head-interleaved QKV, optional
    parallel residual with separate MLP norm, partial rotary."""
    architectures = ("GPTNeoXForCausalLM",)
    act_name = "gelu"

    def __init__(self, model_config):
        self.parallel_block = getattr(model_config.hf_config,
                                      "use_parallel_residual", True)
        super().__init__(model_config)

    def load_hf_state_dict(self, sd):
        L, H = self.num_layers, self.hidden_size
        nh, hd = self.num_heads, self.head_dim
        pre = "gpt_neox.layers.{}."
        split_sd = dict(sd)
        for i in range(L):
            w = np.asarray(sd[pre.format(i) +
                              "attention.query_key_value.weight"])
            b = np.asarray(sd[pre.format(i) +
                              "attention.query_key_value.bias"])
            # [nh, 3, hd, H] per-head interleave
            w = w.reshape(nh, 3, hd, H)
            b = b.reshape(nh, 3, hd)
            for j, name in enumerate("qkv"):
                split_sd[pre.format(i) + f"attention.{name}.weight"] = \
                    w[:, j].reshape(nh * hd, H)
                split_sd[pre.format(i) + f"attention.{name}.bias"] = \
                    b[:, j].reshape(nh * hd)
        sd = split_sd
        layers = {
            "ln1": self._stack_ln(sd, pre + "input_layernorm.weight", L,
                                  pre + "input_layernorm.bias"),
            "ln2": self._stack_ln(sd, pre + "post_attention_layernorm.weight",
                                  L, pre + "post_attention_layernorm.bias"),
            "q": self._stack_lin(self.m_attn, sd, pre + "attention.q.weight", L),
            "k": self._stack_lin(self.m_attn, sd, pre + "attention.k.weight", L),
            "v": self._stack_lin(self.m_attn, sd, pre + "attention.v.weight", L),
            "o": self._stack_lin(self.m_attn, sd, pre + "attention.dense.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd,
                                  pre + "mlp.dense_h_to_4h.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.dense_4h_to_h.weight", L),
        }
        from .modeling_utils import hf_transpose
        return {
            "embed": {"weight": jnp.asarray(sd["gpt_neox.embed_in.weight"],
                                            self.dtype)},
            "layers": layers,
            "final_norm": {
                "w": jnp.asarray(sd["gpt_neox.final_layer_norm.weight"],
                                 self.dtype),
                "b": jnp.asarray(sd["gpt_neox.final_layer_norm.bias"],
                                 self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head, hf_transpose(sd["embed_out.weight"]),
                dtype=self.dtype),
        }


@register_model("gptj")
class GPTJForCausalLM(LnFamilyModel):
    """GPT-J 6B: parallel block with one shared LN, interleaved partial
    rotary, biased MLP / unbiased attention, lm_head with bias."""
    architectures = ("GPTJForCausalLM",)
    parallel_block = True
    shared_ln = True
    act_name = "gelu_new"
    attn_bias = False

    def _inner_size(self):
        return getattr(self.hf, "n_inner", None) or 4 * self.hf.n_embd

    @property
    def num_layers(self):
        return self.hf.n_layer

    @property
    def num_kv_heads(self):
        return self.hf.n_head

    @property
    def head_dim(self):
        return self.hf.n_embd // self.hf.n_head

    def __init__(self, model_config):
        hf = model_config.hf_config
        hf.hidden_size = hf.n_embd
        hf.num_attention_heads = hf.n_head
        super().__init__(model_config)

    def _rope_config(self):
        hd = self.head_dim
        return RopeConfig(
            head_dim=hd, rope_theta=10000.0,
            max_position_embeddings=self.hf.n_positions,
            is_neox=False,
            partial_rotary_factor=(self.hf.rotary_dim or hd) / hd)

    def load_hf_state_dict(self, sd):
        L = self.num_layers
        pre = "transformer.h.{}."
        layers = {
            "ln1": self._stack_ln(sd, pre + "ln_1.weight", L,
                                  pre + "ln_1.bias"),
            "q": self._stack_lin(self.m_attn, sd, pre + "attn.q_proj.weight", L),
            "k": self._stack_lin(self.m_attn, sd, pre + "attn.k_proj.weight", L),
            "v": self._stack_lin(self.m_attn, sd, pre + "attn.v_proj.weight", L),
            "o": self._stack_lin(self.m_attn, sd, pre + "attn.out_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd, pre + "mlp.fc_in.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd, pre + "mlp.fc_out.weight", L),
        }
        from .modeling_utils import hf_transpose
        return {
            "embed": {"weight": jnp.asarray(sd["transformer.wte.weight"],
                                            self.dtype)},
            "layers": layers,
            "final_norm": {
                "w": jnp.asarray(sd["transformer.ln_f.weight"], self.dtype),
                "b": jnp.asarray(sd["transformer.ln_f.bias"], self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head, hf_transpose(sd["lm_head.weight"]),
                bias=sd.get("lm_head.bias"), dtype=self.dtype),
        }


@register_model("falcon")
class FalconForCausalLM(LnFamilyModel):
    """Falcon 7B/40B: fused grouped QKV, parallel attention, MQA/GQA."""
    architectures = ("FalconForCausalLM",)
    act_name = "gelu"
    mlp_bias = False

    def __init__(self, model_config):
        hf = model_config.hf_config
        self.parallel_block = getattr(hf, "parallel_attn", True)
        self.new_arch = getattr(hf, "new_decoder_architecture", False)
        self.shared_ln = not self.new_arch
        self.attn_bias = getattr(hf, "bias", False)
        self.mlp_bias = getattr(hf, "bias", False)
        super().__init__(model_config)

    @property
    def num_kv_heads(self):
        hf = self.hf
        if getattr(hf, "new_decoder_architecture", False):
            return hf.num_kv_heads
        if getattr(hf, "multi_query", True):
            return 1
        return hf.num_attention_heads

    def load_hf_state_dict(self, sd):
        L, H = self.num_layers, self.hidden_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        pre = "transformer.h.{}."
        split_sd = dict(sd)
        for i in range(L):
            w = np.asarray(sd[pre.format(i) +
                              "self_attention.query_key_value.weight"])
            # grouped layout: [nkv, nq//nkv + 2, hd, H]
            w = w.reshape(nkv, nq // nkv + 2, hd, H)
            q = w[:, :-2].reshape(nq * hd, H)
            k = w[:, -2].reshape(nkv * hd, H)
            v = w[:, -1].reshape(nkv * hd, H)
            split_sd[pre.format(i) + "self_attention.q.weight"] = q
            split_sd[pre.format(i) + "self_attention.k.weight"] = k
            split_sd[pre.format(i) + "self_attention.v.weight"] = v
        sd = split_sd
        ln1_w = pre + ("ln_attn.weight" if self.new_arch
                       else "input_layernorm.weight")
        ln1_b = pre + ("ln_attn.bias" if self.new_arch
                       else "input_layernorm.bias")
        layers = {
            "ln1": self._stack_ln(sd, ln1_w, L, ln1_b),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.q.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.k.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.v.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.dense.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd,
                                  pre + "mlp.dense_h_to_4h.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.dense_4h_to_h.weight", L),
        }
        if self.new_arch:
            layers["ln2"] = self._stack_ln(sd, pre + "ln_mlp.weight", L,
                                           pre + "ln_mlp.bias")
        from .modeling_utils import hf_transpose
        return {
            "embed": {"weight": jnp.asarray(
                sd["transformer.word_embeddings.weight"], self.dtype)},
            "layers": layers,
            "final_norm": {
                "w": jnp.asarray(sd["transformer.ln_f.weight"], self.dtype),
                "b": jnp.asarray(sd["transformer.ln_f.bias"], self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head, hf_transpose(sd["lm_head.weight"]),
                dtype=self.dtype),
        }


@register_model("starcoder2")
class Starcoder2ForCausalLM(LnFamilyModel):
    """StarCoder2: llama-shaped module names, LayerNorm + plain
    tanh-gelu MLP, biased projections, sliding window optional."""
    architectures = ("Starcoder2ForCausalLM",)
    act_name = "gelu_pytorch_tanh"

    def __init__(self, model_config):
        super().__init__(model_config)
        import dataclasses
        sw = getattr(self.hf, "sliding_window", None)
        if sw:
            self.attn_spec = dataclasses.replace(self.attn_spec,
                                                 sliding_window=sw)

    def load_hf_state_dict(self, sd):
        L = self.num_layers
        pre = "model.layers.{}."
        layers = {
            "ln1": self._stack_ln(sd, pre + "input_layernorm.weight", L,
                                  pre + "input_layernorm.bias"),
            "ln2": self._stack_ln(sd, pre + "post_attention_layernorm.weight",
                                  L, pre + "post_attention_layernorm.bias"),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.q_proj.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.k_proj.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.v_proj.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.o_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd, pre + "mlp.c_fc.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.c_proj.weight", L),
        }
        from .modeling_utils import hf_transpose
        fn = {"w": jnp.asarray(sd["model.norm.weight"], self.dtype)}
        if "model.norm.bias" in sd:
            fn["b"] = jnp.asarray(sd["model.norm.bias"], self.dtype)
        lm_w = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
        return {
            "embed": {"weight": jnp.asarray(
                sd["model.embed_tokens.weight"], self.dtype)},
            "layers": layers,
            "final_norm": fn,
            "lm_head": quantize_linear(self.m_lm_head, hf_transpose(lm_w),
                                       dtype=self.dtype),
        }


@register_model("cohere")
class CohereForCausalLM(LnFamilyModel):
    """Cohere Command-R: parallel attention+MLP with one shared bias-free
    LayerNorm, gated silu MLP, interleaved RoPE, tied embeddings scaled
    by logit_scale."""
    architectures = ("CohereForCausalLM",)
    parallel_block = True
    shared_ln = True
    gated_mlp = True
    act_name = "silu"
    attn_bias = False
    mlp_bias = False

    def __init__(self, model_config):
        super().__init__(model_config)
        if getattr(self.hf, "use_qk_norm", False):
            raise NotImplementedError("cohere use_qk_norm not supported")
        self.logit_scale = getattr(self.hf, "logit_scale", 1.0)

    def _rope_config(self):
        return RopeConfig(
            head_dim=self.head_dim,
            rope_theta=getattr(self.hf, "rope_theta", 10000.0),
            max_position_embeddings=self.hf.max_position_embeddings,
            is_neox=False)

    def load_hf_state_dict(self, sd):
        L = self.num_layers
        pre = "model.layers.{}."
        layers = {
            "ln1": self._stack_ln(sd, pre + "input_layernorm.weight", L),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.q_proj.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.k_proj.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.v_proj.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.o_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd,
                                  pre + "mlp.gate_proj.weight", L),
            "fc2": self._stack_lin(self.m_mlp, sd,
                                   pre + "mlp.up_proj.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.down_proj.weight", L),
        }
        from .modeling_utils import hf_transpose
        return {
            "embed": {"weight": jnp.asarray(
                sd["model.embed_tokens.weight"], self.dtype)},
            "layers": layers,
            "final_norm": {"w": jnp.asarray(sd["model.norm.weight"],
                                            self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head,
                hf_transpose(sd.get("lm_head.weight",
                                    sd["model.embed_tokens.weight"])),
                dtype=self.dtype),
        }


@register_model("nemotron")
class NemotronForCausalLM(LnFamilyModel):
    """Nemotron: layernorm1p (weight+1 folded at load), squared-ReLU
    plain MLP, partial rotary, no biases."""
    architectures = ("NemotronForCausalLM",)
    act_name = "relu2"
    attn_bias = False
    mlp_bias = False

    def _rope_config(self):
        hd = self.head_dim
        pct = getattr(self.hf, "partial_rotary_factor",
                      getattr(self.hf, "rope_percent", 0.5))
        return RopeConfig(
            head_dim=hd,
            rope_theta=getattr(self.hf, "rope_theta", 10000.0),
            max_position_embeddings=self.hf.max_position_embeddings,
            partial_rotary_factor=pct)

    def load_hf_state_dict(self, sd):
        L = self.num_layers
        pre = "model.layers.{}."
        layers = {
            "ln1": self._stack_ln(sd, pre + "input_layernorm.weight", L,
                                  pre + "input_layernorm.bias",
                                  plus_one=True),
            "ln2": self._stack_ln(sd, pre + "post_attention_layernorm.weight",
                                  L, pre + "post_attention_layernorm.bias",
                                  plus_one=True),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.q_proj.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.k_proj.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.v_proj.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.o_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd, pre + "mlp.up_proj.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.down_proj.weight", L),
        }
        from .modeling_utils import hf_transpose
        return {
            "embed": {"weight": jnp.asarray(
                sd["model.embed_tokens.weight"], self.dtype)},
            "layers": layers,
            "final_norm": {
                "w": jnp.asarray(np.asarray(sd["model.norm.weight"],
                                            np.float32) + 1.0, self.dtype),
                "b": jnp.asarray(sd["model.norm.bias"], self.dtype)
                if "model.norm.bias" in sd else jnp.zeros(
                    (self.hidden_size,), self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head, hf_transpose(sd["lm_head.weight"]),
                dtype=self.dtype),
        }


@register_model("cohere2")
class Cohere2ForCausalLM(CohereForCausalLM):
    """Cohere2 (Command-R7B): the Cohere parallel block plus 3:1
    sliding/global alternation where RoPE applies ONLY on sliding
    layers (global layers are NoPE). Reference:
    tensorrt_llm/_torch/models/modeling_cohere2.py."""
    architectures = ("Cohere2ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        import dataclasses as _dc
        hf = self.hf
        sw = getattr(hf, "sliding_window", None)
        self._layer_sliding = [
            lt == "sliding_attention"
            for lt in (getattr(hf, "layer_types", None) or
                       ["full_attention"] * self.num_layers)]
        if sw and any(self._layer_sliding):
            self.sliding_spec = _dc.replace(self.attn_spec,
                                            sliding_window=sw)

    def _rope_variants(self, positions, cos_sin):
        cos, sin = cos_sin
        return (cos, sin, jnp.ones_like(cos), jnp.zeros_like(sin))

    def _layer_rope(self, layer, variants):
        cos, sin, one, zero = variants
        if self.sliding_spec is None:
            return cos, sin
        use = layer["is_sliding"]
        return jnp.where(use, cos, one), jnp.where(use, sin, zero)

    def load_hf_state_dict(self, sd):
        params = super().load_hf_state_dict(sd)
        params["layers"]["is_sliding"] = jnp.asarray(
            self._layer_sliding[:self.num_layers], jnp.bool_)
        return params

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        layers = dict(params["layers"])
        flag = layers.pop("is_sliding", None)
        spec = super().param_pspecs({**params, "layers": layers})
        if flag is not None:
            spec["layers"]["is_sliding"] = P(None)
        return spec


@register_model("stablelm")
class StableLmForCausalLM(LnFamilyModel):
    """StableLM-2: LayerNorm (biased), gated silu MLP, partial rotary
    (factor 0.25 default)."""
    architectures = ("StableLmForCausalLM",)
    gated_mlp = True
    act_name = "silu"

    def _rope_config(self):
        hf = self.hf
        return RopeConfig(
            head_dim=self.head_dim,
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            max_position_embeddings=hf.max_position_embeddings,
            partial_rotary_factor=getattr(hf, "partial_rotary_factor",
                                          0.25))

    def load_hf_state_dict(self, sd):
        L = self.num_layers
        pre = "model.layers.{}."
        layers = {
            "ln1": self._stack_ln(sd, pre + "input_layernorm.weight", L,
                                  pre + "input_layernorm.bias"),
            "ln2": self._stack_ln(sd, pre + "post_attention_layernorm.weight",
                                  L, pre + "post_attention_layernorm.bias"),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.q_proj.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.k_proj.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.v_proj.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.o_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd,
                                  pre + "mlp.gate_proj.weight", L),
            "fc2": self._stack_lin(self.m_mlp, sd,
                                   pre + "mlp.up_proj.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.down_proj.weight", L),
        }
        from .modeling_utils import hf_transpose
        fn = {"w": jnp.asarray(sd["model.norm.weight"], self.dtype),
              "b": jnp.asarray(sd["model.norm.bias"], self.dtype)}
        lm_w = sd.get("lm_head.weight", sd["model.embed_tokens.weight"])
        return {
            "embed": {"weight": jnp.asarray(
                sd["model.embed_tokens.weight"], self.dtype)},
            "layers": layers,
            "final_norm": fn,
            "lm_head": quantize_linear(self.m_lm_head, hf_transpose(lm_w),
                                       dtype=self.dtype),
        }


@register_model("bloom")
class BloomForCausalLM(LnFamilyModel):
    """BLOOM: ALiBi attention (no rope/positions), embedding LayerNorm,
    per-head-interleaved fused QKV, biased projections, gelu MLP.
    Reference role: the reference's bloom family support."""
    architectures = ("BloomForCausalLM",)
    act_name = "gelu_pytorch_tanh"

    def __init__(self, model_config):
        super().__init__(model_config)
        import dataclasses as _dc
        from .modeling_utils import alibi_slopes
        self.attn_spec = _dc.replace(
            self.attn_spec, rope=None,
            alibi_slopes=alibi_slopes(self.num_heads))

    def _rope_config(self):
        return None

    def load_hf_state_dict(self, sd):
        L, H = self.num_layers, self.hidden_size
        nq, hd = self.num_heads, self.head_dim
        pre = "transformer.h.{}."
        sd = {k[len("transformer."):] if False else k: v
              for k, v in sd.items()}
        split = dict(sd)
        for i in range(L):
            w = np.asarray(
                sd[pre.format(i) + "self_attention.query_key_value.weight"])
            b = np.asarray(
                sd[pre.format(i) + "self_attention.query_key_value.bias"])
            # bloom fuses per head: [heads, 3, hd, H]
            w = w.reshape(nq, 3, hd, H)
            b = b.reshape(nq, 3, hd)
            for j, n in enumerate("qkv"):
                split[pre.format(i) + f"self_attention.{n}.weight"] = \
                    w[:, j].reshape(nq * hd, H)
                split[pre.format(i) + f"self_attention.{n}.bias"] = \
                    b[:, j].reshape(nq * hd)
        sd = split
        layers = {
            "ln1": self._stack_ln(sd, pre + "input_layernorm.weight", L,
                                  pre + "input_layernorm.bias"),
            "ln2": self._stack_ln(sd,
                                  pre + "post_attention_layernorm.weight",
                                  L, pre + "post_attention_layernorm.bias"),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.q.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.k.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.v.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attention.dense.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd,
                                  pre + "mlp.dense_h_to_4h.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "mlp.dense_4h_to_h.weight", L),
        }
        from .modeling_utils import hf_transpose
        wte = sd["transformer.word_embeddings.weight"]
        return {
            "embed": {"weight": jnp.asarray(wte, self.dtype)},
            "embed_ln": {
                "w": jnp.asarray(
                    sd["transformer.word_embeddings_layernorm.weight"],
                    self.dtype),
                "b": jnp.asarray(
                    sd["transformer.word_embeddings_layernorm.bias"],
                    self.dtype)},
            "layers": layers,
            "final_norm": {
                "w": jnp.asarray(sd["transformer.ln_f.weight"], self.dtype),
                "b": jnp.asarray(sd["transformer.ln_f.bias"], self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head,
                hf_transpose(sd.get("lm_head.weight", wte)),
                dtype=self.dtype),
        }

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        trimmed = {k: v for k, v in params.items() if k != "embed_ln"}
        spec = super().param_pspecs(trimmed)
        spec["embed_ln"] = {"w": P(None), "b": P(None)}
        return spec


@register_model("mpt")
class MptForCausalLM(LnFamilyModel):
    """MPT: ALiBi, bias-free LayerNorm and projections, fused Wqkv,
    gelu MLP."""
    architectures = ("MptForCausalLM", "MPTForCausalLM")
    act_name = "gelu"
    attn_bias = False
    mlp_bias = False

    def __init__(self, model_config):
        super().__init__(model_config)
        import dataclasses as _dc
        from .modeling_utils import alibi_slopes
        self.attn_spec = _dc.replace(
            self.attn_spec, rope=None,
            alibi_slopes=alibi_slopes(self.num_heads))

    def _inner_size(self):
        hf = self.hf
        return getattr(hf, "expansion_ratio", 4) * hf.hidden_size

    @property
    def num_kv_heads(self):
        # MPT attn_config may set kv_n_heads (grouped); default MHA
        ac = getattr(self.hf, "attn_config", None)
        kv = None
        if isinstance(ac, dict):
            kv = ac.get("kv_n_heads")
        elif ac is not None:
            kv = getattr(ac, "kv_n_heads", None)
        return kv or self.hf.num_attention_heads

    def _ln_eps(self):
        return getattr(self.hf, "layer_norm_epsilon", 1e-5)

    def _rope_config(self):
        return None

    def load_hf_state_dict(self, sd):
        L, H = self.num_layers, self.hidden_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        pre = "transformer.blocks.{}."
        split = dict(sd)
        for i in range(L):
            w = np.asarray(sd[pre.format(i) + "attn.Wqkv.weight"])
            split[pre.format(i) + "attn.q.weight"] = w[:nq * hd]
            split[pre.format(i) + "attn.k.weight"] = \
                w[nq * hd:nq * hd + nkv * hd]
            split[pre.format(i) + "attn.v.weight"] = w[nq * hd + nkv * hd:]
        sd = split
        layers = {
            "ln1": self._stack_ln(sd, pre + "norm_1.weight", L),
            "ln2": self._stack_ln(sd, pre + "norm_2.weight", L),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "attn.q.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "attn.k.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "attn.v.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "attn.out_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd,
                                  pre + "ffn.up_proj.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd,
                                    pre + "ffn.down_proj.weight", L),
        }
        from .modeling_utils import hf_transpose
        wte = sd["transformer.wte.weight"]
        return {
            "embed": {"weight": jnp.asarray(wte, self.dtype)},
            "layers": layers,
            "final_norm": {"w": jnp.asarray(sd["transformer.norm_f.weight"],
                                            self.dtype)},
            "lm_head": quantize_linear(
                self.m_lm_head,
                hf_transpose(sd.get("lm_head.weight", wte)),
                dtype=self.dtype),
        }


@register_model("opt")
class OPTForCausalLM(LnFamilyModel):
    """OPT: learned positions at offset +2, biased projections, ReLU
    MLP, pre-LN."""
    architectures = ("OPTForCausalLM",)
    act_name = "relu"

    def __init__(self, model_config):
        super().__init__(model_config)
        self.pos_offset = 2

    def _inner_size(self):
        return self.hf.ffn_dim

    def _ln_eps(self):
        return 1e-5

    def _rope_config(self):
        return None

    def load_hf_state_dict(self, sd):
        L = self.num_layers
        # strip optional "model." prefix
        sd = {k[len("model."):] if k.startswith("model.") else k: v
              for k, v in sd.items()}
        pre = "decoder.layers.{}."
        layers = {
            "ln1": self._stack_ln(sd, pre + "self_attn_layer_norm.weight",
                                  L, pre + "self_attn_layer_norm.bias"),
            "ln2": self._stack_ln(sd, pre + "final_layer_norm.weight", L,
                                  pre + "final_layer_norm.bias"),
            "q": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.q_proj.weight", L),
            "k": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.k_proj.weight", L),
            "v": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.v_proj.weight", L),
            "o": self._stack_lin(self.m_attn, sd,
                                 pre + "self_attn.out_proj.weight", L),
            "fc": self._stack_lin(self.m_mlp, sd, pre + "fc1.weight", L),
            "proj": self._stack_lin(self.m_mlp, sd, pre + "fc2.weight", L),
        }
        from .modeling_utils import hf_transpose
        wte = sd["decoder.embed_tokens.weight"]
        out = {
            "embed": {"weight": jnp.asarray(wte, self.dtype)},
            "wpe": jnp.asarray(sd["decoder.embed_positions.weight"],
                               self.dtype),
            "layers": layers,
            "lm_head": quantize_linear(
                self.m_lm_head,
                hf_transpose(sd.get("lm_head.weight", wte)),
                dtype=self.dtype),
        }
        if "decoder.final_layer_norm.weight" in sd:
            out["final_norm"] = {
                "w": jnp.asarray(sd["decoder.final_layer_norm.weight"],
                                 self.dtype),
                "b": jnp.asarray(sd["decoder.final_layer_norm.bias"],
                                 self.dtype)}
        return out

    def param_pspecs(self, params):
        from jax.sharding import PartitionSpec as P
        trimmed = {k: v for k, v in params.items() if k != "wpe"}
        spec = super().param_pspecs(trimmed)
        spec["wpe"] = P(None, None)
        return spec
