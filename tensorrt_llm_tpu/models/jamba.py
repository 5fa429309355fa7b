"""Jamba: hybrid Mamba + attention + MoE decoder.

Behavioral reference: the reference's hybrid-recurrent support
(nemotron_h / SURVEY §2.2 "Mamba/hybrid cache" row; HF
modeling_jamba.py for exact semantics). Layer pattern is periodic —
``attn_layer_period=8, attn_layer_offset=4`` puts ONE attention layer
(no positional encoding) among seven Mamba mixers per period, and
``expert_layer_period=2, offset=1`` alternates dense and MoE FFNs.

TPU structure: ``lax.scan`` over PERIODS. Each scan slot carries the
period's parameter groups (stacked mamba mixers, the attention layer,
dense and MoE FFNs) and its cache slices; within the body a static
python loop walks the eight positions, so the compiled graph holds one
period regardless of depth. The hybrid cache is a pytree:
paged KV for the attention layers + slot-indexed conv/ssm states for
the mamba layers (reference: hybrid cache manager constraints — no
chunked prefill, no prefix reuse)."""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttentionMetadata
from ..ops.moe import moe_mlp
from ..ops.norm import rms_norm
from ..ops.ssm import causal_conv1d, selective_scan
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             attention_block, quantize_linear,
                             register_model)


@register_model("jamba")
class JambaForCausalLM(DecoderModelForCausalLM):
    has_recurrent_state = True
    architectures = ("JambaForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.intermediate_size = hf.intermediate_size
        self.eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.period = hf.attn_layer_period
        self.attn_offset = hf.attn_layer_offset
        self.e_period = hf.expert_layer_period
        self.e_offset = hf.expert_layer_offset
        self.num_experts = hf.num_experts
        self.top_k = hf.num_experts_per_tok
        if self.num_layers % self.period:
            raise ValueError("jamba: num_hidden_layers must be a multiple "
                             "of attn_layer_period")
        self.num_periods = self.num_layers // self.period
        # mamba geometry
        self.m_inner = hf.mamba_expand * hf.hidden_size
        self.state_size = hf.mamba_d_state
        self.conv_kernel = hf.mamba_d_conv
        self.dt_rank = hf.mamba_dt_rank if hf.mamba_dt_rank != "auto" \
            else math.ceil(hf.hidden_size / 16)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        # attention: NO positional encoding (rope=None)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim), rope=None)
        self.m_lin = self._method("mlp")
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")
        self._num_slots = 0           # set by the engine
        # in-period walk plan: ("attn",), ("md", j) or ("mm", j), with
        # the mamba ordinal (cache index) per step
        plan, md_j, mm_j, m_ord = [], 0, 0, 0
        for pos in range(self.period):
            if self._is_attn(pos):
                plan.append(("attn", 0, -1))
            elif self._is_moe(pos):
                plan.append(("mm", mm_j, m_ord))
                mm_j += 1
                m_ord += 1
            else:
                plan.append(("md", md_j, m_ord))
                md_j += 1
                m_ord += 1
        self._period_plan = plan

    # positions within a period
    def _is_attn(self, i: int) -> bool:
        return i % self.period == self.attn_offset

    def _is_moe(self, i: int) -> bool:
        return i % self.e_period == self.e_offset

    # ------------------------------------------------------------------ #
    def make_kv_pages(self, num_pages: int, page_size: int):
        Pn = self.num_periods
        n_mamba = self.period - 1
        slots = max(self._num_slots, 1)
        kvh, hd = self.num_kv_heads, self.head_dim
        dt = self.config.kv_cache_dtype
        return {
            "kv": jnp.zeros((Pn, num_pages, page_size, 2 * kvh, hd), dt),
            "conv_state": jnp.zeros(
                (Pn, n_mamba, slots, self.m_inner, self.conv_kernel - 1),
                jnp.float32),
            "ssm_state": jnp.zeros(
                (Pn, n_mamba, slots, self.m_inner, self.state_size),
                jnp.float32),
        }

    def kv_pspec(self):
        return {"kv": P(), "conv_state": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        hf = self.hf
        H, V = self.hidden_size, self.vocab_size
        I, N, R, k = (self.m_inner, self.state_size, self.dt_rank,
                      self.conv_kernel)
        FF, E = self.intermediate_size, self.num_experts
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        r = np.random.default_rng(0)

        def mat(shape):
            return r.standard_normal(shape, np.float32) * 0.02

        sd: Dict[str, np.ndarray] = {
            "model.embed_tokens.weight": mat((V, H)),
            "model.final_layernorm.weight": np.ones(H, np.float32),
            "lm_head.weight": mat((V, H)),
        }
        for i in range(self.num_layers):
            p = f"model.layers.{i}."
            sd[p + "input_layernorm.weight"] = np.ones(H, np.float32)
            sd[p + "pre_ff_layernorm.weight"] = np.ones(H, np.float32)
            if self._is_attn(i):
                sd[p + "self_attn.q_proj.weight"] = mat((nq * hd, H))
                sd[p + "self_attn.k_proj.weight"] = mat((nkv * hd, H))
                sd[p + "self_attn.v_proj.weight"] = mat((nkv * hd, H))
                sd[p + "self_attn.o_proj.weight"] = mat((H, nq * hd))
            else:
                m = p + "mamba."
                sd[m + "in_proj.weight"] = mat((2 * I, H))
                sd[m + "conv1d.weight"] = mat((I, 1, k))
                sd[m + "conv1d.bias"] = np.zeros(I, np.float32)
                sd[m + "x_proj.weight"] = mat((R + 2 * N, I))
                sd[m + "dt_proj.weight"] = mat((I, R))
                sd[m + "dt_proj.bias"] = np.full(I, -2.0, np.float32)
                sd[m + "A_log"] = np.log(np.tile(
                    np.arange(1, N + 1, dtype=np.float32), (I, 1)))
                sd[m + "D"] = np.ones(I, np.float32)
                sd[m + "dt_layernorm.weight"] = np.ones(R, np.float32)
                sd[m + "b_layernorm.weight"] = np.ones(N, np.float32)
                sd[m + "c_layernorm.weight"] = np.ones(N, np.float32)
            if self._is_moe(i):
                sd[p + "feed_forward.router.weight"] = mat((E, H))
                for e in range(E):
                    q = p + f"feed_forward.experts.{e}."
                    sd[q + "gate_proj.weight"] = mat((FF, H))
                    sd[q + "up_proj.weight"] = mat((FF, H))
                    sd[q + "down_proj.weight"] = mat((H, FF))
            else:
                sd[p + "feed_forward.gate_proj.weight"] = mat((FF, H))
                sd[p + "feed_forward.up_proj.weight"] = mat((FF, H))
                sd[p + "feed_forward.down_proj.weight"] = mat((H, FF))
        return self.load_hf_state_dict(sd)

    # ------------------------------------------------------------------ #
    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        E = self.num_experts

        def t(name):
            return np.ascontiguousarray(np.transpose(np.asarray(sd[name])))

        def arr(name, dtype=None):
            return jnp.asarray(np.asarray(sd[name]), dtype or dt)

        def lin(method, name, bias=None):
            return quantize_linear(
                method, t(name),
                bias=np.asarray(sd[bias]) if bias and bias in sd else None,
                dtype=dt)

        def stack(items):
            return jax.tree.map(lambda *xs: jnp.stack(xs), *items)

        def mamba_layer(i):
            p = f"model.layers.{i}."
            m = p + "mamba."
            return {
                "norm": arr(p + "input_layernorm.weight"),
                "ff_norm": arr(p + "pre_ff_layernorm.weight"),
                "in_proj": lin(self.m_lin, m + "in_proj.weight"),
                "conv_w": jnp.asarray(
                    np.asarray(sd[m + "conv1d.weight"])[:, 0, :],
                    jnp.float32),
                "conv_b": arr(m + "conv1d.bias", jnp.float32),
                "x_proj": lin(self.m_lin, m + "x_proj.weight"),
                "dt_proj": lin(self.m_lin, m + "dt_proj.weight",
                               bias=m + "dt_proj.bias"),
                "out_proj": lin(self.m_lin, m + "out_proj.weight")
                if m + "out_proj.weight" in sd
                else lin(self.m_lin, m + "out_proj.weight"),
                "A_log": arr(m + "A_log", jnp.float32),
                "D": arr(m + "D", jnp.float32),
                "dt_ln": arr(m + "dt_layernorm.weight"),
                "b_ln": arr(m + "b_layernorm.weight"),
                "c_ln": arr(m + "c_layernorm.weight"),
                **self._ff_params(sd, i),
            }

        def attn_layer(i):
            p = f"model.layers.{i}."
            a = p + "self_attn."
            return {
                "norm": arr(p + "input_layernorm.weight"),
                "ff_norm": arr(p + "pre_ff_layernorm.weight"),
                "q": lin(self.m_q, a + "q_proj.weight"),
                "k": lin(self.m_q, a + "k_proj.weight"),
                "v": lin(self.m_q, a + "v_proj.weight"),
                "o": lin(self.m_o, a + "o_proj.weight"),
                **self._ff_params(sd, i),
            }

        Pn, per = self.num_periods, self.period
        # FFN type alternates within a period, so mamba layers stack in
        # TWO groups (dense-FF vs MoE-FF) with homogeneous key sets;
        # the in-period walk order is precomputed in __init__
        md_groups, mm_groups, attn_groups = [], [], []
        for g in range(Pn):
            idxs = list(range(g * per, (g + 1) * per))
            md = [mamba_layer(i) for i in idxs
                  if not self._is_attn(i) and not self._is_moe(i)]
            mm = [mamba_layer(i) for i in idxs
                  if not self._is_attn(i) and self._is_moe(i)]
            md_groups.append(stack(md))
            mm_groups.append(stack(mm))
            (a_idx,) = [i for i in idxs if self._is_attn(i)]
            attn_groups.append(attn_layer(a_idx))
        params = {
            "embed": {"weight": arr("model.embed_tokens.weight")},
            "mamba_dense": stack(md_groups),     # [Pn, n_md, ...]
            "mamba_moe": stack(mm_groups),       # [Pn, n_mm, ...]
            "attn": stack(attn_groups),          # [Pn, ...]
            "final_norm": arr("model.final_layernorm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head,
                t("lm_head.weight") if "lm_head.weight" in sd
                else np.ascontiguousarray(
                    np.asarray(sd["model.embed_tokens.weight"]).T),
                dtype=dt),
        }
        return params

    def _ff_params(self, sd, i):
        p = f"model.layers.{i}.feed_forward."
        dt = self.dtype
        if self._is_moe(i):
            E = self.num_experts

            def t(name):
                return np.ascontiguousarray(
                    np.transpose(np.asarray(sd[name])))
            return {
                "moe_router": jnp.asarray(t(p + "router.weight"), dt),
                "moe_gate": jnp.stack([
                    jnp.asarray(t(p + f"experts.{e}.gate_proj.weight"), dt)
                    for e in range(E)]),
                "moe_up": jnp.stack([
                    jnp.asarray(t(p + f"experts.{e}.up_proj.weight"), dt)
                    for e in range(E)]),
                "moe_down": jnp.stack([
                    jnp.asarray(t(p + f"experts.{e}.down_proj.weight"), dt)
                    for e in range(E)]),
            }
        return {
            "gate": quantize_linear(self.m_lin, np.ascontiguousarray(
                np.transpose(np.asarray(sd[p + "gate_proj.weight"]))),
                dtype=dt),
            "up": quantize_linear(self.m_lin, np.ascontiguousarray(
                np.transpose(np.asarray(sd[p + "up_proj.weight"]))),
                dtype=dt),
            "down": quantize_linear(self.m_lin, np.ascontiguousarray(
                np.transpose(np.asarray(sd[p + "down_proj.weight"]))),
                dtype=dt),
        }

    # ------------------------------------------------------------------ #
    def _ff(self, layer, h):
        normed = rms_norm(h, layer["ff_norm"], self.eps)
        if "moe_router" in layer:
            out = moe_mlp(normed, layer["moe_gate"], layer["moe_up"],
                          layer["moe_down"], layer["moe_router"],
                          top_k=self.top_k, backend="ragged",
                          renormalize=False)   # jamba keeps raw softmax
        else:
            g = self.m_lin.apply(layer["gate"], normed)
            u = self.m_lin.apply(layer["up"], normed)
            a = jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u
            out = self.m_lin.apply(layer["down"], a)
        return h + out

    def _mamba_block(self, layer, h, conv_state, ssm_state, metadata):
        I, R, N = self.m_inner, self.dt_rank, self.state_size
        normed = rms_norm(h, layer["norm"], self.eps)
        xz = self.m_lin.apply(layer["in_proj"], normed)
        x, z = xz[:, :I], xz[:, I:]
        x_conv, new_conv = causal_conv1d(
            x, layer["conv_w"], layer["conv_b"], conv_state, metadata)
        x_act = jax.nn.silu(x_conv).astype(self.dtype)
        dbc = self.m_lin.apply(layer["x_proj"], x_act)
        dt_r, B, C = dbc[:, :R], dbc[:, R:R + N], dbc[:, R + N:]
        dt_r = rms_norm(dt_r, layer["dt_ln"], self.eps)
        B = rms_norm(B, layer["b_ln"], self.eps)
        C = rms_norm(C, layer["c_ln"], self.eps)
        dt = jax.nn.softplus(
            self.m_lin.apply(layer["dt_proj"], dt_r).astype(jnp.float32))
        A = -jnp.exp(layer["A_log"])
        y, new_ssm = selective_scan(x_act, dt, A, B, C, layer["D"],
                                    ssm_state, metadata)
        y = y.astype(jnp.float32) * jax.nn.silu(z.astype(jnp.float32))
        out = self.m_lin.apply(layer["out_proj"], y.astype(self.dtype))
        return h + out, new_conv, new_ssm

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        spec = self.attn_spec
        shard_mesh, shard_axis = self.attn_shard_args()

        def period_body(h, xs):
            md, mm, att, kv, conv, ssm = xs
            new_convs = [None] * (self.period - 1)
            new_ssms = [None] * (self.period - 1)
            for kind, j, m_ord in self._period_plan:
                if kind == "attn":
                    attn_out, kv = attention_block(
                        att, rms_norm(h, att["norm"], self.eps), kv,
                        metadata, spec, self.m_q, self.m_o,
                        attn_backend=self.attn_backend,
                        kv_scale=self.config.kv_scale,
                        mesh=shard_mesh, tp_axis=shard_axis)
                    h = h + attn_out
                    h = self._ff(att, h)
                else:
                    group = md if kind == "md" else mm
                    layer = jax.tree.map(lambda a: a[j], group)
                    h, nc, ns = self._mamba_block(
                        layer, h, conv[m_ord], ssm[m_ord], metadata)
                    new_convs[m_ord] = nc
                    new_ssms[m_ord] = ns
                    h = self._ff(layer, h)
            return h, (kv, jnp.stack(new_convs), jnp.stack(new_ssms))

        h, (kv, convs, ssms) = jax.lax.scan(
            period_body, h,
            (params["mamba_dense"], params["mamba_moe"], params["attn"],
             kv_pages["kv"],
             kv_pages["conv_state"], kv_pages["ssm_state"]))
        h = rms_norm(h, params["final_norm"], self.eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), {
            "kv": kv, "conv_state": convs, "ssm_state": ssms}

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
