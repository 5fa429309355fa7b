"""DeepSeek-V3 decoder: MLA (multi-head latent attention) + MoE with
shared experts and sigmoid routing.

Behavioral reference: tensorrt_llm/_torch/models/modeling_deepseekv3.py +
modules/attention.py:1169 (MLA) and the latent-KV kernels (ref:
kernels/flashMLA/, mlaPreprocessOp.cpp). TPU-native round-1 shape:

  * The KV cache stores ONLY the latent per token —
    [kv_lora_rank + qk_rope_head_dim] — the whole point of MLA (93%
    smaller than full KV at DeepSeek-V3 geometry). Pools are paged like
    regular KV: [L, pages, page_size, latent_dim].
  * Attention decompresses latents through kv_b_proj at compute time
    (the non-absorbed path; weight absorption for decode is the round-2
    optimization, reference absorbed-weight path attention.py:1169).
  * Layers split into two scans: the first_k_dense_replace dense-MLP
    layers, then the MoE layers (structure-homogeneous scans keep the
    compiled graph O(1) in depth).
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttentionMetadata
from ..ops.moe import moe_mlp_ragged
from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig, apply_rope, rope_cos_sin
from .modeling_utils import (DecoderModelForCausalLM, ModelConfig,
                             quantize_linear, register_model)


@register_model("deepseek_v3")
class DeepseekV3ForCausalLM(DecoderModelForCausalLM):
    architectures = ("DeepseekV3ForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.q_lora_rank = getattr(hf, "q_lora_rank", None)
        self.kv_lora_rank = hf.kv_lora_rank
        self.qk_rope = hf.qk_rope_head_dim
        self.qk_nope = hf.qk_nope_head_dim
        self.v_dim = hf.v_head_dim
        self.latent_dim = self.kv_lora_rank + self.qk_rope
        self.rms_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.sm_scale = 1.0 / math.sqrt(self.qk_nope + self.qk_rope)
        self.rope_cfg = RopeConfig(
            head_dim=self.qk_rope, rope_theta=getattr(hf, "rope_theta", 1e4),
            max_position_embeddings=hf.max_position_embeddings)
        # MoE geometry
        self.first_dense = getattr(hf, "first_k_dense_replace", 0)
        self.n_experts = getattr(hf, "n_routed_experts", 0)
        self.top_k = getattr(hf, "num_experts_per_tok", 0)
        self.n_shared = getattr(hf, "n_shared_experts", 0)
        self.moe_inter = getattr(hf, "moe_intermediate_size", 0)
        self.routed_scale = getattr(hf, "routed_scaling_factor", 1.0)
        self.norm_topk = getattr(hf, "norm_topk_prob", True)
        self.m_lin = self._method("attn")
        self.m_mlp = self._method("mlp")
        self.m_lm_head = self._method("lm_head")

    # engine sizing: one "combined head" of latent_dim
    @property
    def num_kv_heads(self) -> int:
        return 1

    @property
    def head_dim(self) -> int:
        return -(-self.latent_dim // 2)

    def kv_pool_shape(self, num_pages: int, page_size: int):
        return (self.num_layers, num_pages, page_size, self.latent_dim)

    def make_kv_pages(self, num_pages: int, page_size: int):
        return jnp.zeros(self.kv_pool_shape(num_pages, page_size),
                         self.dtype)

    def kv_pspec(self) -> P:
        return P()

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import DeepseekV3ForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy() for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    @staticmethod
    def _t(sd, name):
        return np.ascontiguousarray(np.transpose(np.asarray(sd[name])))

    def _absorbed_from_kvb(self, w_t, dtype):
        """Split the (transposed) kv_b weight [lora, nh*(nope+vd)] into
        the absorbed decode operands: W_UK as [nh, nope, lora] (folded
        into q_nope) and W_UV as [nh, lora, vd] (folded into the
        attention output). Prequantized ingest keeps kv_b as a packed
        struct — dequantize through the linear method on an identity
        batch is wasteful, so absorb from the raw fp weight when
        available and fall back to the non-absorbed path otherwise."""
        if not isinstance(w_t, np.ndarray):
            return {}
        nh, nope, vd, lora = (self.num_heads, self.qk_nope, self.v_dim,
                              self.kv_lora_rank)
        w = np.asarray(w_t, np.float32).reshape(lora, nh, nope + vd)
        uk = np.transpose(w[:, :, :nope], (1, 2, 0))   # [nh, nope, lora]
        uv = np.transpose(w[:, :, nope:], (1, 0, 2))   # [nh, lora, vd]
        return {"uk": jnp.asarray(uk, dtype=dtype),
                "uv": jnp.asarray(uv, dtype=dtype)}

    def _attn_layer_from_sd(self, sd: Dict[str, np.ndarray], i: int):
        """One decoder layer's MLA tensors (reused by the MTP drafter,
        whose module at index num_hidden_layers is a full layer;
        reference: modeling_deepseekv3.py DeepseekV3MTP)."""
        dtype = self.dtype
        t = lambda n: self._t(sd, n)
        p = f"model.layers.{i}.self_attn"
        out = {
            "kv_a": quantize_linear(self.m_lin,
                                    t(f"{p}.kv_a_proj_with_mqa.weight"),
                                    dtype=dtype),
            "kv_a_norm": jnp.asarray(sd[f"{p}.kv_a_layernorm.weight"],
                                     dtype=dtype),
            "kv_b": quantize_linear(self.m_lin, t(f"{p}.kv_b_proj.weight"),
                                    dtype=dtype),
            # absorbed-weight decode operands (reference: MLA absorbed
            # path attention.py:1169 — k_b_proj_trans / v_b_proj): the
            # kv_b columns split into W_UK [nh, nope, lora] folded into
            # the query and W_UV [nh, lora, vd] folded into the output,
            # so decode attention runs entirely in latent space
            **self._absorbed_from_kvb(t(f"{p}.kv_b_proj.weight"), dtype),
            "o": quantize_linear(self.m_lin, t(f"{p}.o_proj.weight"),
                                 dtype=dtype),
            "input_norm": jnp.asarray(
                sd[f"model.layers.{i}.input_layernorm.weight"],
                dtype=dtype),
            "post_norm": jnp.asarray(
                sd[f"model.layers.{i}.post_attention_layernorm.weight"],
                dtype=dtype),
        }
        if self.q_lora_rank:
            out["q_a"] = quantize_linear(self.m_lin,
                                         t(f"{p}.q_a_proj.weight"),
                                         dtype=dtype)
            out["q_a_norm"] = jnp.asarray(
                sd[f"{p}.q_a_layernorm.weight"], dtype=dtype)
            out["q_b"] = quantize_linear(self.m_lin,
                                         t(f"{p}.q_b_proj.weight"),
                                         dtype=dtype)
        else:
            out["q"] = quantize_linear(self.m_lin,
                                       t(f"{p}.q_proj.weight"),
                                       dtype=dtype)
        return out

    def _dense_layer_from_sd(self, sd, i: int):
        dtype = self.dtype
        t = lambda n: self._t(sd, n)
        out = self._attn_layer_from_sd(sd, i)
        p = f"model.layers.{i}.mlp"
        out["gate"] = quantize_linear(self.m_mlp,
                                      t(f"{p}.gate_proj.weight"),
                                      dtype=dtype)
        out["up"] = quantize_linear(self.m_mlp, t(f"{p}.up_proj.weight"),
                                    dtype=dtype)
        out["down"] = quantize_linear(self.m_mlp,
                                      t(f"{p}.down_proj.weight"),
                                      dtype=dtype)
        return out

    def _moe_layer_from_sd(self, sd, i: int):
        dtype = self.dtype
        t = lambda n: self._t(sd, n)
        out = self._attn_layer_from_sd(sd, i)
        p = f"model.layers.{i}.mlp"
        E = self.n_experts
        out["router"] = jnp.asarray(t(f"{p}.gate.weight"), dtype=dtype)
        bias_name = f"{p}.gate.e_score_correction_bias"
        out["router_bias"] = jnp.asarray(
            sd.get(bias_name, np.zeros(E, np.float32)), jnp.float32)
        for mod, hf_name in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                             ("w_down", "down_proj")):
            out[mod] = jnp.stack([
                jnp.asarray(t(f"{p}.experts.{e}.{hf_name}.weight"),
                            dtype=dtype) for e in range(E)])
        for mod, hf_name in (("s_gate", "gate_proj"), ("s_up", "up_proj"),
                             ("s_down", "down_proj")):
            out[mod] = quantize_linear(
                self.m_mlp, t(f"{p}.shared_experts.{hf_name}.weight"),
                dtype=dtype)
        return out

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.num_layers
        dtype = self.dtype
        k = self.first_dense
        dense = [self._dense_layer_from_sd(sd, i) for i in range(k)]
        moe = [self._moe_layer_from_sd(sd, i) for i in range(k, L)]
        stack = lambda ls: jax.tree.map(lambda *xs: jnp.stack(xs), *ls) \
            if ls else None
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "dense_layers": stack(dense),
            "moe_layers": stack(moe),
            "final_norm": jnp.asarray(sd["model.norm.weight"], dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dtype),
        }

    # ------------------------------------------------------------------ #
    # MLA attention over the paged latent cache
    # ------------------------------------------------------------------ #
    def _mla_attention(self, layer, x, pool, metadata, cos_sin):
        T = x.shape[0]
        nh = self.num_heads
        lora, rope_d = self.kv_lora_rank, self.qk_rope
        nope, vd = self.qk_nope, self.v_dim
        cos, sin = cos_sin

        if self.q_lora_rank:
            q = self.m_lin.apply(
                layer["q_b"],
                rms_norm(self.m_lin.apply(layer["q_a"], x),
                         layer["q_a_norm"], self.rms_eps))
        else:
            q = self.m_lin.apply(layer["q"], x)
        q = q.reshape(T, nh, nope + rope_d)
        q_nope, q_pe = q[..., :nope], q[..., nope:]
        q_pe = apply_rope(q_pe, cos, sin, is_neox=False)

        kv_a = self.m_lin.apply(layer["kv_a"], x)       # [T, lora+rope]
        c_kv = rms_norm(kv_a[:, :lora], layer["kv_a_norm"], self.rms_eps)
        k_pe = apply_rope(kv_a[:, lora:].reshape(T, 1, rope_d), cos, sin,
                          is_neox=False)[:, 0]
        latents = jnp.concatenate([c_kv, k_pe], axis=-1)

        # scatter into the paged latent pool
        pages_n, ps, latent = pool.shape
        flat = pool.reshape(pages_n * ps, latent)
        pool = flat.at[metadata.slot_mapping].set(
            latents.astype(pool.dtype), mode="drop").reshape(pool.shape)

        # gather per sequence
        S, Pp = metadata.page_indices.shape
        max_kv = Pp * ps
        lat = pool[metadata.page_indices.reshape(-1)].reshape(
            S, max_kv, latent)
        c_all = lat[..., :lora]
        kpe_all = lat[..., lora:]

        # token → sequence mapping (same scheme as the reference backend)
        tok = jnp.arange(T, dtype=jnp.int32)
        seq_of = jnp.minimum(
            jnp.searchsorted(metadata.cu_q_lens[1:S + 1], tok,
                             side="right").astype(jnp.int32), S - 1)
        q_start = metadata.cu_q_lens[seq_of]
        q_lens = metadata.cu_q_lens[1:S + 1] - metadata.cu_q_lens[:S]
        tok_pos = metadata.kv_lens[seq_of] - q_lens[seq_of] + (tok - q_start)

        # path selection is STATIC (shape-based): a decode-shaped batch
        # (one new token per sequence row, T == S) runs the absorbed-
        # weight path — attention entirely in latent space, never
        # materializing per-token K/V (reference: attention.py:1169
        # absorbed MLA decode). Prefill decompresses latents through
        # kv_b once per KV token, which amortizes over the many query
        # rows of the chunk; chunked-context merging is structural here —
        # each chunk's queries attend over the full latent history, so no
        # cross-chunk softmax-state merge is needed (reference:
        # trtllm.py:1822-1894 does an explicit two-pass merge).
        absorbed = (T == S) and ("uk" in layer)
        kp = kpe_all[seq_of]             # [T, max_kv, rope]
        if absorbed:
            # q_abs[t,h,l] = q_nope · W_UK ; scores against raw latents
            q_abs = jnp.einsum("thd,hdl->thl", q_nope.astype(jnp.float32),
                               layer["uk"].astype(jnp.float32))
            c_t = c_all[seq_of].astype(jnp.float32)   # identity gather
            s_nope = jnp.einsum("thl,tkl->thk", q_abs, c_t)
        else:
            knv = self.m_lin.apply(layer["kv_b"],
                                   c_all.reshape(S * max_kv, lora))
            knv = knv.reshape(S, max_kv, nh, nope + vd)
            kn = knv[..., :nope][seq_of]  # [T, max_kv, nh, nope]
            vv = knv[..., nope:][seq_of]
            s_nope = jnp.einsum("thd,tkhd->thk", q_nope.astype(jnp.float32),
                                kn.astype(jnp.float32))
        s_pe = jnp.einsum("thd,tkd->thk", q_pe.astype(jnp.float32),
                          kp.astype(jnp.float32))
        scores = (s_nope + s_pe) * self.sm_scale
        kv_pos = jnp.arange(max_kv, dtype=jnp.int32)
        valid = (kv_pos[None, :] <= tok_pos[:, None]) & \
            (kv_pos[None, :] < metadata.kv_lens[seq_of][:, None])
        scores = jnp.where(valid[:, None, :], scores,
                           jnp.finfo(jnp.float32).min)
        probs = jax.nn.softmax(scores, axis=-1)
        if absorbed:
            # value path in latent space, then W_UV un-absorbs per head
            out_lat = jnp.einsum("thk,tkl->thl", probs, c_t)
            out = jnp.einsum("thl,hlv->thv", out_lat,
                             layer["uv"].astype(jnp.float32))
        else:
            out = jnp.einsum("thk,tkhd->thd", probs, vv.astype(jnp.float32))
        out = self.m_lin.apply(layer["o"],
                               out.reshape(T, nh * vd).astype(self.dtype))
        return out, pool

    def _group_limit(self, choice, per_group_fn):
        """Group-limited routing (reference: noaux_tc / DeepSeek group
        selection): keep only the top ``topk_group`` device groups."""
        ng = getattr(self.hf, "n_group", None) or 1
        tg = getattr(self.hf, "topk_group", None) or ng
        if ng <= 1 or tg >= ng:
            return choice
        T = choice.shape[0]
        grouped = choice.reshape(T, ng, -1)
        gscore = per_group_fn(grouped)
        _, gidx = jax.lax.top_k(gscore, tg)
        keep = jnp.zeros((T, ng), bool).at[
            jnp.arange(T)[:, None], gidx].set(True)
        # HF masks dropped groups with 0.0 (not -inf) before top-k
        return jnp.where(
            jnp.repeat(keep, grouped.shape[-1], axis=1), choice, 0.0)

    def _moe_block(self, layer, x):
        logits = jnp.dot(x, layer["router"],
                         preferred_element_type=jnp.float32)
        if getattr(self, "moe_softmax_greedy", False):
            # DeepseekV2: softmax scoring, greedy / group-limited top-k
            scores = jax.nn.softmax(logits, axis=-1)
            choice = self._group_limit(
                scores, lambda g: jnp.max(g, axis=-1))
            w, idx = jax.lax.top_k(choice, self.top_k)
            # HF's V2 gate stores norm_topk_prob but never applies it
            w = w * self.routed_scale
            return self._moe_experts(layer, x, w, idx)
        scores = jax.nn.sigmoid(logits)
        choice = scores + layer["router_bias"][None, :]
        # DeepseekV3 noaux_tc group selection: per-group score is the
        # sum of the top-2 biased scores
        choice = self._group_limit(
            choice, lambda g: jnp.sum(jax.lax.top_k(g, 2)[0], axis=-1))
        _, idx = jax.lax.top_k(choice, self.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1)
        if self.norm_topk:
            w = w / (jnp.sum(w, axis=-1, keepdims=True) + 1e-20)
        w = w * self.routed_scale
        return self._moe_experts(layer, x, w, idx)

    def _moe_experts(self, layer, x, w, idx):
        if self.mesh is not None and any(
                self.mesh.shape.get(a, 1) > 1 for a in ("cp", "tp")):
            from ..ops.moe import moe_mlp_ep
            routed = moe_mlp_ep(x, layer["w_gate"], layer["w_up"],
                                layer["w_down"], w, idx.astype(jnp.int32),
                                self.mesh, ep_axes=("cp", "tp"))
        else:
            routed = moe_mlp_ragged(x, layer["w_gate"], layer["w_up"],
                                    layer["w_down"], w,
                                    idx.astype(jnp.int32))
        gate = self.m_mlp.apply(layer["s_gate"], x)
        up = self.m_mlp.apply(layer["s_up"], x)
        shared = self.m_mlp.apply(
            layer["s_down"],
            jax.nn.silu(gate.astype(jnp.float32)).astype(self.dtype) * up)
        return routed + shared

    # ------------------------------------------------------------------ #
    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None,
                collect_hidden: bool = False):
        h = self._embed(params, token_ids, input_embeds)
        eps = self.rms_eps
        cos_sin = rope_cos_sin(self.rope_cfg, metadata.positions)
        k = self.first_dense

        def dense_body(h, xs):
            layer, pool = xs
            normed = rms_norm(h, layer["input_norm"], eps)
            attn, pool = self._mla_attention(layer, normed, pool, metadata,
                                             cos_sin)
            h = h + attn
            normed = rms_norm(h, layer["post_norm"], eps)
            gate = self.m_mlp.apply(layer["gate"], normed)
            up = self.m_mlp.apply(layer["up"], normed)
            h = h + self.m_mlp.apply(
                layer["down"],
                jax.nn.silu(gate.astype(jnp.float32)).astype(self.dtype) * up)
            return h, pool

        def moe_body(h, xs):
            layer, pool = xs
            normed = rms_norm(h, layer["input_norm"], eps)
            attn, pool = self._mla_attention(layer, normed, pool, metadata,
                                             cos_sin)
            h = h + attn
            normed = rms_norm(h, layer["post_norm"], eps)
            h = h + self._moe_block(layer, normed)
            return h, pool

        dense_pool, moe_pool = kv_pages[:k], kv_pages[k:]
        if params["dense_layers"] is not None:
            h, dense_pool = jax.lax.scan(
                dense_body, h, (params["dense_layers"], dense_pool))
        if params["moe_layers"] is not None:
            h, moe_pool = jax.lax.scan(
                moe_body, h, (params["moe_layers"], moe_pool))
        kv_pages = jnp.concatenate([dense_pool, moe_pool], axis=0)
        # MTP draft features: pre-final-norm hidden rows at logits
        # positions (reference: speculative/mtp.py MTPWorker captures the
        # target's last hidden state to seed the MTP module)
        hidden_rows = self._gather_logits(h, metadata) \
            if collect_hidden else None
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        if collect_hidden:
            return logits.astype(jnp.float32), kv_pages, hidden_rows
        return logits.astype(jnp.float32), kv_pages


@register_model("deepseek_v2")
class DeepseekV2ForCausalLM(DeepseekV3ForCausalLM):
    """DeepSeek-V2 (+Lite): same MLA latent cache; routing differs —
    SOFTMAX scoring with greedy / group-limited top-k and no score
    correction bias (reference: modeling_deepseekv3.py handles both
    generations; HF modeling_deepseek_v2.py is the numeric spec)."""
    architectures = ("DeepseekV2ForCausalLM",)
    moe_softmax_greedy = True

    def init_params(self, rng):
        import torch
        from transformers import DeepseekV2ForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)


@register_model("longcat_flash")
class LongcatFlashForCausalLM(DeepseekV3ForCausalLM):
    """LongCat-Flash: shortcut-connected MoE (ScMoE) over MLA.

    Each checkpoint layer holds TWO MLA+dense sublayers; the routed MoE
    is computed from the FIRST sublayer's post-norm stream and added
    after the second (reference: the longcat rows of the model matrix;
    HF modeling_longcat_flash.py is the numeric spec). Extras vs V3:
    lora scaling factors sqrt(H/rank) FOLDED into q_b/kv_b at load;
    softmax scores with bias-corrected selection; ``zero_expert_num``
    identity experts contribute w·x directly."""
    architectures = ("LongcatFlashForCausalLM",)

    def __init__(self, model_config: ModelConfig):
        hf = model_config.hf_config
        hf.first_k_dense_replace = 0
        hf.num_experts_per_tok = hf.moe_topk
        hf.moe_intermediate_size = hf.expert_ffn_hidden_size
        hf.n_shared_experts = 0
        super().__init__(model_config)
        self.zero_experts = getattr(self.hf, "zero_expert_num", 0) or 0
        self.n_pairs = self.hf.num_hidden_layers // 2

    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import LongcatFlashForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dtype = self.dtype
        q_scale = (self.hidden_size / self.q_lora_rank) ** 0.5
        kv_scale = (self.hidden_size / self.kv_lora_rank) ** 0.5
        # re-key each pair's sublayers onto flat v3-style layer indices
        flat = {}
        for k, v in sd.items():
            if not k.startswith("model.layers."):
                flat[k] = v
                continue
            parts = k.split(".")
            i = int(parts[2])
            kind = parts[3]
            if kind in ("self_attn", "input_layernorm",
                        "post_attention_layernorm", "mlps"):
                s = int(parts[4])
                j = 2 * i + s
                if kind == "self_attn":
                    nk = f"model.layers.{j}.self_attn." + \
                        ".".join(parts[5:])
                elif kind == "mlps":
                    nk = f"model.layers.{j}.mlp." + ".".join(parts[5:])
                else:
                    nk = f"model.layers.{j}.{kind}." + ".".join(parts[5:])
                flat[nk] = v
            else:
                flat[k] = v     # mlp.router / mlp.experts stay pair-keyed
        # fold the lora scales into the projections
        for j in range(self.hf.num_hidden_layers):
            qb = f"model.layers.{j}.self_attn.q_b_proj.weight"
            kb = f"model.layers.{j}.self_attn.kv_b_proj.weight"
            flat[qb] = np.asarray(flat[qb]) * q_scale
            flat[kb] = np.asarray(flat[kb]) * kv_scale

        def pair(i):
            out = {}
            for s in (0, 1):
                sub = self._dense_layer_from_sd(flat, 2 * i + s)
                out.update({f"{k}{s}": v for k, v in sub.items()})
            p = f"model.layers.{i}.mlp."
            E = self.n_experts
            out["router"] = jnp.asarray(
                self._t(sd, p + "router.classifier.weight"), dtype)
            out["router_bias"] = jnp.asarray(
                np.asarray(sd[p + "router.e_score_correction_bias"]),
                jnp.float32)
            for mod, hfn in (("w_gate", "gate_proj"), ("w_up", "up_proj"),
                             ("w_down", "down_proj")):
                out[mod] = jnp.stack([
                    jnp.asarray(self._t(sd, p + f"experts.{e}.{hfn}"
                                        ".weight"), dtype)
                    for e in range(E)])
            return out

        pairs = [pair(i) for i in range(self.n_pairs)]
        stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *pairs)
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "pairs": stacked,
            "final_norm": jnp.asarray(sd["model.norm.weight"],
                                      dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T),
                dtype=dtype),
        }

    def _sc_moe(self, layer, x):
        """ScMoE: softmax scores, bias-corrected selection over
        routed + zero experts; zero picks contribute w·x."""
        logits = jnp.dot(x.astype(jnp.float32),
                         layer["router"].astype(jnp.float32))
        scores = jax.nn.softmax(logits, axis=-1)
        choice = scores + layer["router_bias"][None, :]
        _, idx = jax.lax.top_k(choice, self.top_k)
        w = jnp.take_along_axis(scores, idx, axis=-1) * self.routed_scale
        is_zero = idx >= self.n_experts
        w_real = jnp.where(is_zero, 0.0, w)
        idx_real = jnp.where(is_zero, 0, idx)
        routed = moe_mlp_ragged(x, layer["w_gate"], layer["w_up"],
                                layer["w_down"],
                                w_real.astype(jnp.float32),
                                idx_real.astype(jnp.int32))
        zero_w = jnp.sum(jnp.where(is_zero, w, 0.0), axis=-1,
                         keepdims=True)
        return routed + (zero_w * x.astype(jnp.float32)) \
            .astype(self.dtype)

    def _dense_mlp(self, layer, x, s):
        g = self.m_mlp.apply(layer[f"gate{s}"], x)
        u = self.m_mlp.apply(layer[f"up{s}"], x)
        return self.m_mlp.apply(
            layer[f"down{s}"],
            jax.nn.silu(g.astype(jnp.float32)).astype(self.dtype) * u)

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        eps = self.rms_eps
        cos_sin = rope_cos_sin(self.rope_cfg, metadata.positions)
        Lp = self.n_pairs
        pools = kv_pages.reshape(Lp, 2, *kv_pages.shape[1:])

        def sub(layer, s):
            return {k[:-1]: v for k, v in layer.items()
                    if k.endswith(s) and k[:-1] in (
                        "q_a", "q_a_norm", "q_b", "q", "kv_a",
                        "kv_a_norm", "kv_b", "o", "input_norm",
                        "post_norm", "gate", "up", "down")}

        def body(h, xs):
            layer, pool = xs
            a0 = sub(layer, "0")
            a1 = sub(layer, "1")
            normed = rms_norm(h, a0["input_norm"], eps)
            attn, p0 = self._mla_attention(a0, normed, pool[0], metadata,
                                           cos_sin)
            h = h + attn
            normed = rms_norm(h, a0["post_norm"], eps)
            shortcut = self._sc_moe(layer, normed)
            h = h + self._dense_mlp(a0, normed, "")
            normed = rms_norm(h, a1["input_norm"], eps)
            attn, p1 = self._mla_attention(a1, normed, pool[1], metadata,
                                           cos_sin)
            h = h + attn
            normed = rms_norm(h, a1["post_norm"], eps)
            h = h + self._dense_mlp(a1, normed, "") + shortcut
            return h, jnp.stack([p0, p1])

        h, pools = jax.lax.scan(body, h, (params["pairs"], pools))
        kv_pages = pools.reshape(-1, *pools.shape[2:])
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), kv_pages
