"""Zamba2: Mamba2 backbone with SHARED transformer memory blocks.

Behavioral reference: the reference's hybrid-SSM family support
(modeling_nemotron_h.py structural analog); HF modeling_zamba2.py is the
numeric spec (fig. 2 / eq. 6 of the Zamba paper). Architecture:

  * Every layer is a Mamba2 mixer with pre-norm and residual.
  * ``hybrid`` layers additionally run a SHARED attention+MLP "memory
    block" (``num_mem_blocks`` blocks cycled across hybrid layers) on
    ``concat([h, original_embeds])`` (2H wide, NO internal residuals),
    project it back with a per-layer ``linear`` [H,H], and add it to the
    mamba input: h = h + mamba(norm(h + linear(block(h)))).
  * Weight sharing is recovered with per-USE LoRA adapters on the
    block's gate_up projection (and optionally on q/k/v).
  * Attention scale is (head_dim/2)^-0.5 (the 2H-wide input); rope when
    ``use_mem_rope``.

TPU structure: mamba runs scan like Bamba; each hybrid layer is
unrolled (they are few and each pairs distinct adapters with a shared
block). KV pages exist only for hybrid layers."""
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


@register_model("zamba2")
class Zamba2ForCausalLM(DecoderModelForCausalLM):
    architectures = ("Zamba2ForCausalLM",)
    has_recurrent_state = True

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.eps = getattr(hf, "rms_norm_eps", 1e-5)
        self.num_mem_blocks = hf.num_mem_blocks
        self.use_mem_rope = getattr(hf, "use_mem_rope", False)
        self.attn_adapter = getattr(hf, "use_shared_attention_adapter",
                                    False)
        lim = getattr(hf, "time_step_limit", None) or (0.0, float("inf"))
        inner = int(hf.mamba_expand * hf.hidden_size)
        self.geom = Mamba2Geom(
            intermediate=inner, num_heads=hf.n_mamba_heads,
            head_dim=inner // hf.n_mamba_heads,
            n_groups=getattr(hf, "mamba_ngroups", 1),
            state_size=hf.mamba_d_state, conv_kernel=hf.mamba_d_conv,
            dt_min=lim[0], dt_max=lim[1], eps=self.eps)
        self.block_types: List[str] = list(hf.layers_block_type)
        self.n_hybrid = sum(1 for b in self.block_types if b == "hybrid")
        self._attn_hd = hf.attention_head_dim
        rope = RopeConfig(
            head_dim=self._attn_hd,
            rope_theta=getattr(hf, "rope_theta", 10000.0),
            max_position_embeddings=hf.max_position_embeddings) \
            if self.use_mem_rope else None
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=hf.num_key_value_heads,
            head_dim=self._attn_hd,
            sm_scale=(self._attn_hd / 2) ** -0.5, rope=rope)
        self.m_lin = self._method("mlp")
        self.m_q = self._method("q_proj")
        self.m_o = self._method("o_proj")
        self.m_lm_head = self._method("lm_head")
        self._num_slots = 0

    @property
    def num_kv_heads(self) -> int:
        return self.hf.num_key_value_heads

    @property
    def head_dim(self) -> int:
        return self._attn_hd

    def kv_pool_shape(self, num_pages: int, page_size: int):
        return (max(self.n_hybrid, 1), num_pages, page_size,
                2 * self.num_kv_heads, self.head_dim)

    def make_kv_pages(self, num_pages: int, page_size: int):
        g = self.geom
        slots = max(self._num_slots, 1)
        L = self.num_layers
        return {
            "kv": jnp.zeros(self.kv_pool_shape(num_pages, page_size),
                            self.config.kv_cache_dtype),
            "conv_state": jnp.zeros(
                (L, slots, g.conv_dim, g.conv_kernel - 1), jnp.float32),
            "ssm_state": jnp.zeros(
                (L, slots, g.num_heads, g.head_dim, g.state_size),
                jnp.float32),
        }

    def kv_pspec(self):
        return {"kv": P(), "conv_state": P(), "ssm_state": P()}

    # ------------------------------------------------------------------ #
    def init_params(self, rng) -> Dict[str, Any]:
        import torch
        from transformers import Zamba2ForCausalLM as HFModel
        torch.manual_seed(0)
        m = HFModel(self.hf).eval()
        sd = {k: v.detach().float().numpy()
              for k, v in m.state_dict().items()}
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        dt = self.dtype
        t = lambda n: np.ascontiguousarray(np.transpose(np.asarray(sd[n])))
        arr = lambda n: jnp.asarray(np.asarray(sd[n]), dt)
        lin = lambda m, n: quantize_linear(m, t(n), dtype=dt)

        def mamba_layer(i, prefix):
            out = load_mamba2_layer(sd, f"{prefix}.mamba", self.m_lin, dt)
            out["norm"] = arr(f"{prefix}.input_layernorm.weight")
            return out

        # shared memory blocks (found under the FIRST hybrid layer using
        # each block; weights are shared, so any using layer has them)
        hybrid_idxs = [i for i, b in enumerate(self.block_types)
                       if b == "hybrid"]
        blocks = []
        for b in range(self.num_mem_blocks):
            users = [j for j in range(len(hybrid_idxs))
                     if j % self.num_mem_blocks == b]
            if not users:
                blocks.append(None)
                continue
            li = hybrid_idxs[users[0]]
            p = f"model.layers.{li}.shared_transformer"
            blocks.append({
                "input_norm": arr(f"{p}.input_layernorm.weight"),
                "pre_ff_norm": arr(f"{p}.pre_ff_layernorm.weight"),
                "q": lin(self.m_q, f"{p}.self_attn.q_proj.weight"),
                "k": lin(self.m_q, f"{p}.self_attn.k_proj.weight"),
                "v": lin(self.m_q, f"{p}.self_attn.v_proj.weight"),
                "o": lin(self.m_o, f"{p}.self_attn.o_proj.weight"),
                "gate_up": lin(self.m_lin,
                               f"{p}.feed_forward.gate_up_proj.weight"),
                "down": lin(self.m_lin,
                            f"{p}.feed_forward.down_proj.weight"),
            })

        # per-layer params: mamba for all; hybrid extras where applicable
        layers, hybrid_ord = [], 0
        for i, bt in enumerate(self.block_types):
            p = f"model.layers.{i}"
            if bt == "mamba":
                layers.append(("mamba", mamba_layer(i, p)))
            else:
                j = hybrid_ord
                bp = f"{p}.shared_transformer"
                extra = {
                    "linear": lin(self.m_o, f"{p}.linear.weight"),
                    "mlp_a0": jnp.asarray(t(
                        f"{bp}.feed_forward.gate_up_proj_adapter_list"
                        f".{j}.0.weight"), dt),
                    "mlp_a1": jnp.asarray(t(
                        f"{bp}.feed_forward.gate_up_proj_adapter_list"
                        f".{j}.1.weight"), dt),
                }
                if self.attn_adapter:
                    for nm in ("q", "k", "v"):
                        extra[f"{nm}_a0"] = jnp.asarray(t(
                            f"{bp}.self_attn.linear_{nm}_adapter_list"
                            f".{j}.0.weight"), dt)
                        extra[f"{nm}_a1"] = jnp.asarray(t(
                            f"{bp}.self_attn.linear_{nm}_adapter_list"
                            f".{j}.1.weight"), dt)
                layers.append(
                    ("hybrid", {**mamba_layer(i, f"{p}.mamba_decoder"),
                                **extra}, b))
                hybrid_ord += 1
        wte = np.asarray(sd["model.embed_tokens.weight"])
        lm_w = np.asarray(sd.get("lm_head.weight", wte))
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dt)},
            "blocks": tuple(blocks),
            "layers": tuple(l[1] for l in layers),
            "final_norm": arr("model.final_layernorm.weight"),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(lm_w.T), dtype=dt),
        }

    # ------------------------------------------------------------------ #
    def _memory_block(self, block, layer, x2h, kv_pages, metadata):
        """Shared attention+MLP block on the 2H-wide input (NO internal
        residuals), with this use's LoRA adapters."""
        normed = rms_norm(x2h, block["input_norm"], self.eps)
        lora_fn = None
        if self.attn_adapter:
            # per-use LoRA on the shared q/k/v projections
            def lora_fn(nm, x, base):
                if f"{nm}_a0" not in layer:   # adapters exist on q/k/v only
                    return base
                lo = jnp.dot(jnp.dot(x, layer[f"{nm}_a0"]),
                             layer[f"{nm}_a1"])
                return base + lo.astype(base.dtype)
        attn_out, kv_pages = attention_block(
            block, normed, kv_pages, metadata, self.attn_spec,
            self.m_q, self.m_o, attn_backend=self.attn_backend,
            kv_scale=self.config.kv_scale, lora_fn=lora_fn)
        y = rms_norm(attn_out, block["pre_ff_norm"], self.eps)
        gu = self.m_lin.apply(block["gate_up"], y)
        gu = gu + jnp.dot(jnp.dot(y, layer["mlp_a0"]),
                          layer["mlp_a1"]).astype(gu.dtype)
        I = gu.shape[-1] // 2
        g, u = gu[:, :I], gu[:, I:]
        ha = getattr(self.hf, "hidden_act", "gelu")
        if ha == "gelu":
            act = jax.nn.gelu(g.astype(jnp.float32), approximate=False)
        elif ha in ("gelu_pytorch_tanh", "gelu_new"):
            act = jax.nn.gelu(g.astype(jnp.float32), approximate=True)
        else:
            act = jax.nn.silu(g.astype(jnp.float32))
        y = self.m_lin.apply(block["down"],
                             (act.astype(self.dtype) * u))
        return y, kv_pages

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None, lora=None, lora_slots=None):
        h = self._embed(params, token_ids, input_embeds)
        original = h
        kv = kv_pages["kv"]
        conv, ssm = kv_pages["conv_state"], kv_pages["ssm_state"]

        new_kv = [kv[j] for j in range(self.n_hybrid)]
        new_conv, new_ssm = [], []
        hybrid_ord = 0
        for i, bt in enumerate(self.block_types):
            layer = params["layers"][i]
            residual = h
            if bt == "hybrid":
                j = hybrid_ord
                block = params["blocks"][j % self.num_mem_blocks]
                x2h = jnp.concatenate([h, original], axis=-1)
                t_h, pages = self._memory_block(
                    block, layer, x2h, kv[j], metadata)
                new_kv[j] = pages
                t_h = self.m_o.apply(layer["linear"], t_h)
                h = h + t_h
                hybrid_ord += 1
            normed = rms_norm(h, layer["norm"], self.eps)
            out, nc, ns = mamba2_mixer(layer, normed, conv[i], ssm[i],
                                       metadata, self.geom, self.m_lin,
                                       self.dtype)
            h = residual + out
            new_conv.append(nc)
            new_ssm.append(ns)
        out_cache = {
            "kv": jnp.stack(new_kv, axis=0) if self.n_hybrid else kv,
            "conv_state": jnp.stack(new_conv, axis=0),
            "ssm_state": jnp.stack(new_ssm, axis=0),
        }
        h = rms_norm(h, params["final_norm"], self.eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        return logits.astype(jnp.float32), out_cache

    def param_pspecs(self, params) -> Any:
        return jax.tree.map(lambda a: P(*([None] * a.ndim)), params)
