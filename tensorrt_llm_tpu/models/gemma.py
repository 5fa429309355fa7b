"""Gemma 2 decoder.

Behavioral reference: tensorrt_llm/_torch/models/modeling_gemma3.py family
(Gemma2 conventions): RMSNorm computes x*(1+w), embeddings scaled by
sqrt(hidden), four norms per layer (pre/post attention + pre/post FFN),
GELU-tanh MLP, attention logit soft-cap, final logit soft-cap, and
alternating sliding-window / global attention layers. The alternation is
handled inside the layer scan with a ``lax.cond`` over two attention
variants so the stacked-layer compile stays O(1) in depth.
"""
from __future__ import annotations

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.attention import AttentionMetadata
from ..ops.rope import RopeConfig, rope_cos_sin
from .llama import LlamaForCausalLM
from .modeling_utils import AttentionSpec, attention_block, register_model


def gemma_rms_norm(x, weight, eps):
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    out = xf * jax.lax.rsqrt(var + eps)
    return (out * (1.0 + weight.astype(jnp.float32))).astype(dtype)


@register_model("gemma2")
class Gemma2ForCausalLM(LlamaForCausalLM):
    architectures = ("Gemma2ForCausalLM",)

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.attn_softcap = getattr(hf, "attn_logit_softcapping", 50.0)
        self.final_softcap = getattr(hf, "final_logit_softcapping", 30.0)
        self.sliding_window = getattr(hf, "sliding_window", 4096)
        q_scalar = getattr(hf, "query_pre_attn_scalar", self.head_dim)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(q_scalar),
            rope=RopeConfig.from_hf_config(hf, self.head_dim),
            soft_cap=self.attn_softcap, is_neox=True)
        self.tie_embeddings = True  # gemma always ties lm_head

    def _layer_is_sliding(self, idx: int) -> bool:
        # HF Gemma2: even layers sliding, odd layers global
        lt = getattr(self.hf, "layer_types", None)
        if lt:
            return lt[idx] == "sliding_attention"
        return idx % 2 == 0

    # ------------------------------------------------------------------ #
    def init_params(self, rng):
        hf = self.hf
        H, V, I = self.hidden_size, self.vocab_size, self.intermediate_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        L = self.num_layers
        nprng = np.random.default_rng(0)

        def mat(shape):
            return nprng.standard_normal(shape, np.float32) * 0.02

        sd: Dict[str, np.ndarray] = {
            "model.embed_tokens.weight": mat((V, H)),
            "model.norm.weight": np.zeros(H, np.float32),
        }
        for i in range(L):
            for name, shape in [("self_attn.q_proj", (nq * hd, H)),
                                ("self_attn.k_proj", (nkv * hd, H)),
                                ("self_attn.v_proj", (nkv * hd, H)),
                                ("self_attn.o_proj", (H, nq * hd)),
                                ("mlp.gate_proj", (I, H)),
                                ("mlp.up_proj", (I, H)),
                                ("mlp.down_proj", (H, I))]:
                sd[f"model.layers.{i}.{name}.weight"] = mat(shape)
            for norm in ("input_layernorm", "post_attention_layernorm",
                         "pre_feedforward_layernorm",
                         "post_feedforward_layernorm"):
                sd[f"model.layers.{i}.{norm}.weight"] = np.zeros(H, np.float32)
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        L = self.num_layers
        dtype = self.dtype

        def t(name):
            return np.ascontiguousarray(np.transpose(sd[name]))

        def stack_quant(method, fmt):
            per = []
            for i in range(L):
                from .modeling_utils import quantize_linear
                per.append(quantize_linear(method, t(fmt.format(i)),
                                           dtype=dtype))
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per)

        def stack_norm(fmt):
            return jnp.stack([jnp.asarray(sd[fmt.format(i)], dtype=dtype)
                              for i in range(L)])

        layers = {
            "input_norm": stack_norm("model.layers.{}.input_layernorm.weight"),
            "post_attn_norm": stack_norm(
                "model.layers.{}.post_attention_layernorm.weight"),
            "pre_ffn_norm": stack_norm(
                "model.layers.{}.pre_feedforward_layernorm.weight"),
            "post_ffn_norm": stack_norm(
                "model.layers.{}.post_feedforward_layernorm.weight"),
            "q": stack_quant(self.m_q, "model.layers.{}.self_attn.q_proj.weight"),
            "k": stack_quant(self.m_kv, "model.layers.{}.self_attn.k_proj.weight"),
            "v": stack_quant(self.m_kv, "model.layers.{}.self_attn.v_proj.weight"),
            "o": stack_quant(self.m_o, "model.layers.{}.self_attn.o_proj.weight"),
            "gate": stack_quant(self.m_mlp, "model.layers.{}.mlp.gate_proj.weight"),
            "up": stack_quant(self.m_mlp, "model.layers.{}.mlp.up_proj.weight"),
            "down": stack_quant(self.m_mlp, "model.layers.{}.mlp.down_proj.weight"),
            "is_sliding": jnp.asarray(
                [self._layer_is_sliding(i) for i in range(L)], jnp.bool_),
        }
        from .modeling_utils import quantize_linear
        wte = np.asarray(sd["model.embed_tokens.weight"])
        return {
            "embed": {"weight": jnp.asarray(wte, dtype=dtype)},
            "layers": layers,
            "final_norm": jnp.asarray(sd["model.norm.weight"], dtype=dtype),
            "lm_head": quantize_linear(
                self.m_lm_head, np.ascontiguousarray(wte.T), dtype=dtype),
        }

    # ------------------------------------------------------------------ #
    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None):
        H = self.hidden_size
        h = self._embed(params, token_ids, input_embeds)
        h = h * jnp.asarray(math.sqrt(H), self.dtype)
        spec = self.attn_spec
        eps = self.rms_eps
        cos_sin = rope_cos_sin(spec.rope, metadata.positions)
        sliding_spec = AttentionSpec(
            num_heads=spec.num_heads, num_kv_heads=spec.num_kv_heads,
            head_dim=spec.head_dim, sm_scale=spec.sm_scale, rope=spec.rope,
            sliding_window=self.sliding_window, soft_cap=spec.soft_cap)

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
            normed = gemma_rms_norm(h, layer["input_norm"], eps)
            attn_out, kvf = jax.lax.cond(
                layer["is_sliding"],
                lambda args: attn(sliding_spec, *args),
                lambda args: attn(spec, *args),
                (layer, normed, kvf, md_l))
            h = h + gemma_rms_norm(attn_out, layer["post_attn_norm"], eps)
            normed = gemma_rms_norm(h, layer["pre_ffn_norm"], eps)
            gate = self.m_mlp.apply(layer["gate"], normed)
            up = self.m_mlp.apply(layer["up"], normed)
            act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
            mlp_out = self.m_mlp.apply(layer["down"],
                                       act.astype(self.dtype) * up)
            h = h + gemma_rms_norm(mlp_out, layer["post_ffn_norm"], eps)
            return (h, kvf), None

        (h, kv_flat), _ = jax.lax.scan(
            layer_body, (h, kv_flat),
            (params["layers"], jnp.arange(L_n, dtype=jnp.int32)))
        kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        h = gemma_rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if self.final_softcap:
            logits = self.final_softcap * jnp.tanh(logits / self.final_softcap)
        return logits, kv_pages

    def param_pspecs(self, params) -> Any:
        from jax.sharding import PartitionSpec as P
        fake = {**params, "layers": {
            **{k: v for k, v in params["layers"].items()
               if k not in ("post_attn_norm", "pre_ffn_norm",
                            "post_ffn_norm", "is_sliding", "input_norm")},
            "input_norm": params["layers"]["input_norm"],
            "post_norm": params["layers"]["post_attn_norm"],
        }}
        base = LlamaForCausalLM.param_pspecs(self, fake)
        layers = base["layers"]
        layers.pop("post_norm")
        layers["post_attn_norm"] = P(None, None)
        layers["pre_ffn_norm"] = P(None, None)
        layers["post_ffn_norm"] = P(None, None)
        layers["is_sliding"] = P(None)
        return base


@register_model("gemma3_text")
class Gemma3ForCausalLM(Gemma2ForCausalLM):
    """Gemma 3 (text): Gemma2 conventions minus the soft-caps, plus
    per-head QK gemma-norms and DUAL rotary bases — sliding layers use
    ``rope_local_base_freq`` (no scaling), full-attention layers use
    ``rope_theta`` with the config's rope_scaling (linear 8x on the
    larger checkpoints). Layer pattern from ``config.layer_types``
    (5 local : 1 global). Reference:
    tensorrt_llm/_torch/models/modeling_gemma3.py:1."""
    architectures = ("Gemma3ForCausalLM", "Gemma3TextModel")

    def __init__(self, model_config):
        super().__init__(model_config)
        hf = self.hf
        self.attn_softcap = getattr(hf, "attn_logit_softcapping", None)
        self.final_softcap = getattr(hf, "final_logit_softcapping", None)
        q_scalar = getattr(hf, "query_pre_attn_scalar", 256)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads, num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=q_scalar ** -0.5,
            rope=RopeConfig.from_hf_config(hf, self.head_dim),
            soft_cap=None, is_neox=True)
        self.local_rope = RopeConfig(
            head_dim=self.head_dim,
            rope_theta=getattr(hf, "rope_local_base_freq", 10000.0),
            max_position_embeddings=hf.max_position_embeddings,
            is_neox=True)

    def _layer_is_sliding(self, idx: int) -> bool:
        lt = getattr(self.hf, "layer_types", None)
        if lt:
            return lt[idx] == "sliding_attention"
        return (idx + 1) % 6 != 0         # 5 local : 1 global

    def init_params(self, rng):
        hd, L = self.head_dim, self.num_layers
        # piggyback on gemma2 dummy init, then add qk-norm weights via
        # a second load (the loader reads them when present)
        self._dummy_qk = True
        try:
            return super().init_params(rng)
        finally:
            del self._dummy_qk

    def load_hf_state_dict(self, sd: Dict[str, Any]) -> Dict[str, Any]:
        sd = dict(sd)
        hd, L = self.head_dim, self.num_layers
        if getattr(self, "_dummy_qk", False):
            for i in range(L):
                p = f"model.layers.{i}.self_attn."
                sd.setdefault(p + "q_norm.weight", np.zeros(hd, np.float32))
                sd.setdefault(p + "k_norm.weight", np.zeros(hd, np.float32))
        params = super().load_hf_state_dict(sd)
        dtype = self.dtype
        params["layers"]["q_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.q_norm.weight"],
                        dtype=jnp.float32) for i in range(L)])
        params["layers"]["k_norm"] = jnp.stack([
            jnp.asarray(sd[f"model.layers.{i}.self_attn.k_norm.weight"],
                        dtype=jnp.float32) for i in range(L)])
        return params

    def forward(self, params, token_ids, kv_pages, metadata,
                input_embeds=None):
        H = self.hidden_size
        h = self._embed(params, token_ids, input_embeds)
        h = h * jnp.asarray(math.sqrt(H), self.dtype)
        spec = self.attn_spec
        eps = self.rms_eps
        cos_sin_global = rope_cos_sin(spec.rope, metadata.positions)
        cos_sin_local = rope_cos_sin(self.local_rope, metadata.positions)
        sliding_spec = AttentionSpec(
            num_heads=spec.num_heads, num_kv_heads=spec.num_kv_heads,
            head_dim=spec.head_dim, sm_scale=spec.sm_scale, rope=spec.rope,
            sliding_window=self.sliding_window, soft_cap=None)

        shard_mesh, shard_axis = self.attn_shard_args()

        def q_norm(layer, q):
            return gemma_rms_norm(q, layer["q_norm"], eps)

        def k_norm(layer, k):
            return gemma_rms_norm(k, layer["k_norm"], eps)

        def attn(which_spec, cs, layer, normed, layer_kv, md):
            return attention_block(
                layer, normed, layer_kv, md, which_spec,
                self.m_q, self.m_o, attn_backend=self.attn_backend,
                kv_scale=self.config.kv_scale, rope_cos_sin=cs,
                q_norm=q_norm, k_norm=k_norm,
                mesh=shard_mesh, tp_axis=shard_axis)

        # pool-as-carry threading (ops/attention.py layer_metadata)
        from ..ops.attention import layer_metadata
        L_n, P_n, ps_n = kv_pages.shape[:3]
        kv_flat = kv_pages.reshape((L_n * P_n,) + kv_pages.shape[2:])

        def layer_body(carry, xs):
            h, kvf = carry
            layer, li = xs
            md_l = layer_metadata(metadata, li, P_n, ps_n, L_n)
            normed = gemma_rms_norm(h, layer["input_norm"], eps)
            attn_out, kvf = jax.lax.cond(
                layer["is_sliding"],
                lambda args: attn(sliding_spec, cos_sin_local, *args),
                lambda args: attn(spec, cos_sin_global, *args),
                (layer, normed, kvf, md_l))
            h = h + gemma_rms_norm(attn_out, layer["post_attn_norm"], eps)
            normed = gemma_rms_norm(h, layer["pre_ffn_norm"], eps)
            gate = self.m_mlp.apply(layer["gate"], normed)
            up = self.m_mlp.apply(layer["up"], normed)
            act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
            mlp_out = self.m_mlp.apply(layer["down"],
                                       act.astype(self.dtype) * up)
            h = h + gemma_rms_norm(mlp_out, layer["post_ffn_norm"], eps)
            return (h, kvf), None

        (h, kv_flat), _ = jax.lax.scan(
            layer_body, (h, kv_flat),
            (params["layers"], jnp.arange(L_n, dtype=jnp.int32)))
        kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        h = gemma_rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if self.final_softcap:
            logits = self.final_softcap * jnp.tanh(
                logits / self.final_softcap)
        return logits, kv_pages

    def param_pspecs(self, params) -> Any:
        from jax.sharding import PartitionSpec as P
        layers = dict(params["layers"])
        qn = layers.pop("q_norm", None)
        kn = layers.pop("k_norm", None)
        spec = super().param_pspecs({**params, "layers": layers})
        if qn is not None:
            spec["layers"]["q_norm"] = P(None, None)
            spec["layers"]["k_norm"] = P(None, None)
        return spec


# ----------------------------------------------------------------------- #
# VSWA (variable sliding-window attention): dual KV pools
# (reference: resource_manager.py:1878 per-window pools)
# ----------------------------------------------------------------------- #
def _gemma2_enable_vswa(self, window: int) -> None:
    """Split the alternating sliding/global layers onto two KV pools.
    Requires strict alternation starting with a sliding layer (HF
    Gemma-2's layout)."""
    L = self.num_layers
    pattern = [self._layer_is_sliding(i) for i in range(L)]
    if L % 2 or pattern != [i % 2 == 0 for i in range(L)]:
        raise ValueError("VSWA needs strict sliding/global alternation")
    self.vswa_enabled = True
    self.vswa_window = window
    self.num_sliding_layers = L // 2
    self.num_global_layers = L // 2


def _gemma2_make_kv_pages(self, num_pages, page_size, num_sw_pages=None):
    import jax.numpy as jnp
    if not getattr(self, "vswa_enabled", False) or num_sw_pages is None:
        return LlamaForCausalLM.make_kv_pages(self, num_pages, page_size)
    kvh, hd = self.num_kv_heads, self.head_dim
    dt = self.config.kv_cache_dtype
    Lg = self.num_global_layers
    Ls = self.num_sliding_layers
    return (jnp.zeros((Lg, num_pages, page_size, 2 * kvh, hd), dt),
            jnp.zeros((Ls, num_sw_pages, page_size, 2 * kvh, hd), dt))


def _gemma2_kv_pspec(self):
    base = LlamaForCausalLM.kv_pspec(self)
    if not getattr(self, "vswa_enabled", False):
        return base
    return (base, base)


def _gemma2_forward_vswa(self, params, token_ids, kv_pages, metadata,
                         input_embeds=None):
    """Pair scan: each step runs one sliding layer (small pool, sliding
    metadata) then one global layer (full pool)."""
    import dataclasses as _dc
    kv_g, kv_s = kv_pages
    H = self.hidden_size
    h = self._embed(params, token_ids, input_embeds)
    h = h * jnp.asarray(math.sqrt(H), self.dtype)
    spec = self.attn_spec
    eps = self.rms_eps
    cos_sin = rope_cos_sin(spec.rope, metadata.positions)
    sliding_spec = AttentionSpec(
        num_heads=spec.num_heads, num_kv_heads=spec.num_kv_heads,
        head_dim=spec.head_dim, sm_scale=spec.sm_scale, rope=spec.rope,
        sliding_window=self.vswa_window, soft_cap=spec.soft_cap)
    md_sw = metadata.for_sliding_pool()
    md = _dc.replace(metadata, page_indices_sw=None, slot_mapping_sw=None)
    shard_mesh, shard_axis = self.attn_shard_args()

    layers = params["layers"]
    lay_s = jax.tree.map(lambda a: a[0::2], layers)
    lay_g = jax.tree.map(lambda a: a[1::2], layers)

    def half_layer(h, layer, layer_kv, which_spec, which_md):
        normed = gemma_rms_norm(h, layer["input_norm"], eps)
        attn_out, new_kv = attention_block(
            layer, normed, layer_kv, which_md, which_spec,
            self.m_q, self.m_o, attn_backend=self.attn_backend,
            kv_scale=self.config.kv_scale, rope_cos_sin=cos_sin,
            mesh=shard_mesh, tp_axis=shard_axis)
        h = h + gemma_rms_norm(attn_out, layer["post_attn_norm"], eps)
        normed = gemma_rms_norm(h, layer["pre_ffn_norm"], eps)
        gate = self.m_mlp.apply(layer["gate"], normed)
        up = self.m_mlp.apply(layer["up"], normed)
        act = jax.nn.gelu(gate.astype(jnp.float32), approximate=True)
        mlp_out = self.m_mlp.apply(layer["down"],
                                   act.astype(self.dtype) * up)
        h = h + gemma_rms_norm(mlp_out, layer["post_ffn_norm"], eps)
        return h, new_kv

    # both pools flat in the carry (pool-as-carry threading)
    from ..ops.attention import layer_metadata
    Ls_n, Ps_n, ps_n = kv_s.shape[:3]
    Lg_n, Pg_n = kv_g.shape[:2]
    kvs_flat = kv_s.reshape((Ls_n * Ps_n,) + kv_s.shape[2:])
    kvg_flat = kv_g.reshape((Lg_n * Pg_n,) + kv_g.shape[2:])

    def pair_body(carry, xs):
        h, kvs, kvg = carry
        ls, lg, li = xs
        h, kvs = half_layer(h, ls, kvs, sliding_spec,
                            layer_metadata(md_sw, li, Ps_n, ps_n, Ls_n))
        h, kvg = half_layer(h, lg, kvg, spec,
                            layer_metadata(md, li, Pg_n, ps_n, Lg_n))
        return (h, kvs, kvg), None

    (h, kvs_flat, kvg_flat), _ = jax.lax.scan(
        pair_body, (h, kvs_flat, kvg_flat),
        (lay_s, lay_g, jnp.arange(Ls_n, dtype=jnp.int32)))
    kv_s = kvs_flat.reshape((Ls_n, Ps_n) + kvs_flat.shape[1:])
    kv_g = kvg_flat.reshape((Lg_n, Pg_n) + kvg_flat.shape[1:])
    h = gemma_rms_norm(h, params["final_norm"], eps)
    last = self._gather_logits(h, metadata)
    logits = self.m_lm_head.apply(params["lm_head"], last)
    logits = logits.astype(jnp.float32)
    if self.final_softcap:
        logits = self.final_softcap * jnp.tanh(logits / self.final_softcap)
    return logits, (kv_g, kv_s)


_gemma2_orig_forward = Gemma2ForCausalLM.forward


def _gemma2_forward(self, params, token_ids, kv_pages, metadata,
                    input_embeds=None):
    if getattr(self, "vswa_enabled", False):
        return _gemma2_forward_vswa(self, params, token_ids, kv_pages,
                                    metadata, input_embeds)
    return _gemma2_orig_forward(self, params, token_ids, kv_pages,
                                metadata, input_embeds)


Gemma2ForCausalLM.enable_vswa = _gemma2_enable_vswa
Gemma2ForCausalLM.make_kv_pages = _gemma2_make_kv_pages
Gemma2ForCausalLM.kv_pspec = _gemma2_kv_pspec
Gemma2ForCausalLM.forward = _gemma2_forward
