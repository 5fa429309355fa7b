"""Llama-family decoder (Llama 2/3, TinyLlama, Mistral).

Behavioral reference: tensorrt_llm/_torch/models/modeling_llama.py (and
modeling_mistral.py for sliding windows). TPU-native structure: all
decoder layers are stacked along a leading axis and executed with
``lax.scan`` so the graph contains ONE layer body regardless of depth —
compile time stays flat and the pipeline-parallel split later becomes a
scan-over-stages. Weights live as [K, N] matrices quantized through the
configured LinearMethod at load time.
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..ops.attention import AttentionMetadata
from ..ops.norm import rms_norm
from ..ops.rope import RopeConfig
from .modeling_utils import (AttentionSpec, DecoderModelForCausalLM,
                             ModelConfig, attention_block, quantize_linear,
                             register_model)


@register_model("llama", "mistral", "tinyllama")
class LlamaForCausalLM(DecoderModelForCausalLM):
    architectures = ("LlamaForCausalLM", "MistralForCausalLM")

    def __init__(self, model_config: ModelConfig):
        super().__init__(model_config)
        hf = self.hf
        self.hidden_size = hf.hidden_size
        self.num_heads = hf.num_attention_heads
        self.intermediate_size = hf.intermediate_size
        self.rms_eps = getattr(hf, "rms_norm_eps", 1e-6)
        self.tie_embeddings = getattr(hf, "tie_word_embeddings", False)
        self.attn_spec = AttentionSpec(
            num_heads=self.num_heads,
            num_kv_heads=self.num_kv_heads,
            head_dim=self.head_dim,
            sm_scale=1.0 / math.sqrt(self.head_dim),
            rope=RopeConfig.from_hf_config(hf, self.head_dim),
            sliding_window=getattr(hf, "sliding_window", None),
            is_neox=True)
        # Qwen3-style per-head RMS norm on q/k before RoPE
        self.use_qk_norm = False
        # OLMo2-style: qk norm over the full projection dim, and norms
        # applied to sublayer OUTPUTS instead of inputs
        self.qk_norm_full = False
        self.norm_placement = "pre"   # "pre" (llama) | "post" (olmo2)
        # Granite-style scalar multipliers (neutral for llama)
        self.embedding_multiplier = 1.0
        self.residual_multiplier = 1.0
        self.logits_scaling = 1.0
        # per-layer sliding alternation: subclasses set an AttentionSpec
        # with the window and put an "is_sliding" flag in each layer
        self.sliding_spec = None
        # gated-MLP activation: act(gate) * up
        self.mlp_act = "silu"     # silu | gelu_tanh | relu
        # per-projection quant methods (exclude_modules honored by name)
        self.m_q = self._method("q_proj")
        self.m_kv = self._method("k_proj")
        self.m_o = self._method("o_proj")
        self.m_mlp = self._method("mlp")
        self.m_lm_head = self._method("lm_head")

    # ------------------------------------------------------------------ #
    # Parameters
    # ------------------------------------------------------------------ #
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        """Random init (load_format="dummy"; reference: model_loader.py).
        Generated host-side with numpy — device RNG would round-trip the
        full parameter set through HBM (pathological over a TPU tunnel)."""
        hf = self.hf
        H, V, I = self.hidden_size, self.vocab_size, self.intermediate_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        L = self.num_layers
        nprng = np.random.default_rng(0)

        def mat(shape):
            return (nprng.standard_normal(shape, np.float32) * 0.02)

        sd: Dict[str, np.ndarray] = {}
        sd["model.embed_tokens.weight"] = mat((V, H))
        for name, shape in [("self_attn.q_proj", (nq * hd, H)),
                            ("self_attn.k_proj", (nkv * hd, H)),
                            ("self_attn.v_proj", (nkv * hd, H)),
                            ("self_attn.o_proj", (H, nq * hd)),
                            ("mlp.gate_proj", (I, H)),
                            ("mlp.up_proj", (I, H)),
                            ("mlp.down_proj", (H, I))]:
            for i in range(L):
                sd[f"model.layers.{i}.{name}.weight"] = mat(shape)
        for i in range(L):
            sd[f"model.layers.{i}.input_layernorm.weight"] = np.ones(H, np.float32)
            sd[f"model.layers.{i}.post_attention_layernorm.weight"] = \
                np.ones(H, np.float32)
        sd["model.norm.weight"] = np.ones(H, np.float32)
        if not self.tie_embeddings:
            sd["lm_head.weight"] = mat((V, H))
        return self.load_hf_state_dict(sd)

    def load_hf_state_dict(self, sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
        """Map HF checkpoint names → stacked param tree, quantizing each
        projection through its method (reference name mapping:
        _torch/models/checkpoints/hf/weight_mapper.py:11)."""
        L = self.num_layers
        dtype = self.dtype

        from .modeling_utils import hf_transpose

        def t(name):  # torch stores [out, in] → we want [in, out]
            return hf_transpose(sd[name])

        smooth_scales = getattr(self, "smooth_scales", None) or {}

        def stack_quant(method, fmt):
            per_layer = []
            for i in range(L):
                name = fmt.format(i)
                bias = sd.get(name.replace(".weight", ".bias"))
                per_layer.append(quantize_linear(
                    method, t(name), bias=bias, dtype=dtype,
                    smooth=smooth_scales.get(name)))
            return jax.tree.map(lambda *xs: jnp.stack(xs), *per_layer)

        layers = {
            "input_norm": jnp.stack([
                jnp.asarray(sd[f"model.layers.{i}.input_layernorm.weight"],
                            dtype=dtype) for i in range(L)]),
            "post_norm": jnp.stack([
                jnp.asarray(
                    sd[f"model.layers.{i}.post_attention_layernorm.weight"],
                    dtype=dtype) for i in range(L)]),
            "q": stack_quant(self.m_q, "model.layers.{}.self_attn.q_proj.weight"),
            "k": stack_quant(self.m_kv, "model.layers.{}.self_attn.k_proj.weight"),
            "v": stack_quant(self.m_kv, "model.layers.{}.self_attn.v_proj.weight"),
            "o": stack_quant(self.m_o, "model.layers.{}.self_attn.o_proj.weight"),
            "gate": stack_quant(self.m_mlp, "model.layers.{}.mlp.gate_proj.weight"),
            "up": stack_quant(self.m_mlp, "model.layers.{}.mlp.up_proj.weight"),
            "down": stack_quant(self.m_mlp, "model.layers.{}.mlp.down_proj.weight"),
        }
        # per-layer KV quant scales: checkpoint-provided (ModelOpt
        # kv_cache_scaling_factor) > calibrated > config default
        ckpt_scales = getattr(self, "checkpoint_kv_scales", None)
        if ckpt_scales is not None and len(ckpt_scales) == L:
            layers["kv_scale"] = jnp.asarray(ckpt_scales, jnp.float32)
        else:
            layers["kv_scale"] = jnp.full((L,), self.config.kv_scale,
                                          jnp.float32)
        params = {
            "embed": {"weight": jnp.asarray(sd["model.embed_tokens.weight"],
                                            dtype=dtype)},
            "layers": layers,
            "final_norm": jnp.asarray(sd["model.norm.weight"], dtype=dtype),
        }
        if self.tie_embeddings:
            lm_w = hf_transpose(sd["model.embed_tokens.weight"])
        else:
            lm_w = hf_transpose(sd["lm_head.weight"])
        params["lm_head"] = quantize_linear(
            self.m_lm_head, lm_w, dtype=dtype)
        return params

    # ------------------------------------------------------------------ #
    # Forward (jitted hot path)
    # ------------------------------------------------------------------ #
    def lora_module_shapes(self) -> Dict[str, tuple]:
        H, I = self.hidden_size, self.intermediate_size
        nq, nkv, hd = self.num_heads, self.num_kv_heads, self.head_dim
        return {"q": (H, nq * hd), "k": (H, nkv * hd), "v": (H, nkv * hd),
                "o": (nq * hd, H), "gate": (H, I), "up": (H, I),
                "down": (I, H)}

    def _base_cos_sin(self, metadata):
        """Rope tables for this batch; Qwen2-VL overrides with M-RoPE
        (3-axis positions from metadata.positions_mrope)."""
        from ..ops.rope import rope_cos_sin
        return rope_cos_sin(self.attn_spec.rope, metadata.positions)

    def _rope_variants(self, positions, cos_sin):
        """Hook: build the per-layer rope alternatives (default: one)."""
        return cos_sin

    def _layer_rope(self, layer, variants):
        """Hook: pick this layer's cos/sin from the variants."""
        return variants

    def forward(self, params: Dict[str, Any], token_ids: jax.Array,
                kv_pages: jax.Array, metadata: AttentionMetadata,
                input_embeds=None, lora=None, lora_slots=None,
                collect_kv_stats: bool = False,
                collect_hidden: bool = False,
                deepstack=None):
        h = self._embed(params, token_ids, input_embeds)
        if self.embedding_multiplier != 1.0:
            h = h * self.embedding_multiplier
        rm = self.residual_multiplier
        spec = self.attn_spec
        eps = self.rms_eps
        cos_sin = self._base_cos_sin(metadata)
        # per-layer rope variants (Gemma3 local/global thetas, SmolLM3
        # NoPE layers, Exaone4 rope-on-sliding-only): subclasses
        # precompute alternates and select per layer via scan flags
        rope_variants = self._rope_variants(metadata.positions, cos_sin)

        use_lora = lora is not None
        lora_scan_xs = None
        if use_lora:
            from ..lora.lora_manager import apply_lora
            # scan slices carry the per-layer A/B (+ DoRA mag when
            # present); scales close over
            lora_scan_xs = {
                m: ((a, b) if mag is None else (a, b, mag))
                for m, (a, b, _, mag) in lora.items()}
            lora_scales = {m: s for m, (_, _, s, _) in lora.items()}

            def make_lora_fn(lora_layer):
                def f(mod, x, out):
                    if mod not in lora_layer:
                        return out
                    entry = lora_layer[mod]
                    mag = entry[2] if len(entry) > 2 else None
                    return apply_lora(x, out, entry[0], entry[1],
                                      lora_scales[mod], lora_slots,
                                      mag_layer=mag)
                return f
        else:
            def make_lora_fn(_):
                return None

        if self.use_qk_norm and self.qk_norm_full:
            # OLMo2: RMS over the whole flattened projection, not per head
            def _full(x, w):
                T = x.shape[0]
                flat = x.reshape(T, -1)
                return rms_norm(flat, w, eps).reshape(x.shape)

            def q_norm(layer, q):
                return _full(q, layer["q_norm"])

            def k_norm(layer, k):
                return _full(k, layer["k_norm"])
        elif self.use_qk_norm:
            def q_norm(layer, q):
                return rms_norm(q, layer["q_norm"], eps)

            def k_norm(layer, k):
                return rms_norm(k, layer["k_norm"], eps)
        else:
            q_norm = k_norm = None

        shard_mesh, shard_axis = self.attn_shard_args()
        ring = self.ring_cp_active()
        if ring:
            # KV-page-sharded ring CP (ops/cp_ring.py): attention runs
            # its own shard_map over cp (+ tp heads); pass the mesh even
            # when no head axis sharded
            shard_mesh = self.mesh
            if shard_axis is None and self.config.mapping.tp_size > 1 \
                    and (2 * self.num_kv_heads) % \
                    self.config.mapping.tp_size == 0:
                shard_axis = "tp"
        tok_spec = self.token_pspec()

        def constrain(t):
            if tok_spec is not None:
                return jax.lax.with_sharding_constraint(t, tok_spec)
            return t

        h = constrain(h)

        post_norms = self.norm_placement == "post"
        # GLM-4-style sandwich: pre-norms as usual PLUS extra norms on
        # each sublayer's output before the residual add
        sandwich = self.norm_placement == "sandwich"

        def apply_layer(h, layer, layer_kv, metadata, lora_layer,
                        layer_idx):
            lf = make_lora_fn(lora_layer)
            # "pre": norm the sublayer INPUT (llama); "post": feed h raw
            # and norm the sublayer OUTPUT (OLMo2 reordered residual)
            attn_in = h if post_norms else \
                rms_norm(h, layer["input_norm"], eps)

            def run_attn(attn_spec, cs):
                return attention_block(
                    layer, attn_in, layer_kv, metadata, attn_spec,
                    self.m_q, self.m_o, attn_backend=self.attn_backend,
                    kv_scale=layer.get("kv_scale", self.config.kv_scale),
                    rope_cos_sin=cs,
                    q_norm=q_norm, k_norm=k_norm,
                    mesh=shard_mesh, tp_axis=shard_axis, ring_cp=ring,
                    sparse_keep_pages=self.config.sparse_keep_pages,
                    sparse_algo=self.config.sparse_algo,
                    star_block_size=self.config.star_block_size,
                    lora_fn=lf,
                    collect_kv_stats=collect_kv_stats)

            cs = self._layer_rope(layer, rope_variants)
            if self.sliding_spec is not None:
                # alternating local/global layers (Exaone4-style):
                # is_sliding flag rides the scan
                attn = jax.lax.cond(
                    layer["is_sliding"],
                    lambda _: run_attn(self.sliding_spec, cs),
                    lambda _: run_attn(spec, cs), None)
            else:
                attn = run_attn(spec, cs)
            if collect_kv_stats:
                attn_out, new_pages, kv_stat = attn
            else:
                attn_out, new_pages = attn
                kv_stat = None
            if post_norms:
                attn_out = rms_norm(attn_out, layer["input_norm"], eps)
            elif sandwich:
                attn_out = rms_norm(attn_out, layer["post_attn_extra"], eps)
            h = h + (attn_out if rm == 1.0 else rm * attn_out)
            normed = h if post_norms else \
                rms_norm(h, layer["post_norm"], eps)
            gate = self.m_mlp.apply(layer["gate"], normed)
            up = self.m_mlp.apply(layer["up"], normed)
            if lf is not None:
                gate = lf("gate", normed, gate)
                up = lf("up", normed, up)
            act_fn = {"silu": jax.nn.silu,
                      "gelu_tanh": lambda x: jax.nn.gelu(x, approximate=True),
                      "relu": jax.nn.relu}[self.mlp_act]
            act = act_fn(gate.astype(jnp.float32)) \
                .astype(self.dtype) * up
            mlp_out = self.m_mlp.apply(layer["down"], act)
            if lf is not None:
                mlp_out = lf("down", act, mlp_out)
            if post_norms:
                mlp_out = rms_norm(mlp_out, layer["post_norm"], eps)
            elif sandwich:
                mlp_out = rms_norm(mlp_out, layer["post_mlp_extra"], eps)
            h = constrain(h + (mlp_out if rm == 1.0 else rm * mlp_out))
            if deepstack is not None:
                # deepstack visual features (qwen3-vl): early layers add
                # per-token vision features at image positions
                nds = deepstack.shape[0]
                add = jnp.where(
                    layer_idx < nds,
                    deepstack[jnp.minimum(layer_idx, nds - 1)], 0.0)
                h = h + add.astype(h.dtype)
            return h, new_pages, kv_stat

        L_n, P_n, ps_n = (kv_pages.shape[0], kv_pages.shape[1],
                          kv_pages.shape[2])
        layer_ids = jnp.arange(L_n, dtype=jnp.int32)
        if ring:
            # ring CP owns its pool sharding/ownership math per layer:
            # keep the per-layer xs/ys threading there
            def layer_body(h, xs):
                layer, layer_kv, lora_layer, layer_idx = xs
                h, new_pages, kv_stat = apply_layer(
                    h, layer, layer_kv, metadata, lora_layer, layer_idx)
                ys = (new_pages, kv_stat) if collect_kv_stats \
                    else new_pages
                return h, ys

            scan_xs = (params["layers"], kv_pages, lora_scan_xs,
                       layer_ids)
            h, ys = jax.lax.scan(layer_body, h, scan_xs)
            if collect_kv_stats:
                kv_pages, kv_stats = ys
            else:
                kv_pages = ys
        else:
            # pool-as-carry threading (round 5): ONE flat [(L*P), ...]
            # pool rides the scan carry and each layer scatters into its
            # l*P page region in place — the old per-layer xs/ys
            # threading re-stacked the full pool every step (a 36 ms
            # full-pool copy at bench geometry; ops/attention.py
            # layer_metadata, tools/pool_carry_probe.py)
            from ..ops.attention import layer_metadata
            kv_flat = kv_pages.reshape((L_n * P_n,) + kv_pages.shape[2:])

            def layer_body(carry, xs):
                h, kvf = carry
                layer, lora_layer, layer_idx = xs
                md_l = layer_metadata(metadata, layer_idx, P_n, ps_n,
                                      L_n)
                h, kvf, kv_stat = apply_layer(
                    h, layer, kvf, md_l, lora_layer, layer_idx)
                return (h, kvf), kv_stat

            (h, kv_flat), kv_stats = jax.lax.scan(
                layer_body, (h, kv_flat),
                (params["layers"], lora_scan_xs, layer_ids))
            kv_pages = kv_flat.reshape((L_n, P_n) + kv_flat.shape[1:])
        # EAGLE draft features: pre-final-norm hidden rows at the logits
        # positions (reference: eagle3.py captures decoder features)
        hidden_rows = self._gather_logits(h, metadata) \
            if collect_hidden else None
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        if collect_kv_stats:
            return logits, kv_pages, kv_stats
        if collect_hidden:
            return logits, kv_pages, hidden_rows
        return logits, kv_pages

    # ------------------------------------------------------------------ #
    # Pipelined forward (true PP: micro-batches + ppermute handoff;
    # reference: _torch/pyexecutor/py_executor.py:1811 _executor_loop_pp)
    # ------------------------------------------------------------------ #
    def forward_pp(self, params: Dict[str, Any], token_ids: jax.Array,
                   kv_pages: jax.Array, metadata: AttentionMetadata,
                   num_microbatches: int = 2):
        """GPipe-scheduled forward over the "pp" mesh axis.

        The token axis splits into M contiguous micro-batches; each pp
        stage runs its local layer block (its shard of the stacked
        layer arrays) and hands the hidden state to the next stage with
        ``ppermute`` — stages genuinely overlap on different
        micro-batches inside one jitted program. Embedding, final norm
        and lm_head stay outside the pipelined region (replicated).
        """
        from ..parallel.pipeline import pipeline_forward, split_metadata

        M = num_microbatches
        T = token_ids.shape[0]
        assert T % M == 0, f"token bucket {T} not divisible by M={M}"
        spec = self.attn_spec
        eps = self.rms_eps
        mapping = self.config.mapping

        h = self._embed(params, token_ids)
        if self.embedding_multiplier != 1.0:
            h = h * self.embedding_multiplier
        rm = self.residual_multiplier
        h_mb = h.reshape(M, T // M, -1)
        md_mb = split_metadata(metadata, M, T)

        def stage_fn(layers_l, h, kv_l, md):
            from ..ops.rope import rope_cos_sin
            cos_sin = rope_cos_sin(spec.rope, md.positions)

            def layer_body(h, xs):
                layer, layer_kv = xs
                normed = rms_norm(h, layer["input_norm"], eps)
                attn_out, new_pages = attention_block(
                    layer, normed, layer_kv, md, spec,
                    self.m_q, self.m_o, attn_backend=self.attn_backend,
                    kv_scale=layer.get("kv_scale", self.config.kv_scale),
                    rope_cos_sin=cos_sin)
                h = h + (attn_out if rm == 1.0 else rm * attn_out)
                normed = rms_norm(h, layer["post_norm"], eps)
                gate = self.m_mlp.apply(layer["gate"], normed)
                up = self.m_mlp.apply(layer["up"], normed)
                act = jax.nn.silu(gate.astype(jnp.float32)) \
                    .astype(self.dtype) * up
                mlp_out = self.m_mlp.apply(layer["down"], act)
                h = h + (mlp_out if rm == 1.0 else rm * mlp_out)
                return h, new_pages

            h, kv_l = jax.lax.scan(layer_body, h, (layers_l, kv_l))
            return h, kv_l

        pspecs = self.param_pspecs(params)
        h_out, kv_pages = pipeline_forward(
            stage_fn, h_mb, params["layers"], kv_pages, md_mb,
            mesh=self.mesh, pp_size=mapping.pp_size,
            layer_pspec=pspecs["layers"], kv_pspec=self.kv_pspec(),
            oob_slot=kv_pages.shape[1] * kv_pages.shape[2])
        h = h_out.reshape(T, -1)
        h = rms_norm(h, params["final_norm"], eps)
        last = self._gather_logits(h, metadata)
        logits = self.m_lm_head.apply(params["lm_head"], last)
        logits = logits.astype(jnp.float32)
        if self.logits_scaling != 1.0:
            logits = logits / self.logits_scaling
        return logits, kv_pages

    # ------------------------------------------------------------------ #
    # Sharding (GSPMD PartitionSpecs; reference TP semantics linear.py:86)
    # ------------------------------------------------------------------ #
    def param_pspecs(self, params) -> Any:
        # pp>1: shard the stacked layer dim over "pp" (weight-sharded
        # pipeline — memory scales with pp; XLA broadcasts each layer's
        # weights during its scan step, prefetch-overlapped)
        pp = "pp" if self.config.mapping.pp_size > 1 else None
        # DWDP: the non-tp matrix dim additionally shards over "dp" so
        # each replica holds 1/dp of the weights at rest; XLA all-gathers
        # a layer's weights inside its scan step (prefetch-overlapped) —
        # the TPU shape of DwdpManager.prefetch_first_layers
        dw = "dp" if (self.config.mapping.enable_dwdp
                      and self.config.mapping.dp_size > 1) else None
        # HELIX CP (reference: mapping.py:533 repurpose_helix_cp_to_tp +
        # kernels/helixKernels.cu): attention runs KV-page-sharded over
        # cp (the ring path) while the cp ranks are REPURPOSED as extra
        # tensor parallelism for the FFN — MLP weights shard over
        # ("cp", "tp") so FFN FLOPs/bytes split across the whole group
        from ..mapping import CpType
        helix = (self.config.mapping.cp_size > 1
                 and self.config.mapping.cp_type == CpType.HELIX)
        mlp_tp = ("cp", "tp") if helix else "tp"

        def linear_spec(p, col: bool, tp="tp"):
            """col: output-dim sharded (P(None,'tp')); row: input-dim."""
            spec = {}
            for k, v in p.items():
                nd = v.ndim
                lead = [pp] + [None] * (nd - 3) if nd >= 3 else \
                    [None] * (nd - 2)
                if k == "weight":
                    spec[k] = P(*lead,
                                tp if not col else dw,
                                tp if col else dw)
                elif k == "weight_scale":
                    if nd == 3:   # [L, K//G, N] groupwise: groups follow K
                        spec[k] = P(pp, None if col else tp,
                                    tp if col else dw)
                    else:         # [L, N] or [N] per-channel: follows N
                        spec[k] = P(*([pp] + [None] * max(0, nd - 2)
                                      if nd >= 2 else []),
                                    tp if col else dw)
                else:             # bias / zeros follow output dim
                    spec[k] = P(*([pp] + [None] * (nd - 2) if nd >= 2
                                  else []), tp if col else dw)
            return spec

        layers = params["layers"]
        layer_specs = {
            "input_norm": P(pp, None),
            "post_norm": P(pp, None),
            "q": linear_spec(layers["q"], col=True),
            "k": linear_spec(layers["k"], col=True),
            "v": linear_spec(layers["v"], col=True),
            "o": linear_spec(layers["o"], col=False),
            "gate": linear_spec(layers["gate"], col=True, tp=mlp_tp),
            "up": linear_spec(layers["up"], col=True, tp=mlp_tp),
            "down": linear_spec(layers["down"], col=False, tp=mlp_tp),
        }
        if "kv_scale" in layers:
            layer_specs["kv_scale"] = P(pp)
        return {
            "embed": {"weight": P(None, None)},
            "layers": layer_specs,
            "final_norm": P(None),
            "lm_head": linear_spec(params["lm_head"], col=True),
        }

    def kv_pspec(self) -> P:
        """Shard KV pools: layer dim over pp, kv heads over (cp, tp) —
        the head axes attention runs shard_map over (Ulysses CP shards
        KV heads exactly like TP does; reference: attention.py:1276).
        RING CP instead shards the PAGE dim over cp (each rank stores
        1/cp of the context; ops/cp_ring.py)."""
        m = self.config.mapping
        pp = "pp" if m.pp_size > 1 else None
        _, head_axes = self.attn_shard_args() if self.mesh is not None \
            else (None, None)
        if head_axes is None:
            head_axes = "tp" if (m.tp_size > 1 and
                                 (2 * self.num_kv_heads) % m.tp_size == 0) \
                else None
        page_axis = "cp" if self.ring_cp_active() else None
        if pp is None and head_axes is None and page_axis is None:
            return P()
        return P(pp, page_axis, None, head_axes, None)
