"""Model-layer foundation: config, registry, shared attention block.

TPU-native analog of the reference model base (reference:
tensorrt_llm/_torch/models/modeling_utils.py — ``DecoderModelForCausalLM``;
module stack _torch/modules/attention.py:314, linear.py). Architecture
differences are deliberate:

  * Models are pure functions over parameter pytrees — no nn.Module state.
    A model object holds only static config + per-projection quant methods
    and is closed over by the jitted step (the XLA "engine").
  * The KV cache is externally managed (AutoDeploy's CachedSequenceInterface
    shape, reference: _torch/auto_deploy/shim/interface.py:80): forward
    receives the paged pools and the per-iteration AttentionMetadata and
    returns updated pools.
  * All sequences are flattened on one ragged token axis; logits are
    gathered at ``metadata.logits_indices`` only (the reference gathers
    last-token logits the same way in model_engine._prepare_tp_inputs).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..llmapi.llm_args import QuantConfig
from ..mapping import Mapping
from ..ops import rope as rope_ops
from ..ops.attention import AttentionMetadata, ragged_paged_attention, write_kv
from ..ops.linear import LinearMethod, make_linear_method
from ..quantization.mode import KvCacheQuantAlgo

MODEL_REGISTRY: Dict[str, type] = {}


def register_model(*model_types: str):
    """Register a model class under HF ``model_type`` names
    (reference: _torch/models/modeling_auto.py auto-registry)."""
    def deco(cls):
        for t in model_types:
            MODEL_REGISTRY[t] = cls
        return cls
    return deco


def get_model_class(model_type: str) -> type:
    if model_type not in MODEL_REGISTRY:
        raise ValueError(
            f"unsupported model_type '{model_type}'; "
            f"registered: {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[model_type]


@dataclasses.dataclass
class ModelConfig:
    """Engine-side model description (reference: _torch ModelConfig)."""
    hf_config: Any                        # transformers PretrainedConfig
    dtype: Any = jnp.bfloat16
    quant_config: QuantConfig = dataclasses.field(default_factory=QuantConfig)
    mapping: Mapping = dataclasses.field(default_factory=Mapping)
    kv_cache_dtype: Any = None            # None → same as dtype
    kv_scale: float = 1.0                 # per-tensor KV quant scale
    # top-k page-sparse decode (ops/sparse_attention.py); None = dense
    sparse_keep_pages: Optional[int] = None
    # page-selection indexer: ROCKET_TOPK (pooled keys) or DSA
    # (lightweight low-rank strided index — dsa.py Indexer analog)
    sparse_algo: str = "ROCKET_TOPK"
    # star attention prefill blocks (anchor+local); None = dense
    star_block_size: Optional[int] = None

    # NVFP4 KV cache: values round to the e2m1 grid at append so the
    # numerics are exactly the reference's fp4 KV (mode.py:66-104
    # NVFP4_KV_CACHE); storage rides the fp8 pool (every e2m1 x scale
    # value is exactly representable in e4m3) since TPU has no 4-bit
    # pool datapath — accuracy-exact, footprint 8b.
    kv_fp4_grid: bool = False

    def __post_init__(self):
        if self.kv_cache_dtype is None:
            kv_algo = self.quant_config.kv_cache_quant_algo
            if kv_algo == KvCacheQuantAlgo.INT8:
                self.kv_cache_dtype = jnp.int8
                self.kv_scale = 0.05      # conservative default abs-range ~6.4
            elif kv_algo == KvCacheQuantAlgo.FP8:
                self.kv_cache_dtype = jnp.float8_e4m3fn
            elif kv_algo == KvCacheQuantAlgo.NVFP4:
                self.kv_cache_dtype = jnp.float8_e4m3fn
                self.kv_fp4_grid = True
                # fp4 saturates at +-6 x scale: the calibrated scale
                # maps the observed absmax onto the grid top
                self.kv_scale = 1.0 / 6.0
            else:
                self.kv_cache_dtype = self.dtype

    @property
    def uses_kv_quant(self) -> bool:
        return self.kv_cache_dtype in (jnp.int8, jnp.float8_e4m3fn)


@dataclasses.dataclass(frozen=True)
class AttentionSpec:
    """Static attention geometry for one layer."""
    num_heads: int
    num_kv_heads: int
    head_dim: int
    sm_scale: float
    rope: Optional[rope_ops.RopeConfig] = None
    sliding_window: Optional[int] = None
    soft_cap: Optional[float] = None
    is_neox: bool = True
    # ALiBi (Bloom/MPT): per-q-head slopes, static tuple; scores get
    # -slope * (q_pos - kv_pos) added before softmax
    alibi_slopes: Optional[tuple] = None
    # attention sinks (gpt-oss): layer params carry a per-q-head sink
    # logit under the "sinks" key when True
    use_sinks: bool = False
    # NVFP4 KV cache: round appended K/V to the e2m1 grid (see
    # ModelConfig.kv_fp4_grid; set by the engine at build)
    kv_fp4: bool = False


def alibi_slopes(num_heads: int) -> tuple:
    """Canonical ALiBi slope schedule (press et al.; HF build_alibi):
    powers of 2^(-8/n) for the nearest power-of-two head count, with
    interleaved extras for non-power-of-two."""
    import math

    def pow2_slopes(n):
        start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
        return [start * (start ** i) for i in range(n)]

    n2 = 2 ** int(math.floor(math.log2(num_heads)))
    slopes = pow2_slopes(n2)
    if n2 != num_heads:
        extra = pow2_slopes(2 * n2)
        slopes += extra[0::2][: num_heads - n2]
    return tuple(slopes)


def attention_block(params: Dict[str, Any],
                    x: jax.Array,                 # [T, hidden]
                    kv_pages: jax.Array,          # [pages, ps, 2*kvh, hd]
                    metadata: AttentionMetadata,
                    spec: AttentionSpec,
                    qkv_method: LinearMethod,
                    o_method: LinearMethod,
                    *,
                    attn_backend: str = "auto",
                    kv_scale: Optional[float] = None,
                    q_norm: Optional[Callable] = None,
                    k_norm: Optional[Callable] = None,
                    rope_cos_sin: Optional[Tuple[jax.Array, jax.Array]] = None,
                    mesh=None,
                    tp_axis: Optional[str] = None,
                    ring_cp: bool = False,
                    sparse_keep_pages: Optional[int] = None,
                    sparse_algo: str = "ROCKET_TOPK",
                    star_block_size: Optional[int] = None,
                    lora_fn: Optional[Callable] = None,
                    pre_o: Optional[Callable] = None,
                    collect_kv_stats: bool = False
                    ) -> Tuple[jax.Array, jax.Array]:
    """Attention with paged KV (reference: modules/attention.py:314
    forward → attention_backend.trtllm.py:1629 single-op path).

    Q/K/V are separate projections rather than one fused GEMM: under GSPMD
    a fused [H, (nq+2nkv)*hd] column shard would split across the q|k|v
    concat boundaries, so per-projection weights with P(None, "tp") is the
    correct TPU idiom (XLA still fuses the three reads of ``x``)."""
    T = x.shape[0]
    nq, nkv, hd = spec.num_heads, spec.num_kv_heads, spec.head_dim
    q = qkv_method.apply(params["q"], x)
    k = qkv_method.apply(params["k"], x)
    v = qkv_method.apply(params["v"], x)
    if lora_fn is not None:
        q = lora_fn("q", x, q)
        k = lora_fn("k", x, k)
        v = lora_fn("v", x, v)
    q = q.reshape(T, nq, hd)
    k = k.reshape(T, nkv, hd)
    v = v.reshape(T, nkv, hd)
    if q_norm is not None:
        q = q_norm(params, q)
    if k_norm is not None:
        k = k_norm(params, k)
    if spec.rope is not None:
        if rope_cos_sin is not None:
            cos, sin = rope_cos_sin  # hoisted out of the layer scan
        else:
            cos, sin = rope_ops.rope_cos_sin(spec.rope, metadata.positions)
        q = rope_ops.apply_rope(q, cos, sin, spec.is_neox)
        k = rope_ops.apply_rope(k, cos, sin, spec.is_neox)
    quant = kv_pages.dtype in (jnp.int8, jnp.float8_e4m3fn)
    ks = kv_scale if quant else None
    if ring_cp:
        # ring/helix context parallelism: KV pages sharded over cp,
        # ownership-masked write + exact LSE combine (ops/cp_ring.py)
        from .. import ops as _ops  # noqa: F401 (import cycle guard)
        from ..ops.cp_ring import ring_write_and_attend
        attn, kv_pages = ring_write_and_attend(
            q, k, v, kv_pages, metadata, mesh=mesh,
            sm_scale=spec.sm_scale, cp_axis="cp", tp_axis=tp_axis,
            sliding_window=spec.sliding_window, soft_cap=spec.soft_cap,
            k_scale=ks, v_scale=ks)
        attn_flat = attn.reshape(T, nq * hd)
        if pre_o is not None:
            attn_flat = pre_o(params, x, attn_flat)
        out = o_method.apply(params["o"], attn_flat)
        if lora_fn is not None:
            out = lora_fn("o", attn_flat, out)
        if collect_kv_stats:
            stat = jnp.maximum(
                jnp.max(jnp.abs(k.astype(jnp.float32))),
                jnp.max(jnp.abs(v.astype(jnp.float32))))
            return out, kv_pages, stat
        return out, kv_pages
    kv_pages = write_kv(kv_pages, k, v, metadata.slot_mapping,
                        k_scale=ks, v_scale=ks,
                        fp4_grid=spec.kv_fp4 and quant)
    attn = ragged_paged_attention(
        q, kv_pages, metadata, sm_scale=spec.sm_scale,
        sliding_window=spec.sliding_window, soft_cap=spec.soft_cap,
        alibi_slopes=spec.alibi_slopes,
        sinks=params["sinks"] if spec.use_sinks else None,
        k_scale=ks, v_scale=ks, backend=attn_backend,
        mesh=mesh, tp_axis=tp_axis,
        sparse_keep_pages=sparse_keep_pages, sparse_algo=sparse_algo,
        star_block_size=star_block_size)
    if mesh is not None and tp_axis is not None and \
            "cp" in ((tp_axis,) if isinstance(tp_axis, str) else tp_axis):
        # Ulysses boundary: attention output leaves head-sharded over
        # (cp x tp) and re-enters the sequence-sharded layout — trade
        # ONLY the cp share of the head axis for a cp share of the
        # token axis (heads stay tp-sharded for the row-parallel
        # o-projection). Making this reshard explicit on the 3-D
        # [T, nq, hd] tensor lets GSPMD emit the Ulysses all-to-all;
        # without it the flatten below mixes the sharded head axis into
        # hd and SPMD falls back to an "involuntary full
        # rematerialization" (replicate-then-split)
        # (reference: distributed/ops.py:1019 all_to_all_4d).
        from jax.sharding import NamedSharding, PartitionSpec
        axes_t = (tp_axis,) if isinstance(tp_axis, str) else tuple(tp_axis)
        head_rest = tuple(a for a in axes_t if a != "cp") or None
        attn = jax.lax.with_sharding_constraint(
            attn, NamedSharding(mesh,
                                PartitionSpec("cp", head_rest, None)))
    attn_flat = attn.reshape(T, nq * hd)
    if pre_o is not None:
        # output gate hook (Qwen3-Next gated attention: attn · σ(gate))
        attn_flat = pre_o(params, x, attn_flat)
    out = o_method.apply(params["o"], attn_flat)
    if lora_fn is not None:
        out = lora_fn("o", attn_flat, out)
    if collect_kv_stats:
        # KV-scale calibration: absmax of the fresh (pre-quant) K/V
        # projections (reference role: calibrated kv_scale_orig_quant,
        # attentionOp.cpp:919 — replaces the hardcoded per-tensor guess)
        stat = jnp.maximum(jnp.max(jnp.abs(k.astype(jnp.float32))),
                           jnp.max(jnp.abs(v.astype(jnp.float32))))
        return out, kv_pages, stat
    return out, kv_pages


class DecoderModelForCausalLM:
    """Base for decoder-only CausalLM models.

    Subclasses implement ``init_params``, ``load_hf_state_dict``, and
    ``forward``. ``forward`` signature (the jitted hot path):

        forward(params, token_ids[T], kv_pages[L, P, ps, 2kvh, hd],
                metadata) -> (logits[S, V], kv_pages)
    """
    architectures: tuple = ()

    def __init__(self, model_config: ModelConfig):
        self.config = model_config
        self.hf = model_config.hf_config
        self.dtype = model_config.dtype
        self.attn_backend = "auto"
        # set by the engine when running under a device mesh
        self.mesh = None

    def ring_cp_active(self) -> bool:
        """KV-page-sharded ring/helix CP (ops/cp_ring.py): on when the
        mapping asks for RING and a cp mesh axis exists."""
        from ..mapping import CpType
        m = self.config.mapping
        return (self.mesh is not None and m.cp_size > 1
                and m.cp_type in (CpType.RING, CpType.HELIX))

    def attn_shard_args(self):
        """(mesh, axes) for head-sharded attention under shard_map, or
        (None, None) when attention runs unsharded/replicated.

        With cp>1 (Ulysses context parallel, reference: CpType.ULYSSES
        mapping.py:25) heads shard over the combined ("cp", "tp") axes;
        the activation token axis is cp-sharded outside attention, so
        the boundary reshard is the Ulysses all-to-all."""
        m = self.config.mapping
        if self.mesh is None:
            return None, None
        axes = []
        from ..mapping import CpType
        if m.cp_size > 1 and m.cp_type == CpType.ULYSSES:
            # RING/HELIX CP shard KV pages, not heads (ops/cp_ring.py)
            axes.append("cp")
        if m.tp_size > 1:
            axes.append("tp")
        while axes:
            n = 1
            for a in axes:
                n *= m.cp_size if a == "cp" else m.tp_size
            if self.num_heads % n == 0 and (2 * self.num_kv_heads) % n == 0:
                return self.mesh, axes[0] if len(axes) == 1 else tuple(axes)
            # too few (kv) heads for the combined shard: drop cp first
            axes.pop(0)
        return None, None

    def token_pspec(self):
        """PartitionSpec for the activation token axis: sharded over
        "cp" under context parallelism (Ulysses sequence split),
        replicated otherwise. Models apply this as a
        with_sharding_constraint on hidden states so QKV/MLP FLOPs
        split across the cp group too."""
        from jax.sharding import PartitionSpec as P
        from ..mapping import CpType
        m = self.config.mapping
        if self.mesh is not None and m.cp_size > 1 \
                and m.cp_type == CpType.ULYSSES:
            return P("cp", None)
        return None

    # ---- geometry used by the engine to size KV pools ------------------
    @property
    def num_layers(self) -> int:
        return self.hf.num_hidden_layers

    @property
    def num_kv_heads(self) -> int:
        return getattr(self.hf, "num_key_value_heads", None) or \
            self.hf.num_attention_heads

    @property
    def head_dim(self) -> int:
        return getattr(self.hf, "head_dim", None) or \
            self.hf.hidden_size // self.hf.num_attention_heads

    @property
    def vocab_size(self) -> int:
        return self.hf.vocab_size

    def kv_pool_shape(self, num_pages: int, page_size: int) -> tuple:
        return (self.num_layers, num_pages, page_size,
                2 * self.num_kv_heads, self.head_dim)

    def make_kv_pages(self, num_pages: int, page_size: int) -> jax.Array:
        return jnp.zeros(self.kv_pool_shape(num_pages, page_size),
                         dtype=self.config.kv_cache_dtype)

    # ---- to be provided by subclasses ----------------------------------
    def init_params(self, rng: jax.Array) -> Dict[str, Any]:
        raise NotImplementedError

    def load_hf_state_dict(self, state_dict: Dict[str, np.ndarray]
                           ) -> Dict[str, Any]:
        raise NotImplementedError

    def forward(self, params, token_ids, kv_pages, metadata):
        raise NotImplementedError

    def param_pspecs(self, params) -> Any:
        """PartitionSpec tree for GSPMD sharding; default: replicate."""
        from jax.sharding import PartitionSpec as P
        return jax.tree.map(lambda _: P(), params)

    # ---- helpers for subclasses ----------------------------------------
    def _method(self, name: str) -> LinearMethod:
        return make_linear_method(self.config.quant_config, name)

    def _embed(self, params, token_ids: jax.Array,
               input_embeds: Optional[jax.Array] = None) -> jax.Array:
        """Token embedding lookup with optional per-token embedding
        override (multimodal / prompt-embeds path: rows of
        ``input_embeds`` that are non-NaN replace the lookup — the
        AutoDeploy flattened multimodal-embedding insertion,
        reference: tensorrt_llm/inputs/multimodal.py)."""
        h = params["embed"]["weight"][token_ids].astype(self.dtype)
        if input_embeds is not None:
            override = ~jnp.isnan(input_embeds[:, 0])
            h = jnp.where(override[:, None],
                          jnp.nan_to_num(input_embeds).astype(self.dtype), h)
        return h

    @staticmethod
    def _gather_logits(hidden: jax.Array, metadata: AttentionMetadata
                       ) -> jax.Array:
        return hidden[metadata.logits_indices]


def hf_transpose(w):
    """torch checkpoints store [out, in] -> engine wants [in, out].
    PrequantizedWeight (AWQ/GPTQ ingest) is already [in, out] and passes
    through untouched."""
    if not isinstance(w, np.ndarray) and hasattr(w, "weight_scale"):
        return w
    return np.ascontiguousarray(np.transpose(w))


def quantize_linear(method: LinearMethod, w: np.ndarray,
                    bias: Optional[np.ndarray] = None,
                    dtype=jnp.bfloat16,
                    smooth: Optional[np.ndarray] = None
                    ) -> Dict[str, jax.Array]:
    """Load-time conversion of one [K, N] weight through its method.

    Quantization runs on the host CPU backend so only the *quantized*
    bytes cross to the accelerator (an f32 staging upload would be 8x the
    int4 footprint — the role of the reference's host-side weight
    preprocessors, cutlass_preprocessors.cpp).

    A :class:`~..quantization.checkpoint.PrequantizedWeight` (AWQ/GPTQ/
    ModelOpt ingest) passes through untouched: the checkpoint's own
    integer weights, scales and zero points become the runtime params so
    the published quantization math is reproduced exactly."""
    from ..quantization.checkpoint import PrequantizedWeight
    if isinstance(w, PrequantizedWeight):
        params = {"weight": np.ascontiguousarray(w.weight),
                  "weight_scale": np.ascontiguousarray(w.weight_scale)}
        if w.weight_zero is not None:
            params["weight_zero"] = np.ascontiguousarray(w.weight_zero)
        elif w.bits == 4:
            # symmetric int4: repack for the fused Pallas dequant-matmul
            from ..ops.pallas.quant_matmul import pack_int4
            params["weight"] = np.asarray(pack_int4(jnp.asarray(w.weight)))
        if bias is not None:
            params["bias"] = np.asarray(bias, jnp.dtype(dtype))
        return params
    cpu = jax.local_devices(backend="cpu")[0]
    with jax.default_device(cpu):
        if smooth is not None:
            # SmoothQuant fold: columns scale by s, activations divide
            # by s at apply time — exact in fp, kinder to int8
            w = np.asarray(w) * np.asarray(smooth)[:, None]
        params = method.quantize_weights(jnp.asarray(w), dtype=dtype)
        if smooth is not None:
            params["smooth"] = jnp.asarray(smooth, jnp.float32)
        if bias is not None:
            params["bias"] = jnp.asarray(bias, dtype=dtype)
        params = jax.tree.map(lambda a: np.asarray(a), params)
    return params
