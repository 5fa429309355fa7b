"""Unified paged attention op for mixed prefill + decode.

TPU-native analog of the reference's single fused attention op
(reference: cpp/tensorrt_llm/thop/attentionOp.cpp:919 — one op serving
context FMHA + paged decode XQA, with KV-append, KV-quant, RoPE and
sliding window folded in; python dispatch
tensorrt_llm/_torch/attention_backend/trtllm.py:1071,1629).

Design: all scheduled sequences' new tokens are flattened into one ragged
token axis (the AutoDeploy "flattened sequence interface",
reference: _torch/auto_deploy/custom_ops/attention/). Each forward step:

  1. scatter this step's K/V into the paged pools at ``slot_mapping``
     (k at even combined-head indices, v at odd — the layout of
     jax.experimental ragged_paged_attention);
  2. run ragged paged attention over (kv_lens, page_indices, cu_q_lens).

Backends:
  * ``rpa``       — jax.experimental.pallas.ops.tpu.ragged_paged_attention
                    (TPU; tuned Pallas kernel, mixed prefill+decode).
  * ``reference`` — pure-jnp gather implementation with identical
                    semantics; runs anywhere (CPU tests), O(max_kv) dense.

Both support GQA/MQA, sliding windows, logit soft-cap, and quantized KV
pools via k_scale/v_scale (int8/fp8 pools).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp

_RPA_AVAILABLE = True
try:
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention as _rpa_kernel)
except Exception:  # pragma: no cover
    _RPA_AVAILABLE = False

# Trace-time split point for MIXED decode+prefill calls: the library
# RPA kernel faults (TPU INTERNAL) on the mixed layout the mixed window
# emits at batch >= 64 rows (bisect: tools/mixed_window_probe.py —
# plain decode windows, standalone mixed calls and small batches are
# fine; explicit block sizes do not cure it). Splitting the call into a
# DECODE-ONLY kernel call (first `sb` rows, one q token each) and a
# PREFILL-ONLY call (the context rows) keeps the library kernel in its
# two individually-proven regimes; the KV pool was already written for
# all tokens, so the two calls read a consistent pool.
_MIXED_SPLIT = None

# Trace-time hint: decode-only window calls tile the library RPA kernel
# at (num_kv_pages_per_block=8, num_queries_per_block=8) — measured
# 17.6 -> 12.9 ms/step at bench geometry (tools/step_anatomy.py round
# 5; the default auto-tiling over-blocks queries for 1-token rows).
# Prefill/mixed calls keep the library defaults.
_DECODE_BLOCKS = None


def rpa_decode_blocks(kpb: int = 8, qpb: int = 4):
    """Context manager: RPA calls traced inside use decode-tuned block
    sizes (the engine wraps its decode-window forwards with this)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        global _DECODE_BLOCKS
        old = _DECODE_BLOCKS
        _DECODE_BLOCKS = (kpb, qpb)
        try:
            yield
        finally:
            _DECODE_BLOCKS = old
    return cm()


def rpa_mixed_split(sb: int):
    """Context manager: attention calls traced inside split at row
    ``sb`` (gen rows first, ctx rows after — the mixed window layout;
    see docs/bench_notes.md round 4)."""
    import contextlib

    @contextlib.contextmanager
    def cm():
        global _MIXED_SPLIT
        old = _MIXED_SPLIT
        _MIXED_SPLIT = sb
        try:
            yield
        finally:
            _MIXED_SPLIT = old
    return cm()


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class AttentionMetadata:
    """Per-iteration ragged-batch metadata (device arrays).

    The analog of the reference ``TrtllmAttentionMetadata``
    (attention_backend/trtllm.py:80) prepared host-side once per iteration
    and shared by every layer.

    Shapes (S = padded max sequences, T = padded token bucket,
    P = pages per sequence):
      kv_lens:       i32[S]  total KV length per seq incl. this step's tokens
      page_indices:  i32[S, P]
      cu_q_lens:     i32[S+1] cumulative new-token counts
      num_seqs:      i32[1]
      slot_mapping:  i32[T]  flat kv-pool slot (page*page_size+offset) per
                     new token; out-of-range for padding (drops writes)
      positions:     i32[T]  absolute position of each new token
      logits_indices:i32[S]  index into the token axis of each sequence's
                     last token (where logits are needed)
    """
    kv_lens: jax.Array
    page_indices: jax.Array
    cu_q_lens: jax.Array
    num_seqs: jax.Array
    slot_mapping: jax.Array
    positions: jax.Array
    logits_indices: jax.Array
    # sequence slot per batch row (recurrent-state models index their
    # SSM/conv caches by slot; -1 = padding row). Optional for attention.
    seq_slots: Optional[jax.Array] = None
    # M-RoPE (qwen2-vl): 3-axis rope positions i32[3, T]
    # (temporal/height/width); None for 1-D rope models
    positions_mrope: Optional[jax.Array] = None
    # bidirectional image spans (gemma3/paligemma): per-NEW-token image
    # group id (-1 = text) and the persistent per-kv-slot group pool the
    # model scatters alongside KV writes. Same-group q/kv pairs attend
    # bidirectionally (HF token_type_ids or-mask semantics).
    mm_groups_q: Optional[jax.Array] = None       # i32[T]
    mm_group_pool: Optional[jax.Array] = None     # i32[pages*page_size]
    # tree speculation (greedy verify): per-NEW-token ancestry bitmask
    # over the up-to-31 draft-node kv slots of its sequence, and the
    # per-seq draft-node count. In the tree region the bitmask REPLACES
    # the positional causal rule (a node attends its ancestors + itself).
    tree_masks: Optional[jax.Array] = None        # i32[T]
    tree_lens: Optional[jax.Array] = None         # i32[S]
    # VSWA (per-window KV pools, reference: resource_manager.py:1878):
    # sliding-window layers address their own smaller pool through these
    # tables; None for single-pool models.
    page_indices_sw: Optional[jax.Array] = None
    slot_mapping_sw: Optional[jax.Array] = None

    def for_sliding_pool(self) -> "AttentionMetadata":
        """View of this metadata addressed at the sliding pool."""
        import dataclasses as _dc
        return _dc.replace(self, page_indices=self.page_indices_sw,
                           slot_mapping=self.slot_mapping_sw,
                           page_indices_sw=None, slot_mapping_sw=None)



def layer_metadata(metadata: "AttentionMetadata", layer_idx,
                   pages_per_layer: int, page_size: int,
                   num_layers: int) -> "AttentionMetadata":
    """Metadata view addressing layer ``layer_idx`` of a flat all-layers
    pool ``[(L*P), ps, c, hd]`` (pool-as-carry threading).

    The round-5 KV-write redesign: models keep ONE flat pool in the
    layer-scan *carry* and address layer l's pages at ``l*P + i``, so
    each layer's KV-append scatter updates the carry in place. The old
    per-layer xs/ys threading re-stacked the full pool through scan ys
    every step — a full-pool copy measured at 36 ms/step at bench
    geometry, half the step time (tools/pool_carry_probe.py: 38.9 →
    3.7 ms/step). Padding slots (engine-encoded as >= P*ps) map to the
    flat pool's global OOB so dropped writes stay dropped.
    """
    import dataclasses as _dc
    per = pages_per_layer * page_size
    sm = jnp.where(metadata.slot_mapping >= per, num_layers * per,
                   metadata.slot_mapping + layer_idx * per)
    return _dc.replace(
        metadata,
        page_indices=metadata.page_indices + layer_idx * pages_per_layer,
        slot_mapping=sm)


def write_kv(kv_pages: jax.Array, k: jax.Array, v: jax.Array,
             slot_mapping: jax.Array,
             k_scale: Optional[float] = None,
             v_scale: Optional[float] = None,
             fp4_grid: bool = False) -> jax.Array:
    """Scatter new K/V into the paged pool.

    kv_pages: [num_pages, page_size, 2*kv_heads, head_dim] (cache dtype)
    k, v:     [T, kv_heads, head_dim] (compute dtype)
    slot_mapping: i32[T] flat slots; slots >= num_pages*page_size are dropped
    (used for padding — `mode="drop"` makes scatter ignore them).

    Equivalent role: KV-append half of the reference attention op
    (cpp/tensorrt_llm/kernels/unfusedAttentionKernels — KV append + quant).
    """
    num_pages, page_size, combined, head_dim = kv_pages.shape
    cache_dtype = kv_pages.dtype
    if k_scale is not None:
        k = (k.astype(jnp.float32) / k_scale)
        v = (v.astype(jnp.float32) / v_scale)
        if cache_dtype == jnp.int8:
            k = jnp.clip(jnp.round(k), -128, 127)
            v = jnp.clip(jnp.round(v), -128, 127)
        elif fp4_grid:
            # NVFP4 KV (mode.py NVFP4_KV_CACHE): values round to the
            # e2m1 grid so accuracy exactly matches a true fp4 pool;
            # every grid value is exactly representable in the e4m3
            # storage (ops/quant.fp4_round)
            from .quant import fp4_round
            k = fp4_round(k)
            v = fp4_round(v)
    kv = jnp.stack([k, v], axis=2)  # [T, kv_heads, 2, head_dim]
    kv = kv.reshape(k.shape[0], combined, head_dim).astype(cache_dtype)
    flat = kv_pages.reshape(num_pages * page_size, combined, head_dim)
    flat = flat.at[slot_mapping].set(kv, mode="drop")
    return flat.reshape(kv_pages.shape)


def ragged_paged_attention(
        q: jax.Array,                    # [T, q_heads, head_dim]
        kv_pages: jax.Array,             # [pages, page_size, 2*kv_heads, hd]
        metadata: AttentionMetadata,
        *,
        sm_scale: float,
        sliding_window: Optional[int] = None,
        soft_cap: Optional[float] = None,
        alibi_slopes: Optional[tuple] = None,
        sinks: Optional[jax.Array] = None,
        k_scale: Optional[float] = None,
        v_scale: Optional[float] = None,
        backend: str = "auto",
        mesh=None,
        tp_axis: Optional[str] = None,
        sparse_keep_pages: Optional[int] = None,
        sparse_algo: str = "ROCKET_TOPK",
        star_block_size: Optional[int] = None) -> jax.Array:
    """Mixed prefill/decode attention over the paged KV pool.

    With ``mesh``/``tp_axis`` set, the op runs under ``shard_map`` over
    the head dimension: attention is embarrassingly parallel across kv
    heads, and GSPMD cannot partition a pallas_call on its own (the role
    of the reference's per-rank attention with NCCL around it — here each
    device runs the kernel on its local head shard, no collectives).

    ``tp_axis`` may be one mesh axis name or a tuple of axes. The tuple
    form is Ulysses context parallelism (reference: CpType.ULYSSES,
    _torch/modules/attention.py:1276, distributed/ops.py:1019): outside
    this op activations are token-sharded over "cp"; entering with heads
    sharded over ("cp", "tp") makes GSPMD insert the Ulysses
    all-to-all (token-shard -> head-shard) at the boundary, and the
    inverse one on the way out."""
    # Mixed-window calls: the library RPA kernel faults (TPU INTERNAL)
    # on the combined decode+prefill layout at >= 64 rows (whole-call,
    # RPA+RPA splits and explicit block sizes all bisected —
    # docs/bench_notes.md round 4). Split instead into the DECODE half
    # on the fast library kernel (the exact layout plain windows run
    # all day) and the CONTEXT half on the dense XLA reference path —
    # cheap at rider scale (~NC+1 seqs x <=max_seq context) and
    # unconditionally stable.
    global _MIXED_SPLIT
    if (_MIXED_SPLIT is not None
            and metadata.tree_masks is None
            and metadata.mm_groups_q is None and sinks is None
            and alibi_slopes is None):
        import dataclasses as _dc
        sb = _MIXED_SPLIT
        _MIXED_SPLIT = None
        try:
            md_gen = _dc.replace(
                metadata,
                kv_lens=metadata.kv_lens[:sb],
                page_indices=metadata.page_indices[:sb],
                cu_q_lens=jnp.arange(sb + 1, dtype=jnp.int32),
                num_seqs=jnp.full((1,), sb, jnp.int32),
                slot_mapping=metadata.slot_mapping[:sb],
                positions=metadata.positions[:sb],
                seq_slots=None)
            out_gen = ragged_paged_attention(
                q[:sb], kv_pages, md_gen, sm_scale=sm_scale,
                sliding_window=sliding_window, soft_cap=soft_cap,
                k_scale=k_scale, v_scale=v_scale, backend=backend,
                mesh=mesh, tp_axis=tp_axis)
            md_ctx = _dc.replace(
                metadata,
                kv_lens=metadata.kv_lens[sb:],
                page_indices=metadata.page_indices[sb:],
                cu_q_lens=metadata.cu_q_lens[sb:] - sb,
                num_seqs=metadata.num_seqs - sb,
                slot_mapping=metadata.slot_mapping[sb:],
                positions=metadata.positions[sb:],
                logits_indices=jnp.zeros((1,), jnp.int32),
                seq_slots=None)
            out_ctx = _reference_attention(
                q[sb:], kv_pages, md_ctx, sm_scale=sm_scale,
                sliding_window=sliding_window, soft_cap=soft_cap,
                alibi_slopes=None, sinks=None,
                k_scale=k_scale, v_scale=v_scale)
        finally:
            _MIXED_SPLIT = sb
        return jnp.concatenate([out_gen, out_ctx], axis=0)

    if mesh is not None and tp_axis is not None:
        axes = (tp_axis,) if isinstance(tp_axis, str) else tuple(tp_axis)
        size = 1
        for a in axes:
            size *= mesh.shape.get(a, 1)
        if size > 1:
            from jax.sharding import PartitionSpec as P
            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            def local_attn(q_l, kv_l):
                local_slopes = alibi_slopes
                if alibi_slopes is not None:
                    # slice this shard's q-head slopes
                    nloc = q_l.shape[1]
                    idx = 0
                    for a in axes:
                        idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
                    arr = jax.lax.dynamic_slice(
                        jnp.asarray(alibi_slopes, jnp.float32),
                        (idx * nloc,), (nloc,))
                    local_slopes = arr
                local_sinks = sinks
                if sinks is not None:
                    nloc = q_l.shape[1]
                    idx = 0
                    for a in axes:
                        idx = idx * mesh.shape[a] + jax.lax.axis_index(a)
                    local_sinks = jax.lax.dynamic_slice(
                        sinks.astype(jnp.float32), (idx * nloc,), (nloc,))
                return ragged_paged_attention(
                    q_l, kv_l, metadata, sm_scale=sm_scale,
                    sliding_window=sliding_window, soft_cap=soft_cap,
                    alibi_slopes=local_slopes, sinks=local_sinks,
                    k_scale=k_scale, v_scale=v_scale, backend=backend,
                    sparse_keep_pages=sparse_keep_pages,
                    sparse_algo=sparse_algo)

            return shard_map(
                local_attn, mesh=mesh,
                in_specs=(P(None, axes, None),
                          P(None, None, axes, None)),
                out_specs=P(None, axes, None))(q, kv_pages)

    if (sparse_keep_pages is not None
            and q.shape[0] == metadata.kv_lens.shape[0]
            and metadata.tree_masks is None
            and metadata.mm_groups_q is None
            and alibi_slopes is None and sinks is None
            and sliding_window is None):
        # top-k page-sparse decode (ops/sparse_attention.py; reference:
        # attention_backend/sparse/ RocketKV + DSA indexer). Applies only
        # to decode-shaped batches (one query per sequence) — verified
        # dynamically so prefill chunks of coincident size stay dense.
        from .sparse_attention import sparse_paged_decode_attention
        S = metadata.kv_lens.shape[0]
        n = metadata.num_seqs[0]
        decode_only = metadata.cu_q_lens[jnp.minimum(n, S)] == n

        def sparse_path(_):
            return sparse_paged_decode_attention(
                q, kv_pages, metadata, sm_scale=sm_scale,
                keep_pages=sparse_keep_pages, algo=sparse_algo,
                soft_cap=soft_cap, k_scale=k_scale, v_scale=v_scale)

        def dense_path(_):
            return ragged_paged_attention(
                q, kv_pages, metadata, sm_scale=sm_scale,
                soft_cap=soft_cap, k_scale=k_scale, v_scale=v_scale,
                backend=backend, mesh=mesh, tp_axis=tp_axis)

        return jax.lax.cond(decode_only, sparse_path, dense_path, None)

    if star_block_size is not None:
        return _reference_attention(
            q, kv_pages, metadata, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            alibi_slopes=alibi_slopes, sinks=sinks,
            k_scale=k_scale, v_scale=v_scale,
            star_block_size=star_block_size)

    if metadata.tree_masks is not None:
        # tree-draft ancestry mask: reference path only
        return _reference_attention(
            q, kv_pages, metadata, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            alibi_slopes=alibi_slopes, sinks=sinks)
    if metadata.mm_group_pool is not None and \
            metadata.mm_groups_q is not None:
        # bidirectional image-span mask: reference path only (kernels
        # learn the or-mask later)
        return _reference_attention(
            q, kv_pages, metadata, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            alibi_slopes=alibi_slopes, sinks=sinks)
    if alibi_slopes is not None and not isinstance(alibi_slopes, tuple):
        # shard_map slices hand slopes in as a traced array; the Pallas
        # kernels need a static tuple — fall back to the XLA path there
        return _reference_attention(
            q, kv_pages, metadata, sm_scale=sm_scale,
            sliding_window=sliding_window, soft_cap=soft_cap,
            k_scale=k_scale, v_scale=v_scale,
            alibi_slopes=alibi_slopes)
    if backend == "auto":
        # the library RPA kernel requires lane-aligned head_dim (128);
        # other geometries use the in-repo decode kernel for decode-only
        # batches and the XLA reference path for prefill
        on_tpu = jax.default_backend() == "tpu"
        if (on_tpu and q.shape[-1] % 128 == 0 and _RPA_AVAILABLE
                and alibi_slopes is None
                and sinks is None):   # library kernel: no alibi/sinks
            backend = "rpa"
        elif on_tpu:
            backend = "hybrid_decode"
        else:
            backend = "reference"
    if backend == "hybrid_decode":
        from .pallas.decode_attention import paged_decode_attention
        S = metadata.kv_lens.shape[0]
        T = q.shape[0]
        n = metadata.num_seqs[0]
        decode_only = metadata.cu_q_lens[jnp.minimum(n, S)] == n

        def decode_path(_):
            m = min(S, T)
            q_s = jnp.zeros((S,) + q.shape[1:], q.dtype).at[:m].set(q[:m])
            out_s = paged_decode_attention(
                q_s, kv_pages, metadata.kv_lens, metadata.page_indices,
                sm_scale=sm_scale, sliding_window=sliding_window,
                soft_cap=soft_cap, alibi_slopes=alibi_slopes,
                sinks=sinks, k_scale=k_scale, v_scale=v_scale)
            return jnp.zeros_like(q).at[:m].set(out_s[:m].astype(q.dtype))

        def prefill_path(_):
            # in-repo ragged prefill kernel (hd % 64 geometries); falls
            # back to the dense path only when a query segment exceeds
            # the kernel's VMEM slab
            from .pallas.prefill_attention import ragged_prefill_attention
            maxq = min(T, 256)    # VMEM slab bound (~9MB at qh32·hd64)
            q_lens = metadata.cu_q_lens[1:S + 1] - metadata.cu_q_lens[:S]
            fits = jnp.max(q_lens) <= maxq

            def kernel_path(_):
                return ragged_prefill_attention(
                    q, kv_pages, metadata.kv_lens, metadata.page_indices,
                    metadata.cu_q_lens, sm_scale=sm_scale,
                    sliding_window=sliding_window, soft_cap=soft_cap,
                    alibi_slopes=alibi_slopes, sinks=sinks,
                    k_scale=k_scale, v_scale=v_scale, max_q_len=maxq)

            def dense_path(_):
                return _reference_attention(
                    q, kv_pages, metadata, sm_scale=sm_scale,
                    sliding_window=sliding_window, soft_cap=soft_cap,
                    alibi_slopes=alibi_slopes, sinks=sinks,
                    k_scale=k_scale, v_scale=v_scale)

            if (2 * q.shape[-1]) % 128 != 0:   # kernel can't serve hd
                return dense_path(None)
            return jax.lax.cond(fits, kernel_path, dense_path, None)

        return jax.lax.cond(decode_only, decode_path, prefill_path, None)
    if backend == "rpa":
        import os as _os
        extra = {}
        if _DECODE_BLOCKS is not None:
            extra["num_kv_pages_per_block"] = _DECODE_BLOCKS[0]
            extra["num_queries_per_block"] = _DECODE_BLOCKS[1]
        kpb = _os.environ.get("TLLM_TPU_RPA_KV_PAGES_PER_BLOCK")
        qpb = _os.environ.get("TLLM_TPU_RPA_Q_PER_BLOCK")
        if kpb:
            extra["num_kv_pages_per_block"] = int(kpb)
        if qpb:
            extra["num_queries_per_block"] = int(qpb)
        return _rpa_kernel(
            q, kv_pages, metadata.kv_lens, metadata.page_indices,
            metadata.cu_q_lens, metadata.num_seqs,
            sm_scale=sm_scale, sliding_window=sliding_window,
            soft_cap=soft_cap, k_scale=k_scale, v_scale=v_scale,
            **extra)
    return _reference_attention(
        q, kv_pages, metadata, sm_scale=sm_scale,
        sliding_window=sliding_window, soft_cap=soft_cap,
        alibi_slopes=alibi_slopes, sinks=sinks,
        k_scale=k_scale, v_scale=v_scale)


def _reference_attention(q, kv_pages, metadata, *, sm_scale,
                         sliding_window, soft_cap, k_scale, v_scale,
                         alibi_slopes=None, sinks=None,
                         star_block_size=None):
    """Dense gather-based paged attention, vectorized over sequences.

    Semantics match ref_ragged_paged_attention (jax.experimental RPA
    kernel.py:74-149) but avoid the python per-seq loop so it stays
    jittable with the padded static shapes: computes a [S, Tq_max] layout
    by scattering tokens per sequence, then gathers back.
    """
    T, num_q_heads, head_dim = q.shape
    num_pages, page_size, combined, _ = kv_pages.shape
    num_kv_heads = combined // 2
    S, P = metadata.page_indices.shape
    max_kv = P * page_size

    # token -> sequence index map from cu_q_lens
    tok_idx = jnp.arange(T, dtype=jnp.int32)
    seq_of_tok = jnp.searchsorted(metadata.cu_q_lens[1:S + 1], tok_idx,
                                  side="right").astype(jnp.int32)
    seq_of_tok = jnp.minimum(seq_of_tok, S - 1)
    q_start = metadata.cu_q_lens[seq_of_tok]
    q_lens = metadata.cu_q_lens[1:S + 1] - metadata.cu_q_lens[:S]
    # absolute kv position of each new token within its sequence
    tok_kv_pos = metadata.kv_lens[seq_of_tok] - q_lens[seq_of_tok] + \
        (tok_idx - q_start)

    # gather full K/V per sequence: [S, max_kv, kv_heads, head_dim]
    pages = kv_pages[metadata.page_indices.reshape(-1)]
    pages = pages.reshape(S, P, page_size, combined, head_dim)
    pages = pages.reshape(S, max_kv, combined, head_dim)
    k = pages[:, :, 0::2, :]
    v = pages[:, :, 1::2, :]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale
        v = v.astype(jnp.float32) * v_scale
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)

    # scores: [T, q_heads, max_kv]
    k_tok = k[seq_of_tok]      # [T, max_kv, kv_heads, hd]
    v_tok = v[seq_of_tok]
    group = num_q_heads // num_kv_heads
    qg = q.reshape(T, num_kv_heads, group, head_dim)
    scores = jnp.einsum("tkgd,tskd->tkgs", qg.astype(jnp.float32),
                        k_tok.astype(jnp.float32)) * sm_scale
    if alibi_slopes is not None:
        slopes = jnp.asarray(alibi_slopes, jnp.float32) \
            .reshape(num_kv_heads, group)
        kv_pos_b = jnp.arange(max_kv, dtype=jnp.int32)
        # bias = slope * (kv_pos - q_pos)  (≤ 0 for the causal past)
        dist = (kv_pos_b[None, :] -
                tok_kv_pos[:, None]).astype(jnp.float32)
        scores = scores + slopes[None, :, :, None] * dist[:, None, None, :]
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)
    kv_pos = jnp.arange(max_kv, dtype=jnp.int32)
    in_len = kv_pos[None, :] < metadata.kv_lens[seq_of_tok][:, None]
    valid = (kv_pos[None, :] <= tok_kv_pos[:, None]) & in_len
    if sliding_window is not None:
        valid &= kv_pos[None, :] > (tok_kv_pos[:, None] - sliding_window)
    if star_block_size is not None:
        # star attention (reference: attention_backend/star_flashinfer.py,
        # the Star Attention scheme): context-phase tokens attend the
        # ANCHOR block (block 0) plus their OWN block only; query-phase
        # rows (decode: one q per seq) attend globally. Contexts within
        # two blocks are exact by construction.
        q_blk = tok_kv_pos[:, None] // star_block_size
        kv_blk = kv_pos[None, :] // star_block_size
        local = (kv_blk == 0) | (kv_blk == q_blk)
        is_decode_row = (q_lens[seq_of_tok] == 1)[:, None]
        valid &= local | is_decode_row
    if metadata.mm_group_pool is not None and \
            metadata.mm_groups_q is not None:
        # same-image q/kv pairs attend bidirectionally, overriding the
        # causal and window constraints (never the length bound)
        pool2d = metadata.mm_group_pool.reshape(-1, page_size)
        # the mm pool is layer-independent: under the flat all-layers
        # pool (layer_metadata offsets page_indices by l*P) the modulo
        # folds every layer's view back onto the single group pool
        kv_groups = pool2d[metadata.page_indices.reshape(-1)
                           % pool2d.shape[0]] \
            .reshape(S, max_kv)
        gq = metadata.mm_groups_q
        bidir = (gq[:, None] >= 0) & \
            (gq[:, None] == kv_groups[seq_of_tok])
        valid |= bidir & in_len
    if metadata.tree_masks is not None and metadata.tree_lens is not None:
        # draft-node region [kv_len - tree_len, kv_len): ancestry bitmask
        # replaces the positional rule entirely
        tl = metadata.tree_lens[seq_of_tok]            # [T]
        base = metadata.kv_lens[seq_of_tok] - tl
        node = kv_pos[None, :] - base[:, None]
        in_tree = (node >= 0) & (node < tl[:, None]) & (tl[:, None] > 0)
        bit = ((metadata.tree_masks[:, None]
                >> jnp.clip(node, 0, 31)) & 1) == 1
        valid = jnp.where(in_tree, bit & in_len, valid)
    mask = valid[:, None, None, :]
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(mask, scores, neg)
    if sinks is not None:
        # per-q-head sink logit joins the softmax then is dropped
        # (reference: gpt-oss attention; HF eager_attention_forward)
        sk = jnp.asarray(sinks, jnp.float32).reshape(num_kv_heads, group)
        m = jnp.maximum(jnp.max(scores, axis=-1), sk[None, :, :])
        e = jnp.exp(scores - m[..., None])
        denom = jnp.sum(e, axis=-1) + jnp.exp(sk[None, :, :] - m)
        probs = e / denom[..., None]
    else:
        probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("tkgs,tskd->tkgd", probs, v_tok.astype(jnp.float32))
    return out.reshape(T, num_q_heads, head_dim).astype(q.dtype)
