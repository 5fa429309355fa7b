"""Ring context parallelism: KV pages sharded over the cp axis.

Behavioral reference: CpType.RING (tensorrt_llm/mapping.py:25,
kernels/recoverFromRingAtten.h) and the decode-phase KV-shard HELIX CP
(kernels/helixKernels.cu, docs/source/features/helix.md). Both split
the KV cache across the cp group so a long context's KV exceeds one
device's HBM; GPU ring attention rotates KV blocks around NVLink while
accumulating online-softmax partials.

TPU-native realization: the ROTATION becomes a single exact
log-sum-exp merge over ICI. The paged KV pool is sharded by PAGE across
cp ranks; under ``shard_map`` every rank

  1. scatters the fresh K/V of tokens whose slots it owns into its
     local page block (ownership-masked write),
  2. computes partial attention (numerator, denominator, running max)
     for ALL query rows over ONLY its local pages,
  3. merges partials exactly: ``pmax`` of the row maxima, rescale,
     ``psum`` of numerators/denominators.

This is mathematically identical to single-device softmax attention
(the associativity flash-attention relies on), so RING generates
byte-identical tokens to cp=1 while each rank stores 1/cp of the KV.
Heads may additionally shard over tp (composes: psum only over cp).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map

from .attention import AttentionMetadata, write_kv


def _partial_attention(q, kv_local, metadata, *, page_base: int,
                       pages_local: int, sm_scale: float,
                       sliding_window: Optional[int],
                       soft_cap: Optional[float],
                       k_scale, v_scale):
    """Local-page attention partials: (numerator [T, qh, hd] f32,
    denominator [T, qh] f32, rowmax [T, qh] f32). Mirrors the math of
    attention._reference_attention with an extra owned-page mask."""
    T = q.shape[0]
    num_q_heads, head_dim = q.shape[1], q.shape[2]
    ps = kv_local.shape[1]
    combined = kv_local.shape[2]
    num_kv_heads = combined // 2
    S, Pg = metadata.page_indices.shape
    max_kv = Pg * ps

    tok_idx = jnp.arange(T, dtype=jnp.int32)
    seq_of_tok = jnp.searchsorted(metadata.cu_q_lens[1:S + 1], tok_idx,
                                  side="right").astype(jnp.int32)
    seq_of_tok = jnp.minimum(seq_of_tok, S - 1)
    q_start = metadata.cu_q_lens[seq_of_tok]
    q_lens = metadata.cu_q_lens[1:S + 1] - metadata.cu_q_lens[:S]
    tok_kv_pos = metadata.kv_lens[seq_of_tok] - q_lens[seq_of_tok] + \
        (tok_idx - q_start)

    pages_g = metadata.page_indices                      # [S, Pg] global
    owned = (pages_g >= page_base) & (pages_g < page_base + pages_local)
    local_idx = jnp.where(owned, pages_g - page_base, 0)
    pages = kv_local[local_idx.reshape(-1)]
    pages = pages.reshape(S, max_kv, combined, head_dim)
    k = pages[:, :, 0::2, :]
    v = pages[:, :, 1::2, :]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale
        v = v.astype(jnp.float32) * v_scale
    k = k.astype(q.dtype)
    v = v.astype(q.dtype)

    k_tok = k[seq_of_tok]
    v_tok = v[seq_of_tok]
    group = num_q_heads // num_kv_heads
    qg = q.reshape(T, num_kv_heads, group, head_dim)
    scores = jnp.einsum("tkgd,tskd->tkgs", qg.astype(jnp.float32),
                        k_tok.astype(jnp.float32)) * sm_scale
    if soft_cap is not None:
        scores = soft_cap * jnp.tanh(scores / soft_cap)
    kv_pos = jnp.arange(max_kv, dtype=jnp.int32)
    in_len = kv_pos[None, :] < metadata.kv_lens[seq_of_tok][:, None]
    valid = (kv_pos[None, :] <= tok_kv_pos[:, None]) & in_len
    if sliding_window is not None:
        valid &= kv_pos[None, :] > (tok_kv_pos[:, None] - sliding_window)
    page_ok = jnp.repeat(owned, ps, axis=1)              # [S, max_kv]
    valid &= page_ok[seq_of_tok]
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(valid[:, None, None, :], scores, neg)

    mx = jnp.max(scores, axis=-1)                        # [T, kvh, g]
    # shards owning nothing for a row keep mx at neg; exp underflows to 0
    e = jnp.exp(scores - mx[..., None])
    e = jnp.where(valid[:, None, None, :], e, 0.0)
    den = jnp.sum(e, axis=-1)                            # [T, kvh, g]
    num = jnp.einsum("tkgs,tskd->tkgd", e,
                     v_tok.astype(jnp.float32))          # [T, kvh, g, d]
    qh = num_q_heads
    return (num.reshape(T, qh, head_dim), den.reshape(T, qh),
            mx.reshape(T, qh))


def ring_write_and_attend(q, k, v, kv_pages, metadata, *, mesh,
                          sm_scale: float, cp_axis: str = "cp",
                          tp_axis: Optional[str] = None,
                          sliding_window: Optional[int] = None,
                          soft_cap: Optional[float] = None,
                          k_scale=None, v_scale=None):
    """Fused ownership-masked KV write + KV-sharded attention + exact
    LSE combine over ``cp_axis``. Returns (attn [T, qh, hd], kv_pages).
    """
    R = mesh.shape[cp_axis]
    num_pages = kv_pages.shape[0]
    if num_pages % R != 0:
        raise ValueError(f"ring CP needs pages ({num_pages}) divisible "
                         f"by cp ({R})")
    Ploc = num_pages // R
    ps = kv_pages.shape[1]

    def local(q_l, k_l, v_l, kv_l):
        r = jax.lax.axis_index(cp_axis)
        base_slot = r * Ploc * ps
        own = (metadata.slot_mapping >= base_slot) & \
            (metadata.slot_mapping < base_slot + Ploc * ps)
        sm = jnp.where(own, metadata.slot_mapping - base_slot,
                       Ploc * ps)                       # oob -> dropped
        kv_l = write_kv(kv_l, k_l, v_l, sm, k_scale=k_scale,
                        v_scale=v_scale)
        num, den, mx = _partial_attention(
            q_l, kv_l, metadata, page_base=r * Ploc, pages_local=Ploc,
            sm_scale=sm_scale, sliding_window=sliding_window,
            soft_cap=soft_cap, k_scale=k_scale, v_scale=v_scale)
        gmx = jax.lax.pmax(mx, cp_axis)
        scale = jnp.exp(mx - gmx)
        num = jax.lax.psum(num * scale[..., None], cp_axis)
        den = jax.lax.psum(den * scale, cp_axis)
        out = num / jnp.maximum(den, 1e-30)[..., None]
        return out.astype(q_l.dtype), kv_l

    tspec = P(None, tp_axis, None) if tp_axis else P(None, None, None)
    kvspec = P(cp_axis, None, tp_axis, None) if tp_axis \
        else P(cp_axis, None, None, None)
    return _shard_map(
        local, mesh=mesh,
        in_specs=(tspec, tspec, tspec, kvspec),
        out_specs=(tspec, kvspec))(q, k, v, kv_pages)
