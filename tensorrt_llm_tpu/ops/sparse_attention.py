"""Sparse long-context decode attention: top-k page selection.

Behavioral reference: the reference's sparse attention stack
(tensorrt_llm/_torch/attention_backend/sparse/ — RocketKV top-k block
selection, the DSA indexer's lightweight relevance scoring,
llm_args.py:253-477 sparse configs). All share one idea: for long
contexts, a cheap INDEX over KV blocks picks the few blocks worth
attending, so decode reads O(k) pages instead of O(context).

TPU-native form (static shapes, gather-friendly):

  * the indexer scores each of a sequence's pages with the query
    against the page's MEAN KEY (RocketKV/SnapKV-style pooled-key
    proxy; one dot per page per kv head instead of page_size);
  * ``jax.lax.top_k`` keeps ``keep_pages`` page ordinals per sequence —
    always force-including page 0 (attention-sink pages) and the
    current tail page (local window), the standard recipe;
  * attention runs the exact softmax over ONLY the selected pages'
    entries, with positions reconstructed from the selected ordinals
    (page ordinal * page_size + offset), so causal masking is exact.

With ``keep_pages >= pages_used`` the result equals dense attention
bit-for-bit (the selection becomes the identity); smaller budgets trade
recall for an O(context/keep) cut in KV reads.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .attention import AttentionMetadata


def page_mean_keys(kv_pages: jax.Array, kv_lens: jax.Array,
                   page_indices: jax.Array, page_size: int) -> jax.Array:
    """Mean key per (sequence, page ordinal): f32[S, P, kvh, hd].
    Positions past kv_len contribute zero (partial tail pages average
    over their filled prefix only)."""
    S, P = page_indices.shape
    combined = kv_pages.shape[2]
    hd = kv_pages.shape[3]
    pages = kv_pages[page_indices.reshape(-1)]          # [S*P, ps, c, hd]
    k = pages[:, :, 0::2, :].astype(jnp.float32)        # [S*P, ps, kvh, hd]
    k = k.reshape(S, P, page_size, combined // 2, hd)
    pos = (jnp.arange(P, dtype=jnp.int32)[None, :, None] * page_size
           + jnp.arange(page_size, dtype=jnp.int32)[None, None, :])
    fill = (pos < kv_lens[:, None, None]).astype(jnp.float32)
    n = jnp.maximum(fill.sum(axis=2), 1.0)              # [S, P]
    return (k * fill[..., None, None]).sum(axis=2) / n[..., None, None]


def dsa_page_scores(q: jax.Array, kv_pages: jax.Array,
                    kv_lens: jax.Array, page_indices: jax.Array,
                    page_size: int, *, stride: int = 2, rank: int = 32,
                    proj: Optional[jax.Array] = None) -> jax.Array:
    """DSA-style LIGHTWEIGHT indexer (reference:
    _torch/attention_backend/sparse/dsa.py Indexer — per-token
    relevance logits from a compact low-rank index, topk selection).

    TPU-native form: head-0 keys at STRIDED positions, projected to
    ``rank`` dims by a fixed (or checkpoint-provided, learned)
    projection — the index read is kvh*stride*(hd/rank) times smaller
    than the full KV, unlike the RocketKV pooled-mean proxy which
    re-reads every key to score. Returns f32[S, P] page scores (max
    over each page's scored tokens — the reference's token-granular
    logits reduced to the page grain TPU gathers like)."""
    S, P = page_indices.shape
    hd = kv_pages.shape[3]
    if proj is None:
        # fixed pseudo-random projection (JL-style); a DSA checkpoint's
        # trained indexer W_k slots in here
        proj = jax.random.normal(jax.random.PRNGKey(17), (hd, rank),
                                 jnp.float32) / (hd ** 0.5)
    # head-0 keys (combined index 0), every `stride`-th position
    toks = kv_pages[page_indices.reshape(-1), ::stride, 0, :]
    t = toks.shape[1]
    idx_k = toks.astype(jnp.float32).reshape(S, P * t, hd) @ proj
    qh = q.shape[1]
    idx_q = q.mean(axis=1).astype(jnp.float32) @ proj      # [S, rank]
    scores = jnp.einsum("sr,sxr->sx", idx_q, idx_k).reshape(S, P, t)
    pos = (jnp.arange(P, dtype=jnp.int32)[None, :, None] * page_size
           + jnp.arange(t, dtype=jnp.int32)[None, None, :] * stride)
    neg = jnp.finfo(jnp.float32).min
    scores = jnp.where(pos < kv_lens[:, None, None], scores, neg)
    return scores.max(axis=2)


def sparse_paged_decode_attention(
        q: jax.Array,                    # [S, qh, hd] one query per seq
        kv_pages: jax.Array,             # [pages, ps, 2*kvh, hd]
        metadata: AttentionMetadata,
        *,
        sm_scale: float,
        keep_pages: int,
        algo: str = "ROCKET_TOPK",
        soft_cap: Optional[float] = None,
        k_scale=None, v_scale=None) -> jax.Array:
    """Decode-shaped sparse attention (one query row per sequence)."""
    S, P = metadata.page_indices.shape
    ps = kv_pages.shape[1]
    combined = kv_pages.shape[2]
    hd = kv_pages.shape[3]
    kvh = combined // 2
    qh = q.shape[1]
    group = qh // kvh
    K = min(keep_pages, P)
    kv_lens = metadata.kv_lens

    qg = q.reshape(S, kvh, group, hd).astype(jnp.float32)
    if algo == "DSA":
        page_score = dsa_page_scores(q, kv_pages, kv_lens,
                                     metadata.page_indices, ps)
    else:
        # ---- indexer: query . pooled page keys ----------------------- #
        mean_k = page_mean_keys(kv_pages, kv_lens,
                                metadata.page_indices, ps)
        if k_scale is not None:
            mean_k = mean_k * k_scale
        # score per page: max over the kv head's query group (RocketKV
        # uses the max-estimate; max keeps any head's strong match)
        scores = jnp.einsum("skgd,spkd->skgp", qg, mean_k)
        page_score = scores.max(axis=(1, 2))            # [S, P]
    pages_used = (kv_lens + ps - 1) // ps               # [S]
    ordinal = jnp.arange(P, dtype=jnp.int32)[None, :]
    live = ordinal < pages_used[:, None]
    neg = jnp.finfo(jnp.float32).min
    page_score = jnp.where(live, page_score, neg)
    # force-keep sinks (ordinal 0) + the tail page (local context)
    tail = jnp.maximum(pages_used - 1, 0)
    big = jnp.finfo(jnp.float32).max
    page_score = jnp.where(ordinal == 0, big, page_score)
    page_score = jnp.where(ordinal == tail[:, None], big, page_score)
    _, sel = jax.lax.top_k(page_score, K)               # [S, K] ordinals
    sel = jnp.sort(sel, axis=1)

    # ---- exact attention over the selected pages --------------------- #
    sel_pages = jnp.take_along_axis(metadata.page_indices, sel, axis=1)
    sel_live = jnp.take_along_axis(live, sel, axis=1)   # [S, K]
    pages = kv_pages[sel_pages.reshape(-1)]             # [S*K, ps, c, hd]
    pages = pages.reshape(S, K * ps, combined, hd)
    k = pages[:, :, 0::2, :]
    v = pages[:, :, 1::2, :]
    if k_scale is not None:
        k = k.astype(jnp.float32) * k_scale
        v = v.astype(jnp.float32) * v_scale
    # reconstruct absolute kv positions from the selected ordinals
    kv_pos = (sel[:, :, None] * ps
              + jnp.arange(ps, dtype=jnp.int32)[None, None, :])
    kv_pos = kv_pos.reshape(S, K * ps)
    valid = (kv_pos < kv_lens[:, None]) & \
        jnp.repeat(sel_live, ps, axis=1)
    att = jnp.einsum("skgd,sxkd->skgx", qg,
                     k.reshape(S, K * ps, kvh, hd).astype(jnp.float32)
                     ) * sm_scale
    if soft_cap is not None:
        att = soft_cap * jnp.tanh(att / soft_cap)
    att = jnp.where(valid[:, None, None, :], att, neg)
    att = jax.nn.softmax(att, axis=-1)
    att = jnp.where(valid[:, None, None, :], att, 0.0)
    out = jnp.einsum("skgx,sxkd->skgd", att,
                     v.reshape(S, K * ps, kvh, hd).astype(jnp.float32))
    return out.reshape(S, qh, hd).astype(q.dtype)
