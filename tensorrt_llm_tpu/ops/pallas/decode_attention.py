"""Paged GQA decode attention kernel (one query token per sequence).

In-repo analog of the reference decode attention (ref:
cpp/kernels/xqa/ — paged GQA/MQA decode with KV quant). Complements the
jax.experimental ragged kernel, which requires head_dim % 128 == 0: this
kernel handles head_dim 64/128/192… via the paired (k|v) 2·hd lane
layout.

v3 structure (the library RPA kernel's shape, re-derived for pure
decode): the grid walks BLOCKS of QB sequences; within a block, every
sequence's KV tiles stream through ONE continuous double-buffered DMA
pipe — a flat tile list (seq id + tile index per flat slot, precomputed
in-graph and scalar-prefetched) lets tile f+1 prefetch even when it
belongs to the next sequence, so the pipe never drains at sequence
boundaries. Each tile's score matmul covers the whole q block and a
row mask selects the owning sequence (bandwidth-bound: trading MXU
FLOPs for zero per-sequence DMA stalls). Earlier per-sequence-grid
versions spent ~5µs/seq on DMA startup latency — 1.3ms of stall per
layer call at bs256 against a 0.5ms speed-of-light.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(kv_lens_ref, page_tbl_ref, cu_tiles_ref, tile_seq_ref,
            tile_pos_ref,                       # scalar prefetch
            q_ref, pages_hbm, sinks_ref, o_ref,  # blocks
            kbuf, m_scr, l_scr, acc_scr, sem,   # scratch
            *, ps, tile_pages, num_kv, group, hd, qb, sm_scale,
            sliding_window, soft_cap, alibi_slopes, k_scale, v_scale):
    b = pl.program_id(0)
    TILE = tile_pages * ps
    f_lo = cu_tiles_ref[b * qb]
    f_hi = cu_tiles_ref[jnp.minimum(b * qb + qb,
                                    cu_tiles_ref.shape[0] - 1)]

    # branch-free copy path (the library RPA kernel's trick): always
    # issue tile_pages copies with CLAMPED page-table indices — an
    # out-of-range slot re-copies a valid page whose data is masked in
    # compute. Predicating each copy put ~2k scalar-core branches on the
    # critical path per call and capped the pipe at ~20 GB/s.
    ptw = page_tbl_ref.shape[1]

    def tile_copies(slot, f):
        seq = tile_seq_ref[f]
        base = tile_pos_ref[f] * tile_pages
        out = []
        for i in range(tile_pages):
            idx = jnp.minimum(base + i, ptw - 1)
            out.append(pltpu.make_async_copy(
                pages_hbm.at[page_tbl_ref[seq, idx]],
                kbuf.at[slot, i], sem.at[slot]))
        return out

    def start_tile(slot, f):
        for c in tile_copies(slot, f):
            c.start()

    def wait_tile(slot, f):
        for c in tile_copies(slot, f):
            c.wait()

    # online softmax seeded with the attention-sink logit (gpt-oss):
    # m0 = sink, l0 = 1. With no sinks the block holds MASK and the
    # phantom l0 = 1 is annihilated by alpha = exp(MASK - m_new) = 0 on
    # the first real tile, so both cases are exact.
    m_scr[...] = sinks_ref[0]
    l_scr[...] = jnp.ones_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    @pl.when(f_lo < f_hi)
    def _():
        start_tile(f_lo % 2, f_lo)

    rows = qb * group
    row_seq = jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 0) // group
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (rows, TILE), 1)
    col_1d = jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)

    def body(f, carry):
        slot = f % 2

        @pl.when(f + 1 < f_hi)
        def _():
            start_tile((f + 1) % 2, f + 1)

        wait_tile(slot, f)
        seq = tile_seq_ref[f]
        local = seq - b * qb
        kv_len = kv_lens_ref[seq]
        kv_base = tile_pos_ref[f] * TILE
        kv_pos = kv_base + col_iota
        valid = (kv_pos < kv_len) & (row_seq == local)
        if sliding_window is not None:
            valid &= kv_pos > (kv_len - 1 - sliding_window)
        col_ok = (col_1d + kv_base) < kv_len
        kblk = kbuf[slot].reshape(TILE, num_kv, 2 * hd)
        for h in range(num_kv):
            k = kblk[:, h, :hd]                # [TILE, hd]
            v = kblk[:, h, hd:]
            if k_scale is not None:
                k = k.astype(jnp.float32) * k_scale
                v = v.astype(jnp.float32) * v_scale
            # un-DMA'd tail rows hold garbage: 0·NaN = NaN in the value
            # matmul — zero them (scores are masked anyway)
            v = jnp.where(col_ok, v, 0)
            qg = q_ref[:, h * group:(h + 1) * group, :] \
                .reshape(rows, hd)             # whole block's q rows
            scores = jax.lax.dot_general(
                qg.astype(jnp.float32), k.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if alibi_slopes is not None:
                # rows: qb seqs x group heads (head = row % group); bias
                # = slope * (kv_pos - q_pos); python-scalar slopes via a
                # per-head select cascade (no const arrays in Pallas)
                dist = (kv_pos - (kv_len - 1)).astype(jnp.float32)
                head_idx = jax.lax.broadcasted_iota(
                    jnp.int32, (rows, TILE), 0) % group
                for i in range(group):
                    scores = scores + jnp.where(
                        head_idx == i,
                        float(alibi_slopes[h * group + i]) * dist, 0.0)
            if soft_cap is not None:
                scores = soft_cap * jnp.tanh(scores / soft_cap)
            scores = jnp.where(valid, scores, MASK)
            # masked online-softmax: rows of other sequences see only
            # MASK scores → m_new == m_old, alpha == 1, pexp == 0, so
            # their state is untouched without an explicit select
            m_old = m_scr[h]
            l_old = l_scr[h]
            a_old = acc_scr[h]
            m_new = jnp.maximum(m_old,
                                jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_old - m_new)
            pexp = jnp.exp(scores - m_new)
            l_new = l_old * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
            a_new = a_old * alpha + jax.lax.dot_general(
                pexp, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            m_scr[h] = m_new
            l_scr[h] = l_new
            acc_scr[h] = a_new
        return carry

    jax.lax.fori_loop(f_lo, f_hi, body, 0)
    for h in range(num_kv):
        out = acc_scr[h] / jnp.maximum(l_scr[h], 1e-30)
        o_ref[:, h * group:(h + 1) * group, :] = \
            out.reshape(qb, group, hd).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "sliding_window", "soft_cap", "alibi_slopes", "k_scale",
    "v_scale", "interpret"))
def paged_decode_attention(q: jax.Array,           # [S, qh, hd]
                           kv_pages: jax.Array,    # [P, ps, 2kvh, hd]
                           kv_lens: jax.Array,     # i32[S]
                           page_indices: jax.Array,  # i32[S, max_pages]
                           *,
                           sm_scale: float,
                           sliding_window=None,
                           soft_cap=None,
                           alibi_slopes=None,
                           sinks=None,
                           k_scale=None,
                           v_scale=None,
                           interpret: bool = False) -> jax.Array:
    S, qh, hd = q.shape
    P, ps, combined, _ = kv_pages.shape
    num_kv = combined // 2
    group = qh // num_kv
    if (2 * hd) % 128 != 0:
        raise ValueError(f"head_dim {hd} needs hd % 64 == 0 for the "
                         f"decode kernel's 128-lane DMA alignment")
    # view adjacent (k_h, v_h) pairs as one 128-aligned lane group so the
    # page DMA stays tiling-aligned: [P, ps, kvh, 2*hd]
    kv_pages = kv_pages.reshape(P, ps, num_kv, 2 * hd)

    tile_pages = max(1, 128 // ps)
    TILE = tile_pages * ps
    pt_pad = -page_indices.shape[1] % tile_pages
    page_indices = jnp.pad(page_indices, ((0, 0), (0, pt_pad)))
    page_indices = jnp.clip(page_indices, 0, P - 1)
    max_tiles = page_indices.shape[1] // tile_pages

    # sequences per block: keep the masked score matmul near 128 rows
    qb = max(1, min(S, 128 // max(1, group)))
    while S % qb:
        qb -= 1
    num_blocks = S // qb

    # flat tile map (in-graph, scalar-prefetched): tiles of seq 0, then
    # seq 1, … — tile f+1 is always the next thing the pipe needs
    ntiles = (jnp.maximum(kv_lens, 0) + TILE - 1) // TILE
    cu_tiles = jnp.concatenate([
        jnp.zeros((1,), jnp.int32),
        jnp.cumsum(ntiles.astype(jnp.int32)).astype(jnp.int32)])
    F = S * max_tiles                       # static bound on flat tiles
    flat = jnp.arange(F, dtype=jnp.int32)
    tile_seq = jnp.searchsorted(cu_tiles[1:S + 1], flat,
                                side="right").astype(jnp.int32)
    tile_seq = jnp.minimum(tile_seq, S - 1)
    tile_pos = flat - cu_tiles[tile_seq]

    # per-row online-softmax seeds: the sink logit per q head (or MASK)
    rows = qb * group
    if sinks is None:
        seed = jnp.full((num_kv, rows, 1), MASK, jnp.float32)
        seed = jnp.broadcast_to(seed[None], (num_blocks,) + seed.shape)
    else:
        sk = jnp.asarray(sinks, jnp.float32).reshape(num_kv, group)
        seed = jnp.broadcast_to(sk[:, None, :], (num_kv, qb, group)) \
            .reshape(num_kv, rows, 1)
        seed = jnp.broadcast_to(seed[None], (num_blocks,) + seed.shape)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(num_blocks,),
        in_specs=[
            pl.BlockSpec((qb, qh, hd), lambda b, *_: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),       # kv pages stay in HBM
            pl.BlockSpec((1, num_kv, rows, 1), lambda b, *_: (b, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((qb, qh, hd), lambda b, *_: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile_pages, ps, num_kv, 2 * hd),
                       kv_pages.dtype),
            pltpu.VMEM((num_kv, qb * group, 1), jnp.float32),
            pltpu.VMEM((num_kv, qb * group, 1), jnp.float32),
            pltpu.VMEM((num_kv, qb * group, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, ps=ps, tile_pages=tile_pages, num_kv=num_kv, group=group,
        hd=hd, qb=qb, sm_scale=sm_scale, sliding_window=sliding_window,
        soft_cap=soft_cap, alibi_slopes=alibi_slopes,
        k_scale=k_scale, v_scale=v_scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, qh, hd), q.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(kv_lens, page_indices, cu_tiles, tile_seq, tile_pos,
      q, kv_pages, seed)
