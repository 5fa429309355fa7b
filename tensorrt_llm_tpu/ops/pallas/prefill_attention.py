"""Paged ragged PREFILL/mixed attention kernel for lane-unaligned heads.

In-repo analog of the reference context FMHA (ref: cpp/kernels/fmha_v2/
— causal ragged prefill over paged KV). The library RPA kernel requires
head_dim % 128 == 0; this kernel serves head_dim % 64 == 0 geometries
(TinyLlama-real 32×64, GPT-2 12×64, Gemma-2 256) that previously fell
back to the O(max_kv) dense XLA path for prefill
(VERDICT round-1 item 8).

Structure: grid over sequences. Per sequence:
  * its packed query rows are DMA'd HBM→VMEM in predicated QB-row
    sub-blocks (only rows that exist move);
  * KV streams in double-buffered tiles of ~128 positions (several
    pages per tile so the score matmul is MXU-shaped (QB·group, 128));
  * causal online-softmax accumulates per (q-sub-block, kv-head) in
    f32 VMEM scratch; sub-blocks whose causal window ends before a tile
    skip it entirely (predicated — real control flow on TPU);
  * finished rows DMA back to the packed output (grid iterations run in
    order on one core, so the deliberate QB-alignment over-write of a
    tail sub-block is corrected by the next sequence's own write).

The same lane trick as the decode kernel: adjacent (k_h, v_h) pairs are
viewed as one 2*hd lane group, so hd=64 DMAs stay 128-lane aligned.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(cu_q_ref, kv_lens_ref, page_tbl_ref,      # scalar prefetch
            q_hbm, pages_hbm, seed_ref, o_hbm,        # ANY/VMEM (HBM)
            qbuf, kbuf, obuf, m_scr, l_scr, acc_scr,  # VMEM scratch
            sem_q, sem_kv, sem_o, sem_r,
            *, ps, tile_pages, num_kv, group, hd, maxq, qb_rows,
            sm_scale, sliding_window, soft_cap, alibi_slopes, k_scale,
            v_scale):
    s = pl.program_id(0)
    q_start = cu_q_ref[s]
    q_len = cu_q_ref[s + 1] - q_start
    kv_len = kv_lens_ref[s]
    # DMA offsets must sit on sublane-tile boundaries, but packed segment
    # starts are arbitrary: work in a 16-row-aligned window
    # [q_al, q_al + ext) and blend the leading `delta` foreign rows back
    # out untouched (they belong to the previous sequence, already
    # written — grid steps run in order on one core).
    ALIGN = 16
    q_al = pl.multiple_of((q_start // ALIGN) * ALIGN, ALIGN)
    delta = q_start - q_al
    ext = delta + q_len              # local rows in use
    nqb = (maxq + ALIGN) // qb_rows
    TILE = tile_pages * ps
    num_pages = (kv_len + ps - 1) // ps
    num_tiles = (num_pages + tile_pages - 1) // tile_pages

    # ---- queries in (predicated sub-blocks; start all, then wait).
    # q rides flattened to [T, qh*hd]: manual DMA destinations must be
    # 128-lane tiles, which per-head hd=64 rows are not; head slicing
    # happens on loaded VALUES instead (allowed, like the decode
    # kernel's k|v split) ----
    def q_copy(qb):
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(q_al + qb * qb_rows, qb_rows)],
            qbuf.at[pl.ds(qb * qb_rows, qb_rows)], sem_q.at[qb])

    # restore slab: current output rows at the aligned head of the
    # window, so foreign rows round-trip unchanged through the blend
    restore = pltpu.make_async_copy(
        o_hbm.at[pl.ds(q_al, ALIGN)], obuf.at[pl.ds(0, ALIGN)], sem_r)

    for qb in range(nqb):
        @pl.when(qb * qb_rows < ext)
        def _(qb=qb):
            q_copy(qb).start()
    restore.start()

    # ---- init accumulators: online softmax seeded with the
    # attention-sink logits (MASK rows when none; the phantom l0 = 1 is
    # annihilated by alpha = exp(MASK - m_new) on the first real tile)
    for qb in range(nqb):
        m_scr[qb] = seed_ref[...]
    l_scr[...] = jnp.ones_like(l_scr)
    acc_scr[...] = jnp.zeros_like(acc_scr)

    for qb in range(nqb):
        @pl.when(qb * qb_rows < ext)
        def _(qb=qb):
            q_copy(qb).wait()
    restore.wait()

    # ---- KV tile DMA helpers (double buffered) ----
    def tile_copy(slot, t, i):
        return pltpu.make_async_copy(
            pages_hbm.at[page_tbl_ref[s, t * tile_pages + i]],
            kbuf.at[slot, pl.ds(i * ps, ps)], sem_kv.at[slot, i])

    def start_tile(slot, t):
        for i in range(tile_pages):
            @pl.when(t * tile_pages + i < num_pages)
            def _(i=i):
                tile_copy(slot, t, i).start()

    def wait_tile(slot, t):
        for i in range(tile_pages):
            @pl.when(t * tile_pages + i < num_pages)
            def _(i=i):
                tile_copy(slot, t, i).wait()

    @pl.when(num_tiles > 0)
    def _():
        start_tile(0, 0)

    def body(t, carry):
        slot = t % 2

        @pl.when(t + 1 < num_tiles)
        def _():
            start_tile((t + 1) % 2, t + 1)

        wait_tile(slot, t)
        kv_base = t * TILE
        pos_iota = jax.lax.broadcasted_iota(
            jnp.int32, (qb_rows * group, TILE), 1) + kv_base
        # score rows are HEAD-MAJOR: row r belongs to q row (r mod QB)
        # of head (r div QB) — heads concatenate along rows because
        # Mosaic supports neither lane-split reshapes nor rank-raising
        # stacks on values
        row_iota = jax.lax.broadcasted_iota(
            jnp.int32, (qb_rows * group, TILE), 0) % qb_rows

        # rows of the tile buffer beyond kv_len were never DMA'd: they
        # hold garbage (NaN in interpret mode). Scores there are masked,
        # but 0·NaN = NaN in the value matmul — zero V rows explicitly.
        col_ok = (jax.lax.broadcasted_iota(jnp.int32, (TILE, 1), 0)
                  + kv_base) < kv_len
        for h in range(num_kv):
            k = kbuf[slot, :, h, :hd]              # [TILE, hd]
            v = kbuf[slot, :, h, hd:]
            if k_scale is not None:
                k = k.astype(jnp.float32) * k_scale
                v = v.astype(jnp.float32) * v_scale
            v = jnp.where(col_ok, v, 0)
            for qb in range(nqb):
                # causal reach of this sub-block: its last existing row
                q_hi = kv_len - q_len + \
                    jnp.minimum((qb + 1) * qb_rows - delta, q_len) - 1

                @pl.when((qb * qb_rows < ext) & (kv_base <= q_hi))
                def _(qb=qb, h=h, k=k, v=v):
                    rows = slice(qb * qb_rows, (qb + 1) * qb_rows)
                    # per-head dots: odd heads' q values carry lane
                    # offset 64 (can't concat raw), but matmul operands
                    # are relayout-normalized — concat the offset-0
                    # score tiles instead
                    kf = k.astype(jnp.float32)
                    q_row = row_iota + qb * qb_rows - delta
                    q_pos = kv_len - q_len + q_row

                    def head_scores(i):
                        s = jax.lax.dot_general(
                            qbuf[rows, (h * group + i) * hd:
                                 (h * group + i + 1) * hd]
                            .astype(jnp.float32), kf,
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * sm_scale
                        if alibi_slopes is not None:
                            # python-scalar slope per head (Pallas
                            # forbids closed-over const arrays)
                            pr = jax.lax.broadcasted_iota(
                                jnp.int32, (qb_rows, TILE), 0)
                            qp = kv_len - q_len + pr \
                                + qb * qb_rows - delta
                            dist = (pos_iota[:qb_rows]
                                    - qp).astype(jnp.float32)
                            s = s + float(
                                alibi_slopes[h * group + i]) * dist
                        return s

                    scores = jnp.concatenate(
                        [head_scores(i) for i in range(group)], axis=0)
                    if soft_cap is not None:
                        scores = soft_cap * jnp.tanh(scores / soft_cap)
                    valid = (pos_iota <= q_pos) & (pos_iota < kv_len) \
                        & (q_row >= 0) & (q_row < q_len)
                    if sliding_window is not None:
                        valid &= pos_iota > (q_pos - sliding_window)
                    scores = jnp.where(valid, scores, MASK)
                    m_old = m_scr[qb, h]
                    l_old = l_scr[qb, h]
                    a_old = acc_scr[qb, h]
                    m_new = jnp.maximum(
                        m_old, jnp.max(scores, axis=-1, keepdims=True))
                    alpha = jnp.exp(m_old - m_new)
                    pexp = jnp.exp(scores - m_new)
                    l_new = l_old * alpha + \
                        jnp.sum(pexp, axis=-1, keepdims=True)
                    a_new = a_old * alpha + jax.lax.dot_general(
                        pexp, v.astype(jnp.float32),
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    m_scr[qb, h] = m_new
                    l_scr[qb, h] = l_new
                    acc_scr[qb, h] = a_new
        return carry

    jax.lax.fori_loop(0, num_tiles, body, 0)

    # ---- normalize + write out (predicated sub-blocks) ----
    def o_copy(qb):
        return pltpu.make_async_copy(
            obuf.at[pl.ds(qb * qb_rows, qb_rows)],
            o_hbm.at[pl.ds(q_al + qb * qb_rows, qb_rows)],
            sem_o.at[qb])

    for qb in range(nqb):
        @pl.when(qb * qb_rows < ext)
        def _(qb=qb):
            rows = slice(qb * qb_rows, (qb + 1) * qb_rows)
            blend = qb * qb_rows < ALIGN     # block may hold foreign rows
            if blend:
                lrow = jax.lax.broadcasted_iota(
                    jnp.int32, (qb_rows, 1), 0) + qb * qb_rows
            for h in range(num_kv):
                out = acc_scr[qb, h] / jnp.maximum(l_scr[qb, h], 1e-30)
                out = out.astype(obuf.dtype)        # [g*QB, hd] head-major
                for i in range(group):
                    cols = slice((h * group + i) * hd,
                                 (h * group + i + 1) * hd)
                    tile = out[i * qb_rows:(i + 1) * qb_rows]
                    if blend:
                        tile = jnp.where(lrow >= delta, tile,
                                         obuf[rows, cols])
                    obuf[rows, cols] = tile
            o_copy(qb).start()
    for qb in range(nqb):
        @pl.when(qb * qb_rows < ext)
        def _(qb=qb):
            o_copy(qb).wait()


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "sliding_window", "soft_cap", "alibi_slopes", "k_scale",
    "v_scale", "max_q_len", "interpret"))
def ragged_prefill_attention(q: jax.Array,            # [T, qh, hd] packed
                             kv_pages: jax.Array,     # [P, ps, 2kvh, hd]
                             kv_lens: jax.Array,      # i32[S]
                             page_indices: jax.Array,  # i32[S, max_pages]
                             cu_q_lens: jax.Array,    # i32[S+1]
                             *,
                             sm_scale: float,
                             sliding_window=None,
                             soft_cap=None,
                             alibi_slopes=None,
                             sinks=None,
                             k_scale=None,
                             v_scale=None,
                             max_q_len: int = 256,
                             interpret: bool = False) -> jax.Array:
    T, qh, hd = q.shape
    P, ps, combined, _ = kv_pages.shape
    num_kv = combined // 2
    group = qh // num_kv
    S = kv_lens.shape[0]
    if (2 * hd) % 128 != 0:
        raise ValueError(f"head_dim {hd}: need hd % 64 == 0 for the "
                         f"128-lane paired-KV DMA layout")
    if (qh * hd) % 128 != 0:
        raise ValueError(f"flattened q row {qh}x{hd} must be a multiple "
                         f"of 128 lanes")
    kv_pages = kv_pages.reshape(P, ps, num_kv, 2 * hd)

    maxq = max_q_len
    # sub-block rows: aim for ~128 score rows per matmul, ≥8 sublanes
    qb_rows = max(16, min(maxq, 128 // max(1, group)))
    while maxq % qb_rows:
        qb_rows //= 2
    ALIGN = 16
    nqb = (maxq + ALIGN) // qb_rows
    nrows = nqb * qb_rows
    tile_pages = max(1, 128 // ps)
    TILE = tile_pages * ps

    # pad queries so fixed-size sub-block DMAs never run off the array;
    # pad the page table so tile DMAs of the final partial tile have a
    # real (ignored) source page
    q_pad = jnp.pad(q.reshape(T, qh * hd), ((0, nrows + ALIGN), (0, 0)))
    pt_pad = -page_indices.shape[1] % tile_pages
    page_indices = jnp.pad(page_indices, ((0, 0), (0, pt_pad)))
    page_indices = jnp.clip(page_indices, 0, P - 1)

    # online-softmax seed rows per (kv head, group-major row block)
    if sinks is None:
        seed = jnp.full((num_kv, group * qb_rows, 1), MASK, jnp.float32)
    else:
        sk = jnp.asarray(sinks, jnp.float32).reshape(num_kv, group)
        seed = jnp.repeat(sk, qb_rows, axis=1)[:, :, None]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(S,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),        # q packed (HBM)
            pl.BlockSpec(memory_space=pl.ANY),        # kv pages (HBM)
            pl.BlockSpec((num_kv, group * qb_rows, 1),
                         lambda s, *_: (0, 0, 0),
                         memory_space=pltpu.VMEM),    # softmax seeds
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((nrows, qh * hd), q.dtype),              # qbuf
            pltpu.VMEM((2, TILE, num_kv, 2 * hd), kv_pages.dtype),
            pltpu.VMEM((nrows, qh * hd), q.dtype),              # obuf
            pltpu.VMEM((nqb, num_kv, qb_rows * group, 1), jnp.float32),
            pltpu.VMEM((nqb, num_kv, qb_rows * group, 1), jnp.float32),
            pltpu.VMEM((nqb, num_kv, qb_rows * group, hd), jnp.float32),
            pltpu.SemaphoreType.DMA((nqb,)),
            pltpu.SemaphoreType.DMA((2, tile_pages)),
            pltpu.SemaphoreType.DMA((nqb,)),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(
        _kernel, ps=ps, tile_pages=tile_pages, num_kv=num_kv,
        group=group, hd=hd, maxq=maxq, qb_rows=qb_rows,
        sm_scale=sm_scale, sliding_window=sliding_window,
        soft_cap=soft_cap, alibi_slopes=alibi_slopes,
        k_scale=k_scale, v_scale=v_scale)
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T + nrows + ALIGN, qh * hd),
                                       q.dtype),
        # sequential grid is REQUIRED: each sequence's edge blend reads
        # rows the previous grid step wrote. vmem limit raised above the
        # 16M default — the unrolled (head × sub-block) body carries
        # f32 staging temps the allocator accounts conservatively.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(cu_q_lens, kv_lens, page_indices, q_pad, kv_pages, seed)
    return out[:T].reshape(T, qh, hd)
