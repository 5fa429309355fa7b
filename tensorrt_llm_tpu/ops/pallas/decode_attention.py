"""Paged GQA decode attention kernel (one query token per sequence).

In-repo analog of the reference decode attention (ref:
cpp/kernels/xqa/ — paged GQA/MQA decode with KV quant). Complements the
jax.experimental ragged kernel, which requires head_dim % 128 == 0: this
kernel handles head_dim 64/96/128+ (padding inefficiency on the lane dim
is accepted; decode is KV-bandwidth-bound, not MXU-bound).

Structure: grid over sequences; per sequence a double-buffered DMA loop
streams KV pages HBM→VMEM while flash-style online softmax accumulates
per kv-head groups. Scalar-prefetched page indices drive the DMAs
(PrefetchScalarGridSpec), exactly like the library kernel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MASK = -0.7 * float(jnp.finfo(jnp.float32).max)


def _kernel(kv_lens_ref, page_tbl_ref,          # scalar prefetch
            q_ref, pages_hbm, o_ref,            # blocks
            kbuf, vbuf, sem,                    # scratch
            *, ps, num_kv, group, hd, max_pages, sm_scale,
            sliding_window, soft_cap, k_scale, v_scale):
    s = pl.program_id(0)
    kv_len = kv_lens_ref[s]
    num_pages = (kv_len + ps - 1) // ps

    def dma(slot, p):
        return pltpu.make_async_copy(
            pages_hbm.at[page_tbl_ref[s, p]], kbuf.at[slot], sem.at[slot])

    @pl.when(num_pages > 0)
    def _():
        dma(0, 0).start()

    def body(p, carry):
        m, l, acc = carry
        slot = p % 2

        @pl.when(p + 1 < num_pages)
        def _():
            dma((p + 1) % 2, p + 1).start()

        dma(slot, p).wait()
        page = kbuf[slot]                      # [ps, num_kv, 2*hd] (k|v)
        kv_pos = p * ps + jax.lax.broadcasted_iota(jnp.int32, (1, ps), 1)
        valid = kv_pos < kv_len
        if sliding_window is not None:
            valid &= kv_pos > (kv_len - 1 - sliding_window)

        q = q_ref[0]                           # [qh, hd]
        new_m, new_l, new_acc = m, l, acc
        # per kv head: scores [group, ps]
        outs_m = []
        outs_l = []
        outs_acc = []
        for h in range(num_kv):
            k = page[:, h, :hd]                # [ps, hd]
            v = page[:, h, hd:]
            if k_scale is not None:
                k = (k.astype(jnp.float32) * k_scale)
                v = (v.astype(jnp.float32) * v_scale)
            qg = q[h * group:(h + 1) * group, :]
            scores = jax.lax.dot_general(
                qg.astype(jnp.float32), k.astype(jnp.float32),
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32) * sm_scale
            if soft_cap is not None:
                scores = soft_cap * jnp.tanh(scores / soft_cap)
            scores = jnp.where(valid, scores, MASK)
            m_h = m[h * group:(h + 1) * group]
            l_h = l[h * group:(h + 1) * group]
            a_h = acc[h * group:(h + 1) * group]
            m_new = jnp.maximum(m_h, jnp.max(scores, axis=-1, keepdims=True))
            alpha = jnp.exp(m_h - m_new)
            pexp = jnp.exp(scores - m_new)
            l_new = l_h * alpha + jnp.sum(pexp, axis=-1, keepdims=True)
            a_new = a_h * alpha + jax.lax.dot_general(
                pexp, v.astype(jnp.float32), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            outs_m.append(m_new)
            outs_l.append(l_new)
            outs_acc.append(a_new)
        new_m = jnp.concatenate(outs_m, axis=0)
        new_l = jnp.concatenate(outs_l, axis=0)
        new_acc = jnp.concatenate(outs_acc, axis=0)
        return new_m, new_l, new_acc

    qh = num_kv * group
    m0 = jnp.full((qh, 1), MASK, jnp.float32)
    l0 = jnp.zeros((qh, 1), jnp.float32)
    acc0 = jnp.zeros((qh, hd), jnp.float32)
    m, l, acc = jax.lax.fori_loop(0, num_pages, body, (m0, l0, acc0))
    out = acc / jnp.maximum(l, 1e-30)
    o_ref[0] = out.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "sm_scale", "sliding_window", "soft_cap", "k_scale", "v_scale",
    "interpret"))
def paged_decode_attention(q: jax.Array,           # [S, qh, hd]
                           kv_pages: jax.Array,    # [P, ps, 2kvh, hd]
                           kv_lens: jax.Array,     # i32[S]
                           page_indices: jax.Array,  # i32[S, max_pages]
                           *,
                           sm_scale: float,
                           sliding_window=None,
                           soft_cap=None,
                           k_scale=None,
                           v_scale=None,
                           interpret: bool = False) -> jax.Array:
    S, qh, hd = q.shape
    P, ps, combined, _ = kv_pages.shape
    num_kv = combined // 2
    group = qh // num_kv
    max_pages = page_indices.shape[1]
    if (2 * hd) % 128 != 0:
        raise ValueError(f"head_dim {hd} needs hd % 64 == 0 for the "
                         f"decode kernel's 128-lane DMA alignment")
    # view adjacent (k_h, v_h) pairs as one 128-aligned lane group so the
    # page DMA stays tiling-aligned: [P, ps, kvh, 2*hd]
    kv_pages = kv_pages.reshape(P, ps, num_kv, 2 * hd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(S,),
        in_specs=[
            pl.BlockSpec((1, qh, hd), lambda s, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),    # kv pages stay in HBM
        ],
        out_specs=pl.BlockSpec((1, qh, hd), lambda s, *_: (s, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, ps, num_kv, 2 * hd), kv_pages.dtype),
            pltpu.VMEM((1,), jnp.float32),           # placeholder
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _kernel, ps=ps, num_kv=num_kv, group=group, hd=hd,
        max_pages=max_pages, sm_scale=sm_scale,
        sliding_window=sliding_window, soft_cap=soft_cap,
        k_scale=k_scale, v_scale=v_scale)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((S, qh, hd), q.dtype),
        interpret=interpret,
    )(kv_lens, page_indices, q, kv_pages)
