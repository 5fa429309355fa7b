"""Selective-scan (Mamba S6) and causal depthwise conv over the
flattened ragged batch.

TPU-native analog of the reference SSM kernels (ref:
cpp/tensorrt_llm/kernels/selectiveScan/, causalConv1d/). The recurrence
runs as a segment-aware ``lax.associative_scan`` over the flattened token
axis: segment boundaries cut the scan (a'=0) and continuing sequences
inject their cached state into the first element, so mixed
prefill/decode batches work exactly like attention's ragged layout.
State caches are slot-indexed (no paging — fixed size per sequence),
mirroring the reference's Mamba cache manager
(_torch/pyexecutor/mamba_cache_manager.py).
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def _token_segments(cu_q_lens, num_seqs, positions, T, S):
    """Per-token segment info: seq index, position-in-segment, start flag."""
    tok = jnp.arange(T, dtype=jnp.int32)
    seq_of = jnp.searchsorted(cu_q_lens[1:S + 1], tok,
                              side="right").astype(jnp.int32)
    seq_of = jnp.minimum(seq_of, S - 1)
    seg_start = cu_q_lens[seq_of]
    pos_in_seg = tok - seg_start
    is_start = pos_in_seg == 0
    valid = tok < cu_q_lens[jnp.minimum(num_seqs[0], S)]
    return seq_of, pos_in_seg, is_start, valid


def causal_conv1d(x: jax.Array,            # [T, I]
                  conv_w: jax.Array,       # [I, k]
                  conv_b: jax.Array,       # [I]
                  conv_state: jax.Array,   # [slots, I, k-1] oldest..newest
                  metadata) -> Tuple[jax.Array, jax.Array]:
    """Depthwise causal conv with cross-step state (ref: causalConv1d)."""
    T, I = x.shape
    k = conv_w.shape[1]
    S = metadata.kv_lens.shape[0]
    seq_of, pos_in_seg, _, valid = _token_segments(
        metadata.cu_q_lens, metadata.num_seqs, metadata.positions, T, S)
    slots = jnp.clip(metadata.seq_slots, 0)
    slot_of = slots[seq_of]                      # [T]
    abs_pos = metadata.positions

    out = jnp.zeros((T, I), jnp.float32)
    for j in range(k):
        w_j = conv_w[:, k - 1 - j].astype(jnp.float32)   # weight for x[t-j]
        in_seg = pos_in_seg >= j
        from_x = jnp.where((jnp.arange(T) - j) >= 0,
                           jnp.arange(T) - j, 0)
        x_j = x[from_x].astype(jnp.float32)
        # beyond the segment: pull from the cached window (newest at k-2)
        m = j - pos_in_seg - 1                           # steps into state
        state_idx = jnp.clip(k - 2 - m, 0, k - 2)
        s_j = conv_state[slot_of, :, state_idx].astype(jnp.float32)
        have_state = (abs_pos - j) >= 0
        contrib = jnp.where(in_seg[:, None], x_j,
                            jnp.where(have_state[:, None], s_j, 0.0))
        out = out + contrib * w_j[None, :]
    out = out + conv_b.astype(jnp.float32)[None, :]

    # new conv state per sequence: last k-1 inputs at each segment end
    last_tok = jnp.clip(metadata.cu_q_lens[1:S + 1] - 1, 0)
    new_state_cols = []
    seg_len = metadata.cu_q_lens[1:S + 1] - metadata.cu_q_lens[:S]
    for j in range(k - 2, -1, -1):   # j steps back from the last token
        t_j = jnp.clip(last_tok - j, 0)
        in_seg = seg_len > j
        x_j = x[t_j].astype(jnp.float32)
        m = j - (seg_len - 1) - 1
        state_idx = jnp.clip(k - 2 - m, 0, k - 2)
        old = conv_state[slots, :, state_idx].astype(jnp.float32)
        have = (metadata.positions[last_tok] - j) >= 0
        col = jnp.where(in_seg[:, None], x_j,
                        jnp.where(have[:, None], old, 0.0))
        new_state_cols.append(col)
    # cols were built j = k-2 .. 0 (oldest sample first) → stacking in
    # built order yields the oldest..newest layout the reader expects
    new_per_seq = jnp.stack(new_state_cols, axis=-1)

    active = jnp.arange(S) < metadata.num_seqs[0]
    tgt = jnp.where(active & (metadata.seq_slots >= 0),
                    metadata.seq_slots, conv_state.shape[0])
    new_state = conv_state.at[tgt].set(
        new_per_seq.astype(conv_state.dtype), mode="drop")
    return out, new_state


def selective_scan(x: jax.Array,          # [T, I] (post-conv activation)
                   dt: jax.Array,         # [T, I]
                   A: jax.Array,          # [I, N]
                   B: jax.Array,          # [T, N]
                   C: jax.Array,          # [T, N]
                   D: jax.Array,          # [I]
                   ssm_state: jax.Array,  # [slots, I, N]
                   metadata) -> Tuple[jax.Array, jax.Array]:
    """y_t = C_t · h_t + D x_t with h_t = exp(dt A) h_{t-1} + dt B_t x_t."""
    T, I = x.shape
    N = A.shape[1]
    S = metadata.kv_lens.shape[0]
    seq_of, pos_in_seg, is_start, valid = _token_segments(
        metadata.cu_q_lens, metadata.num_seqs, metadata.positions, T, S)
    slots = jnp.clip(metadata.seq_slots, 0)
    slot_of = slots[seq_of]

    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    dA = jnp.exp(dtf[:, :, None] * A[None, :, :].astype(jnp.float32))
    dBx = (dtf * xf)[:, :, None] * B[:, None, :].astype(jnp.float32)

    # continuing sequences: fold the cached state into the first element
    continuing = is_start & (metadata.positions > 0)
    h_init = ssm_state[slot_of].astype(jnp.float32)      # [T, I, N]
    b0 = jnp.where(continuing[:, None, None], dA * h_init + dBx, dBx)
    # cut the scan at every segment start
    a0 = jnp.where(is_start[:, None, None], jnp.zeros_like(dA), dA)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, h = jax.lax.associative_scan(combine, (a0, b0), axis=0)

    y = jnp.einsum("tin,tn->ti", h, C.astype(jnp.float32))
    y = y + D.astype(jnp.float32)[None, :] * xf

    # store each active sequence's final state by slot
    last_tok = jnp.clip(metadata.cu_q_lens[1:S + 1] - 1, 0)
    final_h = h[last_tok]                                 # [S, I, N]
    active = jnp.arange(S) < metadata.num_seqs[0]
    tgt = jnp.where(active & (metadata.seq_slots >= 0),
                    metadata.seq_slots, ssm_state.shape[0])
    new_state = ssm_state.at[tgt].set(final_h.astype(ssm_state.dtype),
                                      mode="drop")
    return y.astype(x.dtype), new_state


def ssd_scan(x: jax.Array,          # [T, nh, hd] (post-conv activation)
             dt: jax.Array,         # [T, nh] (post softplus + clamp)
             A: jax.Array,          # [nh] (negative)
             B: jax.Array,          # [T, G, N]
             C: jax.Array,          # [T, G, N]
             D: jax.Array,          # [nh]
             ssm_state: jax.Array,  # [slots, nh, hd, N]
             metadata) -> Tuple[jax.Array, jax.Array]:
    """Mamba2 SSD recurrence (scalar decay per head, grouped B/C):
    h_t = exp(dt_t A_h) h_{t-1} + dt_t x_t ⊗ B_t ;  y_t = h_t · C_t + D x_t.

    Reference: the SSD/chunked-scan kernels (cpp kernels chunkScan/ +
    _torch mamba2 metadata); HF Mamba2Mixer.torch_forward is the
    behavioral spec. Segment-aware over the flattened ragged batch like
    ``selective_scan``; the chunked dual (matmul) form for long prefill
    is a later MXU optimization.
    """
    T, nh, hd = x.shape
    G, N = B.shape[1], B.shape[2]
    S = metadata.kv_lens.shape[0]
    seq_of, pos_in_seg, is_start, _ = _token_segments(
        metadata.cu_q_lens, metadata.num_seqs, metadata.positions, T, S)
    slots = jnp.clip(metadata.seq_slots, 0)
    slot_of = slots[seq_of]

    rep = nh // G
    Bh = jnp.repeat(B.astype(jnp.float32), rep, axis=1)     # [T, nh, N]
    Ch = jnp.repeat(C.astype(jnp.float32), rep, axis=1)
    xf = x.astype(jnp.float32)
    dtf = dt.astype(jnp.float32)
    dA = jnp.exp(dtf * A[None, :].astype(jnp.float32))      # [T, nh]
    dBx = (dtf[:, :, None] * xf)[..., None] * Bh[:, :, None, :]

    continuing = is_start & (metadata.positions > 0)
    h_init = ssm_state[slot_of].astype(jnp.float32)          # [T, nh, hd, N]
    a_full = dA[:, :, None, None]
    b0 = jnp.where(continuing[:, None, None, None],
                   a_full * h_init + dBx, dBx)
    # a stays [T, nh, 1, 1] — broadcasting inside combine keeps the
    # decay operand 1/(hd*N)th the size of the state operand
    a0 = jnp.where(is_start[:, None, None, None],
                   jnp.zeros_like(a_full), a_full)

    def combine(l, r):
        al, bl = l
        ar, br = r
        return al * ar, ar * bl + br

    _, h = jax.lax.associative_scan(combine, (a0, b0), axis=0)

    y = jnp.einsum("thdn,thn->thd", h, Ch)
    y = y + D.astype(jnp.float32)[None, :, None] * xf

    last_tok = jnp.clip(metadata.cu_q_lens[1:S + 1] - 1, 0)
    final_h = h[last_tok]                                    # [S, nh, hd, N]
    active = jnp.arange(S) < metadata.num_seqs[0]
    tgt = jnp.where(active & (metadata.seq_slots >= 0),
                    metadata.seq_slots, ssm_state.shape[0])
    new_state = ssm_state.at[tgt].set(final_h.astype(ssm_state.dtype),
                                      mode="drop")
    return y.astype(x.dtype), new_state


def gated_delta_scan(q: jax.Array,        # [T, vh, dk] (post l2norm+scale)
                     k: jax.Array,        # [T, vh, dk] (post l2norm)
                     v: jax.Array,        # [T, vh, dv]
                     g: jax.Array,        # [T, vh] log-decay (<= 0)
                     beta: jax.Array,     # [T, vh] in (0, 1)
                     state: jax.Array,    # [slots, vh, dk, dv]
                     metadata) -> Tuple[jax.Array, jax.Array]:
    """Gated delta rule (Qwen3-Next linear attention; HF
    torch_recurrent_gated_delta_rule is the numeric spec):

        S_t = S_{t-1}·exp(g_t);  Δ = (v_t − k_t·S_t)·β_t
        S_t += k_t ⊗ Δ;          y_t = q_t·S_t

    The transition is a rank-1 matrix update — not an elementwise decay —
    so this runs as a SEQUENTIAL segment-aware ``lax.scan`` over the
    flattened token axis carrying the slot-indexed state array (the
    chunked parallel form is a later MXU optimization). Segment starts
    at position 0 reset the state; continuing segments read their slot.
    """
    T = q.shape[0]
    S = metadata.kv_lens.shape[0]
    seq_of, pos_in_seg, is_start, _ = _token_segments(
        metadata.cu_q_lens, metadata.num_seqs, metadata.positions, T, S)
    slots = jnp.clip(metadata.seq_slots, 0)
    slot_of = slots[seq_of]
    fresh = is_start & (metadata.positions == 0)

    qf = q.astype(jnp.float32)
    kf = k.astype(jnp.float32)
    vf = v.astype(jnp.float32)
    gf = jnp.exp(g.astype(jnp.float32))
    bf = beta.astype(jnp.float32)

    def step(state_all, t):
        s = state_all[slot_of[t]]                        # [vh, dk, dv]
        s = jnp.where(fresh[t], jnp.zeros_like(s), s)
        s = s * gf[t][:, None, None]
        kv_mem = jnp.einsum("hk,hkv->hv", kf[t], s)
        delta = (vf[t] - kv_mem) * bf[t][:, None]
        s = s + kf[t][:, :, None] * delta[:, None, :]
        y = jnp.einsum("hk,hkv->hv", qf[t], s)
        state_all = state_all.at[slot_of[t]].set(s.astype(state_all.dtype))
        return state_all, y

    state, ys = jax.lax.scan(step, state.astype(jnp.float32),
                             jnp.arange(T))
    return ys.astype(q.dtype), state
