"""Mixture-of-Experts compute.

TPU-native analog of the reference fused-MoE stack (reference:
tensorrt_llm/_torch/modules/fused_moe/ — CUTLASS grouped GEMM backend
fused_moe_cutlass.py, routing.py, EP dispatch moeAlltoAllKernels.cu).
Execution paths:

  * ``ragged`` (single device): sort tokens by expert and run grouped
    GEMMs via ``jax.lax.ragged_dot`` — the XLA-native analog of the
    reference's grouped CUTLASS GEMM (moe_gemm). MXU-efficient, no
    wasted FLOPs.
  * ``ep`` (expert parallel, default under a mesh): experts sharded over
    the mesh axes, tokens replicated. Under ``shard_map`` each device
    sorts its *locally routed* tokens to the front and runs the grouped
    GEMMs only over those rows, then one ``psum`` combines expert
    outputs. This is the TPU-native answer to the reference's
    all-to-all dispatch (moeAlltoAllKernels.cu / DeepEP): with
    replicated activations the dispatch is a local gather — zero
    communication — and the combine is a single all-reduce riding ICI.
    A true ragged all-to-all is only needed when tokens are DP-sharded
    (attention-DP); that path rides ``jax.lax.ragged_all_to_all`` and
    lands with the ADP request router.
  * ``dense``: one-hot dispatch einsum over all experts. E× FLOP waste;
    kept as the GSPMD-partitionable fallback and for numerics tests.

Routing: top-k softmax with renormalization (Mixtral semantics;
reference: routing.py RenormalizeMoeRoutingMethod).
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Union

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def topk_routing(router_logits: jax.Array, top_k: int,
                 renormalize: bool = True):
    """Returns (probs [T, k], expert_idx i32[T, k])."""
    probs = jax.nn.softmax(router_logits.astype(jnp.float32), axis=-1)
    top_p, top_i = jax.lax.top_k(probs, top_k)
    if renormalize:
        top_p = top_p / jnp.sum(top_p, axis=-1, keepdims=True)
    return top_p, top_i.astype(jnp.int32)


def moe_mlp_ragged(x: jax.Array,             # [T, H]
                   w_gate: jax.Array,        # [E, H, I]
                   w_up: jax.Array,          # [E, H, I]
                   w_down: jax.Array,        # [E, I, H]
                   probs: jax.Array,         # [T, k]
                   expert_idx: jax.Array,    # i32[T, k]
                   ) -> jax.Array:
    """Grouped-GEMM MoE via token sort + lax.ragged_dot."""
    T, H = x.shape
    E = w_gate.shape[0]
    k = expert_idx.shape[1]
    M = T * k

    flat_expert = expert_idx.reshape(M)
    order = jnp.argsort(flat_expert)                    # stable
    tok_of = order // k
    xs = x[tok_of]                                      # [M, H]
    sorted_expert = flat_expert[order]
    group_sizes = jnp.bincount(sorted_expert, length=E).astype(jnp.int32)

    h_gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)
    h_up = jax.lax.ragged_dot(xs, w_up, group_sizes)
    h = (jax.nn.silu(h_gate.astype(jnp.float32)).astype(x.dtype) * h_up)
    y = jax.lax.ragged_dot(h, w_down, group_sizes)      # [M, H]

    w = probs.reshape(M)[order].astype(y.dtype)
    out = jnp.zeros((T, H), y.dtype).at[tok_of].add(y * w[:, None])
    return out.astype(x.dtype)


def moe_mlp_ep(x: jax.Array,              # [T, H] (replicated)
               w_gate: jax.Array,         # [E, H, I] sharded over ep axes
               w_up: jax.Array,
               w_down: jax.Array,         # [E, I, H]
               probs: jax.Array,          # [T, k] (replicated)
               expert_idx: jax.Array,     # i32[T, k]
               mesh,
               ep_axes: Union[str, Sequence[str]] = "tp",
               ) -> jax.Array:
    """Expert-parallel MoE under shard_map (see module docstring).

    Each shard owns ``E_local = E / prod(ep_axes sizes)`` contiguous
    experts. Locally-routed (token, expert) pairs are sorted to the
    front; ``ragged_dot`` group sizes cover only those rows, so per-shard
    GEMM work is proportional to local routed load (the role of the
    reference's grouped GEMM after a2a dispatch, fused_moe_cutlass.py).
    Combine: one f32 psum over the ep axes.
    """
    if isinstance(ep_axes, str):
        ep_axes = (ep_axes,)
    ep_axes = tuple(a for a in ep_axes if mesh.shape.get(a, 1) > 1)
    if not ep_axes:
        return moe_mlp_ragged(x, w_gate, w_up, w_down, probs, expert_idx)
    nshards = 1
    for a in ep_axes:
        nshards *= mesh.shape[a]
    if w_gate.shape[0] % nshards != 0:
        # experts don't divide the shard count: dense GSPMD fallback
        return moe_mlp_dense(x, w_gate, w_up, w_down, probs, expert_idx)

    def local_moe(x, w_gate, w_up, w_down, probs, expert_idx):
        E_local = w_gate.shape[0]
        shard = jax.lax.axis_index(ep_axes)
        T, H = x.shape
        k = expert_idx.shape[1]
        M = T * k
        flat = expert_idx.reshape(M) - shard * E_local
        is_local = (flat >= 0) & (flat < E_local)
        # non-local pairs sort to a trailing bucket past every group
        key = jnp.where(is_local, flat, E_local)
        order = jnp.argsort(key)
        tok_of = order // k
        xs = x[tok_of]
        group_sizes = jnp.bincount(
            jnp.where(is_local, flat, E_local), length=E_local + 1
        )[:E_local].astype(jnp.int32)
        m_local = jnp.sum(group_sizes)
        h_gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)
        h_up = jax.lax.ragged_dot(xs, w_up, group_sizes)
        h = (jax.nn.silu(h_gate.astype(jnp.float32)).astype(x.dtype) * h_up)
        y = jax.lax.ragged_dot(h, w_down, group_sizes)      # [M, H]
        # rows past m_local belong to no group: contents unspecified —
        # mask before combining (NaN * 0 would poison the scatter-add)
        row_ok = jnp.arange(M, dtype=jnp.int32) < m_local
        w = jnp.where(is_local, probs.reshape(M), 0.0)[order]
        w = jnp.where(row_ok, w, 0.0).astype(jnp.float32)
        out = jnp.zeros((T, H), jnp.float32).at[tok_of].add(
            jnp.where(row_ok[:, None], y, 0).astype(jnp.float32)
            * w[:, None])
        out = jax.lax.psum(out, ep_axes)
        return out.astype(x.dtype)

    espec = P(tuple(ep_axes), None, None)
    return _shard_map(
        local_moe, mesh=mesh,
        in_specs=(P(), espec, espec, P(tuple(ep_axes), None, None),
                  P(), P()),
        out_specs=P())(x, w_gate, w_up, w_down, probs, expert_idx)


def moe_mlp_adp(x: jax.Array,             # [T_local, H] dp-SHARDED tokens
                w_gate: jax.Array,        # [E, H, I] sharded over dp axis
                w_up: jax.Array,
                w_down: jax.Array,        # [E, I, H]
                probs: jax.Array,         # [T_local, k] dp-sharded
                expert_idx: jax.Array,    # i32[T_local, k]
                mesh,
                dp_axis: str = "dp",
                capacity: Optional[int] = None,
                use_ragged: Optional[bool] = None) -> jax.Array:
    """Attention-DP MoE dispatch/combine: tokens sharded over ``dp_axis``
    and experts sharded over the SAME devices (the reference's DEPn
    layout — attention-DP with EP across n GPUs,
    moeAlltoAllKernels.cu / DeepEP dispatch).

    Each shard sorts its (token, expert) pairs by owning shard, ships
    them with an all-to-all, runs the grouped GEMMs over the received
    rows, and ships the expert outputs back with the mirrored
    all-to-all before the weighted scatter-combine.

    Two transports:
      * padded ``lax.all_to_all`` (default): per-destination chunks pad
        to ``capacity`` rows (None = T_local*k, lossless). Static
        shapes — the GShard/Switch expert-capacity idiom, XLA-native on
        every backend. Overflow pairs beyond a finite capacity drop to
        zero contribution (standard capacity-drop semantics).
      * ``jax.lax.ragged_all_to_all`` (``use_ragged=True``; default on
        TPU): exact-size transfers, no padding traffic. Unsupported by
        XLA:CPU, so CPU-mesh tests and the multichip dryrun take the
        padded path.
    """
    if mesh.shape.get(dp_axis, 1) <= 1:
        return moe_mlp_ragged(x, w_gate, w_up, w_down, probs, expert_idx)
    R = mesh.shape[dp_axis]
    E = w_gate.shape[0]
    if E % R != 0:
        raise ValueError(f"ADP MoE needs experts ({E}) divisible by the "
                         f"dp axis ({R})")
    E_local = E // R
    if use_ragged is None:
        use_ragged = jax.default_backend() == "tpu"

    def local_moe(x, w_gate, w_up, w_down, probs, expert_idx):
        r = jax.lax.axis_index(dp_axis)
        T_l, H = x.shape
        k = expert_idx.shape[1]
        M = T_l * k
        C = capacity or M
        flat = expert_idx.reshape(M)
        dest = flat // E_local
        order = jnp.argsort(dest)               # pairs grouped by dest
        dest_s = dest[order]
        local_e_s = (flat - dest * E_local)[order]
        tok_of = order // k
        send_sizes = jnp.bincount(dest, length=R).astype(jnp.int32)
        off = jnp.concatenate([jnp.zeros(1, jnp.int32),
                               jnp.cumsum(send_sizes)[:-1]])
        within = jnp.arange(M, dtype=jnp.int32) - off[dest_s]
        S_all = jax.lax.all_gather(send_sizes, dp_axis)     # [R, R]

        if use_ragged:
            # exact-size transfers: sender computes its landing offset in
            # each receiver's buffer from the gathered size matrix
            recv_sizes = S_all[:, r]
            out_off = (jnp.cumsum(S_all, axis=0) - S_all)[r, :] \
                .astype(jnp.int32)
            buf = jnp.zeros((R * C, H), x.dtype)
            xs = x[tok_of]
            payload = jnp.concatenate(
                [xs, probs.reshape(M)[order][:, None].astype(x.dtype),
                 local_e_s[:, None].astype(x.dtype)], axis=1)
            pbuf = jnp.zeros((R * C, H + 2), x.dtype)
            got = jax.lax.ragged_all_to_all(
                payload, pbuf, off, send_sizes, out_off,
                recv_sizes.astype(jnp.int32), axis_name=dp_axis)
            roff = jnp.concatenate([jnp.zeros(1, jnp.int32),
                                    jnp.cumsum(recv_sizes)[:-1]])
            n_recv = jnp.sum(recv_sizes)
            rrow = jnp.arange(R * C, dtype=jnp.int32)
            rvalid = rrow < n_recv
            xr = got[:, :H]
            pr = got[:, H].astype(jnp.float32)
            er = got[:, H + 1].astype(jnp.int32)
        else:
            # padded chunks: snd[i, c] = c-th pair destined to shard i
            keep = within < C
            xs = x[tok_of]
            snd = jnp.zeros((R, C, H), x.dtype).at[
                jnp.where(keep, dest_s, R), within % C].set(
                    xs, mode="drop")
            pe = jnp.stack([probs.reshape(M)[order].astype(jnp.float32),
                            local_e_s.astype(jnp.float32)], axis=1)
            snd_pe = jnp.full((R, C, 2), -1.0, jnp.float32).at[
                jnp.where(keep, dest_s, R), within % C].set(
                    pe, mode="drop")
            got = jax.lax.all_to_all(snd, dp_axis, 0, 0, tiled=True)
            got_pe = jax.lax.all_to_all(snd_pe, dp_axis, 0, 0, tiled=True)
            got = got.reshape(R * C, H)
            got_pe = got_pe.reshape(R * C, 2)
            # validity: row c of chunk j is live iff c < min(S_all[j,r],C)
            lim = jnp.minimum(S_all[:, r], C)
            rvalid = (jnp.arange(R * C, dtype=jnp.int32) % C) < \
                jnp.repeat(lim, C)
            xr = got
            pr = jnp.where(rvalid, got_pe[:, 0], 0.0)
            er = got_pe[:, 1].astype(jnp.int32)

        # grouped GEMMs over received pairs (invalid rows -> sentinel
        # group E_local, past every real group)
        e_key = jnp.where(rvalid, jnp.clip(er, 0, E_local - 1), E_local)
        order2 = jnp.argsort(e_key)
        xe = xr[order2]
        group_sizes = jnp.bincount(e_key, length=E_local + 1)[
            :E_local].astype(jnp.int32)
        m_live = jnp.sum(group_sizes)
        h_gate = jax.lax.ragged_dot(xe, w_gate, group_sizes)
        h_up = jax.lax.ragged_dot(xe, w_up, group_sizes)
        h = jax.nn.silu(h_gate.astype(jnp.float32)).astype(x.dtype) * h_up
        ye = jax.lax.ragged_dot(h, w_down, group_sizes)
        row_ok = jnp.arange(ye.shape[0], dtype=jnp.int32) < m_live
        ye = jnp.where(row_ok[:, None], ye, 0)
        # unsort to recv order, weight by routing prob
        y = jnp.zeros_like(ye).at[order2].set(ye)
        y = (y.astype(jnp.float32) * pr[:, None]).astype(x.dtype)

        # return trip: mirrored transfer back to the senders
        if use_ragged:
            ret = jnp.zeros((R * C, H), x.dtype)
            # i's chunk to me started at its input offset for me:
            # sum over destinations j < r of S_all[i, j]
            back_out_off = (jnp.cumsum(S_all, axis=1)
                            - S_all)[:, r].astype(jnp.int32)
            ret = jax.lax.ragged_all_to_all(
                y, ret, roff, recv_sizes.astype(jnp.int32),
                back_out_off, send_sizes, axis_name=dp_axis)
            y_pair = ret[off[dest_s] + within]
            pair_ok = jnp.ones((M,), bool)
        else:
            back = jax.lax.all_to_all(y.reshape(R, C, H), dp_axis, 0, 0,
                                      tiled=True).reshape(R * C, H)
            keep = within < C
            y_pair = back[dest_s * C + within % C]
            pair_ok = keep

        out = jnp.zeros((T_l, H), jnp.float32).at[tok_of].add(
            jnp.where(pair_ok[:, None], y_pair, 0).astype(jnp.float32))
        return out.astype(x.dtype)

    dspec = P(dp_axis, None)
    espec = P(dp_axis, None, None)
    return _shard_map(
        local_moe, mesh=mesh,
        in_specs=(dspec, espec, espec, espec, dspec, dspec),
        out_specs=dspec)(x, w_gate, w_up, w_down, probs, expert_idx)


def moe_mlp_wide_ep(x, w_gate_slots, w_up_slots, w_down_slots,
                    probs, expert_idx, rep_count, rep_slots,
                    mesh, ep_axes=("cp", "tp")):
    """Wide-EP MoE (reference: fused_moe_wide_ep.py): weights live as
    REPLICA SLOTS ``W[placement]`` sharded over the ep axes; each
    (token, expert) pick round-robins across the expert's replicas so a
    hot expert's traffic splits across shards. Compute is the same
    shard_map grouped-GEMM as moe_mlp_ep, keyed by slot ids."""
    if isinstance(ep_axes, str):
        ep_axes = (ep_axes,)
    ep_axes = () if mesh is None else tuple(
        a for a in ep_axes if mesh.shape.get(a, 1) > 1)
    T, k = expert_idx.shape
    # replica pick: deterministic round-robin on token index
    tok = jnp.arange(T, dtype=jnp.int32)[:, None]
    rc = rep_count[expert_idx]                       # [T, k]
    pick = (tok + jnp.arange(k, dtype=jnp.int32)[None]) % jnp.maximum(rc, 1)
    slot_idx = rep_slots[expert_idx, pick]           # [T, k] slot ids
    if not ep_axes:
        # single shard: slots ARE the (replicated) expert table
        return moe_mlp_ragged(x, w_gate_slots, w_up_slots, w_down_slots,
                              probs, slot_idx)

    def local_moe(x, w_gate, w_up, w_down, probs, slot_idx):
        S_local = w_gate.shape[0]
        shard = jax.lax.axis_index(ep_axes)
        T, H = x.shape
        k = slot_idx.shape[1]
        M = T * k
        flat = slot_idx.reshape(M) - shard * S_local
        is_local = (flat >= 0) & (flat < S_local)
        key = jnp.where(is_local, flat, S_local)
        order = jnp.argsort(key)
        tok_of = order // k
        xs = x[tok_of]
        group_sizes = jnp.bincount(
            jnp.where(is_local, flat, S_local), length=S_local + 1
        )[:S_local].astype(jnp.int32)
        m_local = jnp.sum(group_sizes)
        h_gate = jax.lax.ragged_dot(xs, w_gate, group_sizes)
        h_up = jax.lax.ragged_dot(xs, w_up, group_sizes)
        h = (jax.nn.silu(h_gate.astype(jnp.float32)).astype(x.dtype) * h_up)
        y = jax.lax.ragged_dot(h, w_down, group_sizes)
        row_ok = jnp.arange(M, dtype=jnp.int32) < m_local
        w = jnp.where(is_local, probs.reshape(M), 0.0)[order]
        w = jnp.where(row_ok, w, 0.0).astype(jnp.float32)
        out = jnp.zeros((T, H), jnp.float32).at[tok_of].add(
            jnp.where(row_ok[:, None], y, 0).astype(jnp.float32)
            * w[:, None])
        out = jax.lax.psum(out, ep_axes)
        return out.astype(x.dtype)

    espec = P(tuple(ep_axes), None, None)
    return _shard_map(
        local_moe, mesh=mesh,
        in_specs=(P(), espec, espec, espec, P(), P()),
        out_specs=P())(x, w_gate_slots, w_up_slots, w_down_slots,
                       probs, slot_idx)


def moe_mlp_dense(x: jax.Array, w_gate: jax.Array, w_up: jax.Array,
                  w_down: jax.Array, probs: jax.Array,
                  expert_idx: jax.Array) -> jax.Array:
    """One-hot dense MoE (GSPMD-partitionable over the expert axis)."""
    T, H = x.shape
    E = w_gate.shape[0]
    # combine weights per expert: [T, E]
    combine = jnp.zeros((T, E), jnp.float32)
    combine = combine.at[
        jnp.arange(T)[:, None], expert_idx].add(probs.astype(jnp.float32))
    h_gate = jnp.einsum("th,ehi->tei", x, w_gate,
                        preferred_element_type=jnp.float32)
    h_up = jnp.einsum("th,ehi->tei", x, w_up,
                      preferred_element_type=jnp.float32)
    h = jax.nn.silu(h_gate) * h_up
    y = jnp.einsum("tei,eih->teh", h.astype(x.dtype), w_down,
                   preferred_element_type=jnp.float32)
    out = jnp.einsum("teh,te->th", y, combine)
    return out.astype(x.dtype)


def moe_mlp(x, w_gate, w_up, w_down, router_w, top_k: int,
            backend: str = "auto", mapping=None, mesh=None,
            ep_axes: Union[str, Sequence[str]] = ("cp", "tp"),
            renormalize: bool = True) -> jax.Array:
    """Full MoE block: route → dispatch → expert MLP → combine.
    ``renormalize=False`` keeps raw softmax weights on the selected
    experts (Qwen2-MoE norm_topk_prob=False semantics)."""
    router_logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    probs, expert_idx = topk_routing(router_logits, top_k,
                                     renormalize=renormalize)
    if backend == "auto":
        multi = mapping is not None and mapping.world_size > 1
        if (multi and mesh is not None
                and getattr(mapping, "enable_attention_dp", False)
                and mesh.shape.get("dp", 1) > 1
                and w_gate.shape[0] % mesh.shape["dp"] == 0):
            # attention-DP: tokens dp-sharded, experts on the same
            # devices, all-to-all dispatch (reference DEPn layout)
            backend = "adp"
        else:
            backend = ("ep" if mesh is not None else "dense") if multi \
                else "ragged"
    if backend == "adp":
        return moe_mlp_adp(x, w_gate, w_up, w_down, probs, expert_idx,
                           mesh, dp_axis="dp")
    if backend == "ep":
        return moe_mlp_ep(x, w_gate, w_up, w_down, probs, expert_idx,
                          mesh, ep_axes=ep_axes)
    fn = moe_mlp_ragged if backend == "ragged" else moe_mlp_dense
    return fn(x, w_gate, w_up, w_down, probs, expert_idx)
