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
        backend = ("ep" if mesh is not None else "dense") if multi \
            else "ragged"
    if backend == "ep":
        return moe_mlp_ep(x, w_gate, w_up, w_down, probs, expert_idx,
                          mesh, ep_axes=ep_axes)
    fn = moe_mlp_ragged if backend == "ragged" else moe_mlp_dense
    return fn(x, w_gate, w_up, w_down, probs, expert_idx)
