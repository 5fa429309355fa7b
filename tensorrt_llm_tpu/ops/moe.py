"""Mixture-of-Experts compute.

TPU-native analog of the reference fused-MoE stack (reference:
tensorrt_llm/_torch/modules/fused_moe/ — CUTLASS grouped GEMM backend
fused_moe_cutlass.py, routing.py). Two execution paths:

  * ``ragged`` (default on a single device): sort tokens by expert and run
    grouped GEMMs via ``jax.lax.ragged_dot`` — the XLA-native analog of
    the reference's grouped CUTLASS GEMM (moe_gemm). MXU-efficient, no
    wasted FLOPs.
  * ``dense``: one-hot dispatch einsum over all experts. E× FLOP waste but
    trivially partitionable by GSPMD — used when experts are sharded
    (EP/TP) until the shard_map ragged all-to-all lands.

Routing: top-k softmax with renormalization (Mixtral semantics;
reference: routing.py RenormalizeMoeRoutingMethod).
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp


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
            backend: str = "auto", mapping=None) -> jax.Array:
    """Full MoE block: route → dispatch → expert MLP → combine."""
    router_logits = jnp.dot(x, router_w, preferred_element_type=jnp.float32)
    probs, expert_idx = topk_routing(router_logits, top_k)
    if backend == "auto":
        multi = mapping is not None and mapping.world_size > 1
        backend = "dense" if multi else "ragged"
    fn = moe_mlp_ragged if backend == "ragged" else moe_mlp_dense
    return fn(x, w_gate, w_up, w_down, probs, expert_idx)
