"""True pipeline parallelism: micro-batched stage execution with
``ppermute`` hidden-state handoff.

TPU-native analog of the reference's pipelined executor loop
(reference: tensorrt_llm/_torch/pyexecutor/py_executor.py:1811
``_executor_loop_pp`` — micro-batch queues + stage-to-stage
send/recv over NCCL). On TPU the whole pipeline schedule lives inside
ONE jitted program: a ``shard_map`` manual over the "pp" mesh axis
(other axes — "tp", "cp", "dp" — stay automatic, so GSPMD still
partitions the per-stage compute), with a ``lax.scan`` over pipeline
ticks and a ``ppermute`` ring rotation between stages. GPipe schedule:
M micro-batches over S stages, bubble fraction (S-1)/(M+S-1).

Layer-to-stage assignment is the stacked-layer-array sharding itself:
params and KV pools carry a leading [num_layers] dim sharded over
"pp", so each device's shard *is* its stage's layer block — no
explicit layer ranges needed (they coincide with Mapping.pp_layers for
even splits).
"""
from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

try:
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def pipeline_forward(stage_fn: Callable,
                     h_mb: jax.Array,
                     layer_params: Any,
                     kv_pages: Any,
                     metadata_mb: Any,
                     *,
                     mesh,
                     pp_size: int,
                     layer_pspec,
                     kv_pspec,
                     oob_slot: int):
    """Run ``stage_fn`` over all micro-batches with a GPipe schedule.

    Args:
      stage_fn: ``(local_layers, h[Tm,H], local_kv, md) -> (h, local_kv)``
        — runs this stage's layer block on one micro-batch. Executes
        inside the pp-manual region: ``local_layers``/``local_kv`` are
        the per-stage shards; any tp/cp axes remain GSPMD-automatic.
      h_mb: [M, Tm, H] embedded micro-batch inputs (stage 0 consumes).
      layer_params: layer-stacked param pytree (leading dim num_layers).
      kv_pages: layer-stacked KV pool pytree.
      metadata_mb: per-micro-batch metadata pytree, each leaf stacked on
        a leading M axis. Must contain a ``slot_mapping`` leaf (masked
        to ``oob_slot`` on invalid ticks so KV writes drop).
      layer_pspec / kv_pspec: PartitionSpecs of layer_params / kv_pages
        (leading dim must be "pp"-sharded).
      oob_slot: out-of-bounds slot id used to suppress KV writes.

    Returns: (h_out [M, Tm, H] final-stage hidden states, kv_pages).
    """
    import dataclasses as _dc

    from jax.sharding import PartitionSpec as P

    M = h_mb.shape[0]
    S = pp_size
    nticks = M + S - 1

    def pp_region(h_all, layers_l, kv_l, md_all):
        sidx = jax.lax.axis_index("pp")
        fwd = [(i, (i + 1) % S) for i in range(S)]

        def tick(carry, t):
            h_in, kv, out_buf = carry
            mb = t - sidx
            valid = (mb >= 0) & (mb < M)
            mb_c = jnp.clip(mb, 0, M - 1)
            md = jax.tree.map(lambda x: x[mb_c], md_all)
            # stage 0 reads the fresh embedding; later stages consume
            # the hidden state handed over by the previous stage
            h_stage = jnp.where(sidx == 0, h_all[mb_c], h_in)
            # invalid ticks must not dirty the KV pool: retarget all
            # writes at the drop slot
            sm = jnp.where(valid, md.slot_mapping, oob_slot)
            md = _dc.replace(md, slot_mapping=sm)
            h_out, kv = stage_fn(layers_l, h_stage, kv, md)
            h_out = jnp.where(valid, h_out, h_in)
            # the LAST stage's completed micro-batch lands in out_buf
            done = valid & (sidx == S - 1)
            out_buf = jnp.where(
                done, out_buf.at[mb_c].set(h_out), out_buf)
            h_next = jax.lax.ppermute(h_out, "pp", fwd)
            return (h_next, kv, out_buf), None

        h0 = jnp.zeros_like(h_all[0])
        out0 = jnp.zeros_like(h_all)
        (h_fin, kv_l, out_buf), _ = jax.lax.scan(
            tick, (h0, kv_l, out0), jnp.arange(nticks))
        # only the last stage holds real outputs; psum the masked
        # buffers so every pp rank returns the full [M, Tm, H].
        # f32 accumulate: exact (S-1 zero addends) and dodges the CPU
        # backend's bf16 AllReducePromotion crash
        dt = out_buf.dtype
        out_buf = jnp.where(sidx == S - 1, out_buf,
                            jnp.zeros_like(out_buf))
        out_buf = jax.lax.psum(out_buf.astype(jnp.float32), "pp")
        return out_buf.astype(dt), kv_l

    def manual_only(spec):
        # partial-manual shard_map: in_specs may reference only the
        # manual axes; tp/cp/dp shardings stay automatic (GSPMD)
        return P(*(("pp" if ax == "pp" else None) for ax in spec))

    md_specs = jax.tree.map(lambda _: P(), metadata_mb)
    return _shard_map(
        pp_region, mesh=mesh,
        in_specs=(P(), jax.tree.map(manual_only, layer_pspec,
                                    is_leaf=lambda x: isinstance(x, P)),
                  manual_only(kv_pspec), md_specs),
        out_specs=(P(), manual_only(kv_pspec)),
        axis_names=frozenset({"pp"}),
        check_vma=False)(h_mb, layer_params, kv_pages, metadata_mb)


def split_metadata(md, M: int, num_tokens: int):
    """Split one iteration's AttentionMetadata into M token-contiguous
    micro-batches (jnp — runs inside the jitted step).

    Per-token leaves (slot_mapping, positions) are sliced; per-sequence
    leaves are adjusted so each micro-batch is self-consistent:
    ``cu_q_lens`` clipped into the slice, ``kv_lens`` reduced by the
    tokens that fall in LATER micro-batches (those keys don't exist yet
    when this micro-batch's queries run — causality over the split).
    Returns a metadata pytree with every leaf gaining a leading M axis.
    """
    Tm = num_tokens // M
    kv_lens = md.kv_lens
    cu = md.cu_q_lens
    S = kv_lens.shape[0]
    outs = []
    for m in range(M):
        t0, t1 = m * Tm, (m + 1) * Tm
        cu_m = jnp.clip(cu - t0, 0, Tm).astype(jnp.int32)
        later = jnp.maximum(0, cu[1:S + 1] - t1)
        kv_m = (kv_lens - later).astype(jnp.int32)
        outs.append(md.__class__(
            kv_lens=kv_m,
            page_indices=md.page_indices,
            cu_q_lens=cu_m,
            num_seqs=md.num_seqs,
            slot_mapping=jax.lax.slice_in_dim(md.slot_mapping, t0, t1),
            positions=jax.lax.slice_in_dim(md.positions, t0, t1),
            logits_indices=md.logits_indices,
            seq_slots=md.seq_slots))
    return jax.tree.map(lambda *xs: jnp.stack(xs), *outs)
