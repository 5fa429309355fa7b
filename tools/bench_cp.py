#!/usr/bin/env python
"""Context-parallel attention timing on the real chip (VERDICT r3 #9).

Only ONE chip is attached, so this times the PER-RANK work of each CP
mode at a long-context decode shape and reports the modeled per-step
cost: for RING/HELIX with cp ranks, each rank holds 1/cp of the KV
pages and the ring pass runs cp sequential shard-attention hops (the
ICI permute that overlaps them on real silicon is NOT timed here —
documented caveat); ULYSSES runs full-KV attention on 1/cp of the
heads. STAR prunes context blocks to anchor+local. Dense is the
baseline. Prints one JSON line with per-mode decode-attention ms.

Env: CP (2), CTX (8192), BATCH (8), HEADS (16), KV (4).
"""
import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from tensorrt_llm_tpu.ops.attention import (AttentionMetadata,
                                                ragged_paged_attention)

    cp = int(os.environ.get("CP", "2"))
    ctx = int(os.environ.get("CTX", "8192"))
    B = int(os.environ.get("BATCH", "8"))
    nq = int(os.environ.get("HEADS", "16"))
    nkv = int(os.environ.get("KV", "4"))
    # in-repo decode kernel (the framework's long-context decode path;
    # the library RPA kernel caps pages_per_seq at 16 and fails to
    # compile past it)
    hd, ps = 128, 32
    P = ctx // ps
    rng = np.random.default_rng(0)

    def pool(pages):
        return jnp.asarray(
            rng.standard_normal((pages, ps, 2 * nkv, hd)) * 0.1,
            jnp.bfloat16)

    def md(n_seqs, kv_len, pages_per_seq, pages_total):
        tbl = rng.integers(0, pages_total,
                           (n_seqs, pages_per_seq)).astype(np.int32)
        return AttentionMetadata(
            kv_lens=jnp.full((n_seqs,), kv_len, jnp.int32),
            page_indices=jnp.asarray(tbl),
            cu_q_lens=jnp.arange(n_seqs + 1, dtype=jnp.int32),
            num_seqs=jnp.asarray([n_seqs], jnp.int32),
            slot_mapping=jnp.full((n_seqs,), pages_total * ps, jnp.int32),
            positions=jnp.full((n_seqs,), kv_len - 1, jnp.int32),
            logits_indices=jnp.arange(n_seqs, dtype=jnp.int32))

    def timeit(fn, *args, n=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.monotonic()
        for _ in range(n):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.monotonic() - t0) / n * 1e3

    sm = hd ** -0.5
    results = {}

    # dense: full KV per rank
    kvp = pool(B * P + 8)
    q = jnp.asarray(rng.standard_normal((B, nq, hd)) * 0.1, jnp.bfloat16)
    f = jax.jit(lambda q, kv, m: ragged_paged_attention(
        q, kv, m, sm_scale=sm, backend="hybrid_decode"))
    results["dense_ms"] = timeit(f, q, kvp, md(B, ctx, P, B * P + 8))

    # RING/HELIX per-rank shard: 1/cp of KV, cp sequential hops
    kvs = pool(B * P // cp + 8)
    shard_md = md(B, ctx // cp, P // cp, B * P // cp + 8)
    fs = jax.jit(lambda q, kv, m: ragged_paged_attention(
        q, kv, m, sm_scale=sm, backend="hybrid_decode"))
    one_hop = timeit(fs, q, kvs, shard_md)
    results["ring_per_rank_ms"] = one_hop * cp       # sequential bound
    results["ring_hop_ms"] = one_hop                 # overlapped bound

    # ULYSSES: full KV, 1/cp of the q/kv heads per rank
    qh = q[:, :nq // cp]
    kvh = kvp[:, :, :2 * max(1, nkv // cp)]
    fu = jax.jit(lambda q, kv, m: ragged_paged_attention(
        q, kv, m, sm_scale=sm, backend="hybrid_decode"))
    results["ulysses_per_rank_ms"] = timeit(
        fu, qh, kvh, md(B, ctx, P, B * P + 8))

    # STAR/sparse: top-k pages (anchor + relevant + local)
    keep = 16
    from tensorrt_llm_tpu.ops.sparse_attention import (
        sparse_paged_decode_attention)
    fsp = jax.jit(lambda q, kv, m: sparse_paged_decode_attention(
        q, kv, m, sm_scale=sm, keep_pages=keep))
    results["sparse_topk_ms"] = timeit(fsp, q, kvp,
                                       md(B, ctx, P, B * P + 8))

    results = {k: round(v, 2) for k, v in results.items()}
    print(json.dumps({
        "metric": f"decode attention ms/step ctx{ctx} bs{B} cp{cp}",
        **results,
        "note": "single-chip per-rank timing; ring ICI permute overlap "
                "not modeled (virtual-slice caveat)",
    }), flush=True)


if __name__ == "__main__":
    main()
