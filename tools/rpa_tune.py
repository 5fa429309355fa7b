#!/usr/bin/env python
"""Tune the library ragged_paged_attention block sizes for the
pure-decode regime (bs256, ctx~200, hd128, 4 kv heads) — the 11ms/step
attention cost dominates the decode window (tools/step_anatomy.py).

Times ONE kernel call looped 22x (a step's layer count) for several
(num_kv_pages_per_block, num_queries_per_block) pairs.
"""
import functools
import os
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
    ragged_paged_attention)

S, PS, KVH, QH, HD = 256, 32, 4, 16, 128
CTX = int(os.environ.get("TUNE_CTX", "200"))
P_PER_SEQ = 16
L = 22


def main():
    rng = np.random.default_rng(0)
    num_pages = S * P_PER_SEQ + 1
    kv_pages = jnp.asarray(
        rng.normal(size=(num_pages, PS, 2 * KVH, HD)).astype(np.float32),
        jnp.bfloat16)
    q = jnp.asarray(rng.normal(size=(S, QH, HD)).astype(np.float32),
                    jnp.bfloat16)
    kv_lens = jnp.full((S,), CTX, jnp.int32)
    page_indices = jnp.asarray(
        np.arange(S * P_PER_SEQ, dtype=np.int32).reshape(S, P_PER_SEQ))
    cu = jnp.arange(S + 1, dtype=jnp.int32)
    num_seqs = jnp.asarray([S], jnp.int32)

    kv_bytes = S * CTX * 2 * KVH * HD * 2

    def run(kwargs, label):
        @jax.jit
        def call(q, kv_pages):
            def body(c, _):
                o = ragged_paged_attention(
                    q, kv_pages, kv_lens, page_indices, cu, num_seqs,
                    sm_scale=HD ** -0.5, **kwargs)
                return c + o[0, 0, 0].astype(jnp.float32), None
            c, _ = jax.lax.scan(body, jnp.float32(0), None, length=L)
            return c
        try:
            jax.block_until_ready(call(q, kv_pages))
        except Exception as e:
            print(f"{label}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            jax.block_until_ready(call(q, kv_pages))
            best = min(best, time.monotonic() - t0)
        bw = L * kv_bytes / best
        print(f"{label}: {best*1e3:7.1f}ms/22calls "
              f"{best*1e3/L:6.3f}ms/call  eff-BW {bw/1e9:5.0f} GB/s",
              flush=True)

    run({}, "default           ")
    for kpb in (4, 8, 16):
        for qpb in (8, 16, 32, 64):
            run({"num_kv_pages_per_block": kpb,
                 "num_queries_per_block": qpb},
                f"kv_pages/blk={kpb:3d} q/blk={qpb:3d}")


if __name__ == "__main__":
    main()
