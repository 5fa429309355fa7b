#!/usr/bin/env python
"""TPU integration smoke: RPA kernel vs reference backend parity, int8
quantized-KV attention, paged write/gather. Run opportunistically on the
real chip (tests/ run on CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    from tensorrt_llm_tpu.ops.attention import (AttentionMetadata,
                                                ragged_paged_attention,
                                                write_kv)
    rng = np.random.default_rng(0)
    ps, P, H, Hkv, D = 32, 8, 8, 4, 128
    num_pages = 64
    T = 48  # seq0: 40-token prefill; seq1: 8 decode-ish tokens
    S = 4

    q = jnp.asarray(rng.normal(size=(T, H, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(T, Hkv, D)), jnp.bfloat16)
    slots = list(range(40)) + [8 * ps + i for i in range(8)]
    page_indices = np.zeros((S, P), np.int32)
    page_indices[0, :2] = [0, 1]
    page_indices[1, :1] = [8]
    md = AttentionMetadata(
        kv_lens=jnp.asarray([40, 8, 0, 0], jnp.int32),
        page_indices=jnp.asarray(page_indices),
        cu_q_lens=jnp.asarray([0, 40, 48, 48, 48], jnp.int32),
        num_seqs=jnp.asarray([2], jnp.int32),
        slot_mapping=jnp.asarray(slots, jnp.int32),
        positions=jnp.asarray(list(range(40)) + list(range(8)), jnp.int32),
        logits_indices=jnp.asarray([39, 47, 0, 0], jnp.int32))
    sm = float(1.0 / np.sqrt(D))

    # bf16 pools: RPA vs reference
    pools = jnp.zeros((num_pages, ps, 2 * Hkv, D), jnp.bfloat16)
    pools = write_kv(pools, k, v, md.slot_mapping)
    out_rpa = np.asarray(ragged_paged_attention(
        q, pools, md, sm_scale=sm, backend="rpa")).astype(np.float32)
    out_ref = np.asarray(ragged_paged_attention(
        q, pools, md, sm_scale=sm, backend="reference")).astype(np.float32)
    err = np.abs(out_rpa[:48] - out_ref[:48]).max()
    print(f"RPA vs reference max err (bf16): {err:.4f}",
          "OK" if err < 0.05 else "FAIL", flush=True)

    # int8 KV pools with scale
    scale = 0.05
    pools8 = jnp.zeros((num_pages, ps, 2 * Hkv, D), jnp.int8)
    pools8 = write_kv(pools8, k, v, md.slot_mapping,
                      k_scale=scale, v_scale=scale)
    try:
        out_q = np.asarray(ragged_paged_attention(
            q, pools8, md, sm_scale=sm, k_scale=scale, v_scale=scale,
            backend="rpa")).astype(np.float32)
        qerr = np.abs(out_q[:48] - out_ref[:48]).max()
        print(f"RPA int8-KV max err: {qerr:.4f}",
              "OK" if qerr < 0.2 else "FAIL", flush=True)
    except Exception as e:
        print("RPA int8-KV FAILED:", str(e)[:200], flush=True)


if __name__ == "__main__":
    main()
