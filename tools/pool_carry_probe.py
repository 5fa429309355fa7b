#!/usr/bin/env python
"""Validate the KV-pool threading redesign on the chip.

Compares three formulations of "22 layers each scatter 256 fresh tokens
into a 5.9GB paged pool inside a K-step decode scan":

  ys     — current design: per-layer pool slices ride scan xs/ys
           (hypothesis: the ys re-stacking copies the full pool every
           step — the measured 36ms/step write_kv cost)
  carry  — redesigned: ONE flat [(L*P), ps, c, hd] pool in the scan
           carry, per-layer scatter at layer-offset slots (in-place)
  none   — no KV write at all (floor)

Each variant runs the same double scan (outer K steps, inner L layers)
with a token-of-work matmul so XLA can't collapse the loop. Prints
ms/step per variant.
"""
import os
import sys
import time

import numpy as np

import jax
import jax.numpy as jnp

L, P, PS, C, HD = 22, 4097, 32, 8, 128
S, K = 256, 16


def run(mode):
    pool = jnp.zeros((L, P, PS, C, HD), jnp.bfloat16)
    kv = jnp.ones((S, C, HD), jnp.bfloat16)
    slots = jnp.arange(S, dtype=jnp.int32) * PS  # one slot per page
    w = jnp.ones((HD, HD), jnp.bfloat16)

    @jax.jit
    def step_ys(pool, kv):
        def outer(carry, _):
            pool, kv = carry

            def inner(h, layer_pool):
                flat = layer_pool.reshape(P * PS, C, HD)
                if mode == "ys":
                    flat = flat.at[slots].set(kv, mode="drop")
                new_lp = flat.reshape(P, PS, C, HD)
                h = jnp.tanh(h @ w)
                return h, new_lp
            h, pool = jax.lax.scan(inner, kv, pool)
            return (pool, h), None
        (pool, kv), _ = jax.lax.scan(outer, (pool, kv), None, length=K)
        return pool[0, 0, 0, 0, :2], kv[:2]

    @jax.jit
    def step_carry(pool, kv):
        flatpool = pool.reshape(L * P * PS, C, HD)

        def outer(carry, _):
            fp, kv = carry

            def inner(carry2, l):
                fp, h = carry2
                off = l * (P * PS)
                fp = fp.at[slots + off].set(h.astype(fp.dtype),
                                            mode="drop")
                h = jnp.tanh(h @ w)
                return (fp, h), None
            (fp, h), _ = jax.lax.scan(
                inner, (fp, kv), jnp.arange(L, dtype=jnp.int32))
            return (fp, h), None
        (fp, kv), _ = jax.lax.scan(outer, (flatpool, kv), None, length=K)
        return fp[0, 0, :2], kv[:2]

    fn = step_carry if mode == "carry" else step_ys
    out = jax.block_until_ready(fn(pool, kv))
    best = 1e9
    for _ in range(3):
        t0 = time.monotonic()
        jax.block_until_ready(fn(pool, kv))
        best = min(best, time.monotonic() - t0)
    print(f"{mode:6s}: {best*1e3:8.1f}ms window  {best*1e3/K:6.2f}ms/step",
          flush=True)


if __name__ == "__main__":
    for mode in sys.argv[1:] or ["none", "carry", "ys"]:
        run(mode)
