#!/usr/bin/env python
"""Weight-streaming ceiling for decode-shaped GEMM chains.

The decode window's weights+sampling floor measures 6.5ms for 2.25GB
of weights (~350 GB/s — half the 721 GB/s streaming canary). This
probe asks whether that's an XLA/MXU property of M=256 GEMM chains or
our step's overhead: it runs the bench geometry's per-layer GEMM
sequence (q,k,v,o,gate,up,down + lm_head) over 22 layers of distinct
bf16 weights and times the chain at several M.
"""
import time

import numpy as np
import jax
import jax.numpy as jnp

H, INTER, KV, VOCAB, L = 2048, 5632, 512, 32000, 22


def main():
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    W = {
        "q": jax.random.normal(ks[0], (L, H, H), jnp.bfloat16),
        "k": jax.random.normal(ks[1], (L, H, KV), jnp.bfloat16),
        "v": jax.random.normal(ks[2], (L, H, KV), jnp.bfloat16),
        "o": jax.random.normal(ks[3], (L, H, H), jnp.bfloat16),
        "g": jax.random.normal(ks[4], (L, H, INTER), jnp.bfloat16),
        "u": jax.random.normal(ks[5], (L, H, INTER), jnp.bfloat16),
        "d": jax.random.normal(ks[6], (L, INTER, H), jnp.bfloat16),
    }
    lm = jax.random.normal(ks[7], (H, VOCAB), jnp.bfloat16)
    wbytes = sum(a.nbytes for a in W.values()) + lm.nbytes + \
        VOCAB * H * 2   # embed table the real model also reads
    print(f"weights {wbytes/1e9:.2f} GB", flush=True)

    for M in (128, 256, 512):
        x = jax.random.normal(jax.random.PRNGKey(1), (M, H), jnp.bfloat16)

        @jax.jit
        def step(x, W, lm):
            def layer(h, lw):
                q = h @ lw["q"]
                k = h @ lw["k"]
                v = h @ lw["v"]
                h = h + (q + jnp.pad(k + v, ((0, 0), (0, H - KV)))) \
                    @ lw["o"] * 1e-3
                g = jax.nn.silu((h @ lw["g"]).astype(jnp.float32)) \
                    .astype(jnp.bfloat16)
                h = h + (g * (h @ lw["u"])) @ lw["d"] * 1e-3
                return h, None
            h, _ = jax.lax.scan(layer, x, W)
            logits = h @ lm
            return jnp.argmax(logits, -1)

        np.asarray(step(x, W, lm))
        best = 1e9
        for _ in range(5):
            t0 = time.monotonic()
            np.asarray(step(x, W, lm))   # fetch forces completion
            best = min(best, time.monotonic() - t0)
        rtt = 0.030
        eff = wbytes / max(best - rtt, 1e-9)
        print(f"M={M}: {best*1e3:.2f}ms  rtt-corr {eff/1e9:.0f} GB/s",
              flush=True)


if __name__ == "__main__":
    main()
