#!/usr/bin/env python
"""Chip capability probe: streaming HBM bandwidth + bf16 matmul peak.

The tunnel-attached chip delivers a session-dependent fraction of a
production v5e (BASELINE.md: 810 GB/s, 197 TFLOP/s bf16); perf grading
needs BOTH measured numbers — decode is bandwidth-bound, prefill is
compute-bound, so the pass-time floor is
    decode_bytes / BW + prefill_flops / FLOPS.
Prints one JSON line.
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    # 60s smoke first (memory: tunnel wedges ~1/4 sessions)
    t0 = time.monotonic()
    x = jnp.ones((256, 256), jnp.bfloat16)
    y = jax.jit(lambda a: (a @ a)[:2, :2])(x)
    np.asarray(y)
    print(f"# smoke jit matmul ok in {time.monotonic()-t0:.1f}s",
          file=sys.stderr, flush=True)

    # streaming bandwidth (same shape as bench.measure_hbm_bw)
    n = int(128e6)
    big = jnp.ones((n,), jnp.bfloat16)

    @jax.jit
    def chain(x):
        def body(x, _):
            return x + 1, None
        x, _ = jax.lax.scan(body, x, None, length=8)
        return x[:4]

    np.asarray(chain(big))
    best = 1e9
    for _ in range(3):
        t = time.monotonic()
        np.asarray(chain(big))
        best = min(best, time.monotonic() - t)
    bw = 8 * 2 * n * 2 / best

    # bf16 matmul peak: chained [4096,4096]x[4096,4096] (2.2 TFLOP per
    # chain call, weights resident — measures MXU, not HBM)
    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    b = jnp.ones((m, m), jnp.bfloat16)

    @jax.jit
    def mm(a, b):
        def body(a, _):
            return jnp.tanh(a @ b), None
        a, _ = jax.lax.scan(body, a, None, length=16)
        return a[:2, :2]

    np.asarray(mm(a, b))
    best_mm = 1e9
    for _ in range(3):
        t = time.monotonic()
        np.asarray(mm(a, b))
        best_mm = min(best_mm, time.monotonic() - t)
    flops = 16 * 2 * m**3 / best_mm

    print(json.dumps({"hbm_gbps": round(bw / 1e9, 1),
                      "bf16_tflops": round(flops / 1e12, 1),
                      "backend": jax.default_backend()}), flush=True)


if __name__ == "__main__":
    main()
