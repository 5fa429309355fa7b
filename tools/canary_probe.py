#!/usr/bin/env python
"""Chip canary diagnosis: RTT + streaming BW + matmul peak at several
chain lengths, with and without RTT correction (the round-5 roofline
denominator fix — the old 8-step canary folded one tunnel RTT into a
33ms measurement and under-read HBM bandwidth ~2x)."""
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    x4 = jnp.ones((4,), jnp.bfloat16)
    trivial = jax.jit(lambda x: x + 1)
    np.asarray(trivial(x4))
    rtts = []
    for _ in range(5):
        t0 = time.monotonic()
        np.asarray(trivial(x4))
        rtts.append(time.monotonic() - t0)
    rtt = min(rtts)
    print(f"RTT: {rtt*1e3:.1f}ms  all={['%.1f' % (r*1e3) for r in rtts]}",
          flush=True)

    n = int(128e6)   # 256MB bf16
    x = jnp.ones((n,), jnp.bfloat16)
    for L in (8, 64):
        @jax.jit
        def chain(x, L=L):
            def body(x, _):
                return x + 1, None
            x, _ = jax.lax.scan(body, x, None, length=L)
            return x[:4]
        np.asarray(chain(x))
        best = 1e9
        for _ in range(3):
            t0 = time.monotonic()
            np.asarray(chain(x))
            best = min(best, time.monotonic() - t0)
        print(f"chain L={L}: {best*1e3:.1f}ms "
              f"raw={L*2*n*2/best/1e9:.0f}GB/s "
              f"rtt-corr={L*2*n*2/max(best-rtt,1e-9)/1e9:.0f}GB/s",
              flush=True)

    m = 4096
    a = jnp.ones((m, m), jnp.bfloat16)
    b = jnp.ones((m, m), jnp.bfloat16)
    for L in (16, 96):
        @jax.jit
        def mm(a, b, L=L):
            def body(a, _):
                return jnp.tanh(a @ b), None
            a, _ = jax.lax.scan(body, a, None, length=L)
            return a[:2, :2]
        np.asarray(mm(a, b))
        best = 1e9
        for _ in range(2):
            t0 = time.monotonic()
            np.asarray(mm(a, b))
            best = min(best, time.monotonic() - t0)
        print(f"matmul L={L}: {best*1e3:.1f}ms  "
              f"{L*2*m**3/max(best-rtt,1e-9)/1e12:.0f} TFLOP/s",
              flush=True)


if __name__ == "__main__":
    main()
