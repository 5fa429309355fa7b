#!/usr/bin/env python
"""Probe: library RPA kernel with the mixed-window metadata layout.

Reproduces the exact (gen rows + ctx seqs + filler) ragged layout the
mixed decode window feeds ragged_paged_attention, standalone, to
isolate kernel-level failures from window machinery."""
import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental.pallas.ops.tpu.ragged_paged_attention import (
        ragged_paged_attention as rpa)

    Sb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    NC = max(2, min(16, C // 64))
    ps, P = 32, 9              # bench geometry: page 32, 264-token seqs
    import os
    nq = int(os.environ.get("RP_NQ", "16"))
    nkv = int(os.environ.get("RP_NKV", "4"))
    hd = 128
    pages = Sb * P + 64
    T = Sb + C
    S = Sb + NC + 1
    rng = np.random.default_rng(0)

    q = jnp.asarray(rng.standard_normal((T, nq, hd)) * 0.1, jnp.bfloat16)
    kv = jnp.asarray(rng.standard_normal((pages, ps, 2 * nkv, hd)) * 0.1,
                     jnp.bfloat16)

    # gen rows: 1 q token each, mid-sequence kv_lens
    kv_lens = np.zeros(S, np.int32)
    kv_lens[:Sb] = rng.integers(100, 200, Sb)
    cu = np.zeros(S + 2, np.int32)
    cu[1:Sb + 1] = np.arange(1, Sb + 1)
    page_tbl = np.zeros((S, P), np.int32)
    page_tbl[:Sb] = rng.integers(0, pages, (Sb, P))
    # ctx seqs: split C-8 tokens across NC seqs; filler takes the rest
    per = (C - 8) // NC
    used = 0
    for r in range(NC):
        kv_lens[Sb + r] = 128 + per          # chunk continues a prefix
        cu[Sb + r + 1] = Sb + used + per
        page_tbl[Sb + r] = rng.integers(0, pages, P)
        used += per
    kv_lens[Sb + NC] = max(1, C - used)      # filler
    cu[Sb + NC + 1] = Sb + C
    num_seqs = jnp.asarray([S], jnp.int32)

    import os as _os
    kwargs = {}
    if _os.environ.get("RP_BLK"):
        bkv, bq = _os.environ["RP_BLK"].split(",")
        kwargs = dict(num_kv_pages_per_block=int(bkv),
                      num_queries_per_block=int(bq))
    out = rpa(q, kv, jnp.asarray(kv_lens), jnp.asarray(page_tbl),
              jnp.asarray(cu[:S + 1]), num_seqs,
              sm_scale=hd ** -0.5, **kwargs)
    arr = np.asarray(out[:4, 0, :4])
    print("mixed rpa OK", arr.shape, float(np.abs(arr).sum()))

    # decode-only control
    cu2 = np.arange(S + 1, dtype=np.int32)
    out2 = rpa(q[:S], kv, jnp.asarray(np.maximum(kv_lens, 1)),
               jnp.asarray(page_tbl), jnp.asarray(cu2), num_seqs,
               sm_scale=hd ** -0.5)
    print("decode rpa OK", float(np.abs(np.asarray(out2[:4, 0, :4])).sum()))


if __name__ == "__main__":
    main()
