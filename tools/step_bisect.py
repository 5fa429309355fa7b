#!/usr/bin/env python
"""Bisect the decode step cost: full model vs no-attention vs matmul-only.

Identifies where the per-step time beyond the weight-read floor goes
(scan overhead, attention kernel, sampling, transfers).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np


def timed(f, *args, n=20):
    out = f(*args)
    import jax
    jax.block_until_ready(out)
    t0 = time.monotonic()
    for _ in range(n):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.monotonic() - t0) / n * 1e3


def main():
    import jax
    import jax.numpy as jnp
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    from transformers import LlamaConfig
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.ops.attention import AttentionMetadata

    hf = LlamaConfig(vocab_size=32000, hidden_size=2048,
                     intermediate_size=5632, num_hidden_layers=22,
                     num_attention_heads=16, num_key_value_heads=4,
                     head_dim=128, max_position_embeddings=4096)
    mc = ModelConfig(hf_config=hf, dtype=jnp.bfloat16, mapping=Mapping())
    model = get_model_class(hf.model_type)(mc)
    params = model.init_params(jax.random.PRNGKey(0))
    T, S, P, ps = 64, 32, 9, 32
    kv = model.make_kv_pages(320, ps)
    tokens = jnp.zeros(T, jnp.int32)
    md = AttentionMetadata(
        kv_lens=jnp.full((S,), 200, jnp.int32),
        page_indices=jnp.tile(jnp.arange(P, dtype=jnp.int32), (S, 1)),
        cu_q_lens=jnp.concatenate([jnp.zeros(1, jnp.int32),
                                   jnp.cumsum(jnp.full(S, 2, jnp.int32))]),
        num_seqs=jnp.asarray([S], jnp.int32),
        slot_mapping=jnp.full((T,), 320 * ps, jnp.int32),
        positions=jnp.zeros(T, jnp.int32),
        logits_indices=jnp.zeros(S, jnp.int32))

    fwd = jax.jit(lambda p, t, k, m: model.forward(p, t, k, m)[0])
    print(f"full forward: {timed(fwd, params, tokens, kv, md):.2f} ms",
          flush=True)

    # forward without attention: monkeypatch ragged attention to identity
    import tensorrt_llm_tpu.models.modeling_utils as MU
    orig = MU.ragged_paged_attention
    MU.ragged_paged_attention = lambda q, kvp, md, **kw: q
    fwd2 = jax.jit(lambda p, t, k, m: model.forward(p, t, k, m)[0])
    print(f"no-attention forward: {timed(fwd2, params, tokens, kv, md):.2f} ms",
          flush=True)
    MU.ragged_paged_attention = orig

    # raw weight-sweep matmul chain (the HBM floor): x @ every layer weight
    L = model.num_layers
    lw = params["layers"]

    def sweep(p, x):
        eps = jnp.bfloat16(1e-6)

        def body(h, layer):
            q = h @ layer["q"]["weight"]
            k = h @ layer["k"]["weight"]
            v = h @ layer["v"]["weight"]
            o = q @ layer["o"]["weight"]
            g = h @ layer["gate"]["weight"]
            u = h @ layer["up"]["weight"]
            d = (g * u) @ layer["down"]["weight"]
            h = h + eps * (o + d) + eps * (jnp.sum(k) + jnp.sum(v))
            return h, None

        layers = {k: v for k, v in p["layers"].items()
                  if k in ("q", "k", "v", "o", "gate", "up", "down")}
        h, _ = jax.lax.scan(body, x, layers)
        return h

    x = jnp.zeros((T, 2048), jnp.bfloat16)
    try:
        sw = jax.jit(sweep)
        print(f"matmul sweep: {timed(sw, params, x):.2f} ms", flush=True)
    except Exception as e:
        print("sweep failed:", str(e)[:200])


if __name__ == "__main__":
    main()
