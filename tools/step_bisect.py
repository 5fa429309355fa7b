#!/usr/bin/env python
"""Bisect the decode step cost with CHAINED iterations.

On the tunneled axon backend ``block_until_ready`` does not actually wait
for device completion, so each measurement chains N dependent steps
(kv_pages output feeds the next input) and fetches one element at the end
— wall time / N is the true per-step device time.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np

N_CHAIN = 30


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
        slot_mapping=jnp.arange(T, dtype=jnp.int32),
        positions=jnp.zeros(T, jnp.int32),
        logits_indices=jnp.zeros(S, jnp.int32))

    def measure(name, fn, kv0):
        # chained: kv feeds forward; one fetch at the end
        k = kv0
        logits, k = fn(params, tokens, k, md)     # compile
        float(np.asarray(logits[0, 0]))           # true sync
        t0 = time.monotonic()
        for _ in range(N_CHAIN):
            logits, k = fn(params, tokens, k, md)
        float(np.asarray(logits[0, 0]))
        dt = (time.monotonic() - t0 - 0.04) / N_CHAIN * 1e3  # ~RTT comp
        print(f"{name}: {dt:.2f} ms/step", flush=True)
        return k

    full = jax.jit(lambda p, t, k, m: model.forward(p, t, k, m))
    measure("full forward", full, kv)

    import tensorrt_llm_tpu.models.modeling_utils as MU
    orig_attn = MU.ragged_paged_attention
    orig_write = MU.write_kv
    MU.ragged_paged_attention = lambda q, kvp, md, **kw: q
    model2 = get_model_class(hf.model_type)(mc)
    noattn = jax.jit(lambda p, t, k, m: model2.forward(p, t, k, m))
    measure("no-attention (kv write kept)", noattn, kv)
    MU.write_kv = lambda kvp, k, v, slots, **kw: kvp
    model3 = get_model_class(hf.model_type)(mc)
    nokv = jax.jit(lambda p, t, k, m: model3.forward(p, t, k, m))
    measure("no-attention no-kv-write", nokv, kv)
    MU.ragged_paged_attention = orig_attn
    MU.write_kv = orig_write

    # matmul-only floor
    eps = jnp.bfloat16(1e-3)

    def sweep(p, t, k, m):
        x = jnp.zeros((T, 2048), jnp.bfloat16) + eps

        def body(h, layer):
            q = h @ layer["q"]["weight"]
            kk = h @ layer["k"]["weight"]
            v = h @ layer["v"]["weight"]
            o = q @ layer["o"]["weight"]
            g = h @ layer["gate"]["weight"]
            u = h @ layer["up"]["weight"]
            d = (g * u) @ layer["down"]["weight"]
            return h + eps * (o + d) + eps * (jnp.sum(kk) + jnp.sum(v)), None

        sub = {n: p["layers"][n] for n in
               ("q", "k", "v", "o", "gate", "up", "down")}
        h, _ = jax.lax.scan(body, x, sub)
        logits = h[:S] @ p["lm_head"]["weight"]
        return logits, k

    measure("matmul sweep (incl lm_head)", jax.jit(sweep), kv)


if __name__ == "__main__":
    main()
