#!/usr/bin/env python
"""Drive the ACTUAL mixed-window program at bench geometry, standalone.

Bisects the round-4 bench failure: builds the bench engine (TinyLlama
geometry, dummy weights), fabricates resourced gen rows + ctx riders,
and dispatches forward_multi_step with ctx_requests directly.

Args: [Sb] [C] [n_gen] [n_ctx]
"""
import sys
import pathlib
sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    Sb = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 256
    n_gen = int(sys.argv[3]) if len(sys.argv) > 3 else 48
    n_ctx = int(sys.argv[4]) if len(sys.argv) > 4 else 8

    from transformers import LlamaConfig
    from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
    import os
    n_layers = int(os.environ.get("MW_LAYERS", "22"))
    hidden = int(os.environ.get("MW_HIDDEN", "2048"))
    nq = int(os.environ.get("MW_HEADS", "16"))
    nkv = int(os.environ.get("MW_KV", "4"))
    vocab = int(os.environ.get("MW_VOCAB", "32000"))
    cfg = LlamaConfig(vocab_size=vocab, hidden_size=hidden,
                      intermediate_size=int(hidden * 2.75),
                      num_hidden_layers=n_layers,
                      num_attention_heads=nq, num_key_value_heads=nkv,
                      head_dim=128, max_position_embeddings=4096)
    mb = int(os.environ.get("MW_MB", "256"))
    K = int(os.environ.get("MW_K", "16"))
    llm = LLM(model=cfg, skip_tokenizer_init=True, max_batch_size=mb,
              max_input_len=136, max_seq_len=264, max_num_tokens=8192,
              load_format="dummy", decode_multi_step=K,
              mixed_window_ctx=C, enable_warmup=False,
              kv_cache_config=KvCacheConfig(tokens_per_block=32))
    eng = llm.engine
    print(f"# engine up pages={eng.num_kv_pages}", flush=True)

    from tensorrt_llm_tpu.runtime.request import LlmRequest
    from tensorrt_llm_tpu.runtime.scheduler import ScheduledRequests
    rng = np.random.default_rng(0)
    kv = llm.executor.kv
    gen, ctx = [], []
    for i in range(n_gen):
        r = LlmRequest(request_id=i,
                       prompt_token_ids=rng.integers(
                           1, vocab - 1, 128).tolist(),
                       sampling_params=SamplingParams(max_tokens=128,
                                                      top_k=1,
                                                      ignore_eos=True))
        r.seq_slot = i
        kv.add_sequence(r, enable_reuse=False)
        r.num_device_tokens = r.prompt_len
        r.host_token_override = 7
        kv.add_tokens(r, K)
        r.multi_step_budget = K
        gen.append(r)
    for j in range(n_ctx):
        r = LlmRequest(request_id=1000 + j,
                       prompt_token_ids=rng.integers(
                           1, vocab - 1, 128).tolist(),
                       sampling_params=SamplingParams(max_tokens=128,
                                                      top_k=1,
                                                      ignore_eos=True))
        r.seq_slot = n_gen + j
        kv.add_sequence(r, enable_reuse=False)
        r.context_chunk_size = r.context_len
        ctx.append(r)
    batch = ScheduledRequests(generation_requests=gen)

    import time
    import jax
    for it in range(6):
        t0 = time.monotonic()
        if it < 2:
            out = eng.forward_multi_step(batch, K)
            kind = "plain"
            toks = out[0]
        else:
            out = eng.forward_multi_step(batch, K, ctx_requests=ctx)
            kind = "mixed"
            toks = out[0]
            # reset ctx positions so every iteration carves again
            for r in ctx:
                r.context_current_position = 0
                r.state = type(r.state)(r.state)  # no-op, keep CONTEXT
        arr = np.asarray(jax.device_get(toks))
        print(f"# {kind} window it={it} {time.monotonic()-t0:.2f}s "
              f"tok0={arr[0, 0]}", flush=True)
    print("MIXED WINDOW PROBE OK", flush=True)
    llm.shutdown()


if __name__ == "__main__":
    main()
