#!/usr/bin/env python
"""Anatomy of one steady K-step decode window at bench geometry.

Times engine.forward_multi_step (the bench hot path: K=16, Sb=256,
mid-decode kv_len ~192) under ablations selected by ANAT_MODE:

  base         full window (what the bench runs)
  nokv         write_kv patched to a no-op (isolates the KV-append scatter)
  noattn       attention patched to zeros (weights-only floor)
  noattn_nokv  both (pure matmul + sampling floor)

One process per mode (patches are trace-time). Prints ms/step and the
implied tok/s so the 44.7ms/step steady cost can be attributed between
weight reads, KV reads, and the scatter.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

MODE = os.environ.get("ANAT_MODE", "base")


def apply_patches():
    from tensorrt_llm_tpu.models import modeling_utils as mu
    if "nokv" in MODE:
        def write_kv_noop(kv_pages, k, v, slot_mapping, k_scale=None,
                          v_scale=None):
            return kv_pages
        mu.write_kv = write_kv_noop
    if "noattn" in MODE:
        def attn_noop(q, kv_pages, metadata, **kw):
            return q
        mu.ragged_paged_attention = attn_noop


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_anatomy_cache"))
    apply_patches()
    from transformers import LlamaConfig
    from tensorrt_llm_tpu.llmapi.llm_args import KvCacheConfig, LlmArgs
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest, LlmRequestState
    from tensorrt_llm_tpu.runtime.scheduler import ScheduledRequests
    from tensorrt_llm_tpu.sampling_params import SamplingParams
    import jax.numpy as jnp

    batch = int(os.environ.get("ANAT_BATCH", "256"))
    K = int(os.environ.get("ANAT_K", "16"))
    ctx = int(os.environ.get("ANAT_CTX", "184"))
    page = int(os.environ.get("ANAT_PAGE", "32"))
    backend = os.environ.get("ANAT_BACKEND", "auto")
    hf = LlamaConfig(vocab_size=32000, hidden_size=2048,
                     intermediate_size=5632, num_hidden_layers=22,
                     num_attention_heads=16, num_key_value_heads=4,
                     head_dim=128, max_position_embeddings=4096)
    args = LlmArgs(model="x", skip_tokenizer_init=True,
                   max_batch_size=batch, max_input_len=256,
                   max_seq_len=512, max_num_tokens=2048,
                   decode_multi_step=K,
                   kv_cache_config=KvCacheConfig(tokens_per_block=page))
    mc = ModelConfig(hf_config=hf, dtype=jnp.bfloat16, mapping=Mapping())
    model = get_model_class(hf.model_type)(mc)
    model.attn_backend = backend
    t0 = time.monotonic()
    params = model.init_params(jax.random.PRNGKey(0))
    engine = ModelEngine(model, params, args)
    print(f"# engine up in {time.monotonic()-t0:.1f}s "
          f"pages={engine.num_kv_pages} mode={MODE}", flush=True)

    from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
    kv = KVCacheManager(engine.num_kv_pages, engine.page_size)
    reqs = []
    for i in range(batch):
        r = LlmRequest(prompt_token_ids=list(np.random.randint(
            1, hf.vocab_size - 1, size=ctx)),
            sampling_params=SamplingParams(max_tokens=256, top_k=1,
                                           ignore_eos=True))
        kv.add_sequence(r)
        r.state = LlmRequestState.GENERATION_IN_PROGRESS
        r.num_device_tokens = r.prompt_len
        r.seq_slot = i
        r.multi_step_budget = K
        # pre-extend KV allocation to cover the window
        for _ in range(K + 2):
            r.output_token_ids.append(1)
            kv.add_token(r)
        reqs.append(r)
    sched = ScheduledRequests(generation_requests=reqs)

    def one_window():
        toks, lps, emitted = engine.forward_multi_step(sched, K)
        jax.block_until_ready(emitted)
        return emitted

    t0 = time.monotonic()
    em = one_window()
    print(f"# compile+run1 {time.monotonic()-t0:.1f}s "
          f"emitted_sum={int(np.asarray(em).sum())} (want {batch*K})",
          flush=True)
    times = []
    for _ in range(int(os.environ.get("ANAT_REPS", "5"))):
        t0 = time.monotonic()
        one_window()
        times.append(time.monotonic() - t0)
    best = min(times)
    ms_step = best * 1e3 / K
    print(f"ANATOMY mode={MODE} batch={batch} K={K} ctx={ctx} "
          f"page={page} backend={backend} "
          f"window={best*1e3:.1f}ms step={ms_step:.2f}ms "
          f"tok_s={batch/ms_step*1e3:.0f} "
          f"all={['%.1f' % (t*1e3) for t in times]}", flush=True)


if __name__ == "__main__":
    main()
