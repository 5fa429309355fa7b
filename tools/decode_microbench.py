#!/usr/bin/env python
"""Decode-step latency breakdown on the current backend.

Measures, for a TinyLlama-geometry model at a given batch size:
  * host input-prep time (prepare_inputs)
  * jitted-step dispatch time (async, until jax returns)
  * end-to-end step latency (block_until_ready)
so we can attribute decode throughput between host loop, tunnel RTT and
device compute. Run on TPU: `python tools/decode_microbench.py`.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/jax_bench_cache"))
    from transformers import LlamaConfig
    from tensorrt_llm_tpu.llmapi.llm_args import KvCacheConfig, LlmArgs
    from tensorrt_llm_tpu.mapping import Mapping
    from tensorrt_llm_tpu.models import ModelConfig, get_model_class
    from tensorrt_llm_tpu.runtime.model_engine import ModelEngine
    from tensorrt_llm_tpu.runtime.request import LlmRequest, LlmRequestState
    from tensorrt_llm_tpu.runtime.scheduler import ScheduledRequests
    from tensorrt_llm_tpu.sampling_params import SamplingParams
    import jax.numpy as jnp

    batch = int(os.environ.get("MB_BATCH", "32"))
    tiny = os.environ.get("MB_TINY", "0") == "1"
    if tiny:
        hf = LlamaConfig(vocab_size=256, hidden_size=128,
                         intermediate_size=256, num_hidden_layers=2,
                         num_attention_heads=4, num_key_value_heads=2)
    else:
        hf = LlamaConfig(vocab_size=32000, hidden_size=2048,
                         intermediate_size=5632, num_hidden_layers=22,
                         num_attention_heads=16, num_key_value_heads=4,
                         head_dim=128, max_position_embeddings=4096)
    args = LlmArgs(model="x", skip_tokenizer_init=True,
                   max_batch_size=batch, max_input_len=256, max_seq_len=512,
                   max_num_tokens=2048,
                   kv_cache_config=KvCacheConfig(tokens_per_block=32))
    mc = ModelConfig(hf_config=hf, dtype=jnp.bfloat16, mapping=Mapping())
    model = get_model_class(hf.model_type)(mc)
    t0 = time.monotonic()
    params = model.init_params(jax.random.PRNGKey(0))
    engine = ModelEngine(model, params, args)
    print(f"engine up in {time.monotonic()-t0:.1f}s; "
          f"pages={engine.num_kv_pages}", flush=True)

    # fake a decode-only batch: `batch` requests mid-generation
    from tensorrt_llm_tpu.runtime.kv_cache_manager import KVCacheManager
    kv = KVCacheManager(engine.num_kv_pages, engine.page_size)
    reqs = []
    for i in range(batch):
        r = LlmRequest(prompt_token_ids=list(np.random.randint(
            1, hf.vocab_size - 1, size=128)),
            sampling_params=SamplingParams(max_tokens=1024, top_k=1,
                                           ignore_eos=True))
        kv.add_sequence(r)
        r.state = LlmRequestState.GENERATION_IN_PROGRESS
        r.num_device_tokens = r.prompt_len
        r.seq_slot = i
        reqs.append(r)
    sched = ScheduledRequests(generation_requests=reqs)

    def one_step():
        t_prep = time.monotonic()
        for r in reqs:
            r.output_token_ids.append(1)
            kv.add_token(r)
        inp_done = time.monotonic()
        toks, lps = engine.forward_step(sched)
        dispatch_done = time.monotonic()
        np.asarray(toks)
        done = time.monotonic()
        for r in reqs:
            r.num_device_tokens += 1
        return (inp_done - t_prep, dispatch_done - inp_done,
                done - dispatch_done)

    # warm compile
    one_step()
    one_step()
    N = 30
    host_t, disp_t, wait_t = 0.0, 0.0, 0.0
    t0 = time.monotonic()
    for _ in range(N):
        h, d, w = one_step()
        host_t += h
        disp_t += d
        wait_t += w
    total = time.monotonic() - t0
    print(f"per-step: host={host_t/N*1e3:.1f}ms "
          f"dispatch={disp_t/N*1e3:.1f}ms wait={wait_t/N*1e3:.1f}ms "
          f"total={total/N*1e3:.1f}ms "
          f"-> {batch * N / total:.0f} tok/s at bs={batch}", flush=True)

    # async pipelined rate (no per-step sync): closer to the overlap loop
    t0 = time.monotonic()
    out = None
    for _ in range(N):
        for r in reqs:
            r.output_token_ids.append(1)
            kv.add_token(r)
        out = engine.forward_step(sched)
        for r in reqs:
            r.num_device_tokens += 1
    np.asarray(out[0])
    total = time.monotonic() - t0
    print(f"pipelined: {total/N*1e3:.1f}ms/step -> "
          f"{batch * N / total:.0f} tok/s", flush=True)


if __name__ == "__main__":
    main()
