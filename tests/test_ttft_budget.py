"""TTFT budget policy (VERDICT r4 #3 latency work).

When any not-yet-started request has waited past llm_args.ttft_slo_ms,
decode windows dispatch at K/4 so prefill turnaround is bounded
(reference role: bench/benchmark/low_latency.py regime + ADP
waiting-room cap).
"""
import time

import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


def _model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=128, hidden_size=64,
                      intermediate_size=128, num_hidden_layers=2,
                      num_attention_heads=4, num_key_value_heads=2,
                      max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


def test_ttft_urgent_shrinks_window():
    llm = LLM(model=_model(), skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=160,
              max_num_tokens=256, decode_multi_step=8,
              ttft_slo_ms=1.0,    # aggressively tight: always urgent
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    ex = llm.executor
    assert ex.ttft_slo_ms == 1.0
    out = llm.generate_async(
        [3, 1, 4, 1, 5], SamplingParams(max_tokens=12, top_k=1,
                                        ignore_eos=True)).result(timeout=300)
    assert len(out.outputs[0].token_ids) == 12
    # at least the prefill-age iteration tripped the budget
    assert ex.ttft_shrunk_iters >= 1
    llm.shutdown()


def test_no_slo_keeps_full_window():
    llm = LLM(model=_model(), skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=160,
              max_num_tokens=256, decode_multi_step=8,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    ex = llm.executor
    out = llm.generate_async(
        [3, 1, 4, 1, 5], SamplingParams(max_tokens=12, top_k=1,
                                        ignore_eos=True)).result(timeout=300)
    assert len(out.outputs[0].token_ids) == 12
    assert ex._iter_K == ex.multi_step
    llm.shutdown()


def test_urgency_predicate():
    llm = LLM(model=_model(), skip_tokenizer_init=True, dtype="float32",
              max_batch_size=4, max_input_len=64, max_seq_len=160,
              max_num_tokens=256, decode_multi_step=8,
              ttft_slo_ms=60_000.0,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    ex = llm.executor
    assert not ex._ttft_urgent()        # nothing waiting
    out = llm.generate_async(
        [7, 7, 7], SamplingParams(max_tokens=4, top_k=1,
                                  ignore_eos=True)).result(timeout=300)
    assert len(out.outputs[0].token_ids) == 4
    assert ex._iter_K == ex.multi_step  # 60s budget never tripped
    llm.shutdown()
