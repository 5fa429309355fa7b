"""Stress/soak paths (reference: hardening items — cancel storms,
KV-pool exhaustion/backpressure, allocator churn under reuse)."""
import random
import threading
import time

import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams


@pytest.fixture(scope="module")
def llm():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(vocab_size=64, hidden_size=64, intermediate_size=128,
                      num_hidden_layers=2, num_attention_heads=4,
                      num_key_value_heads=2, max_position_embeddings=512,
                      tie_word_embeddings=False)
    llm = LLM(model=LlamaForCausalLM(cfg).eval(),
              skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=128,
              max_num_tokens=256,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=1024))
    yield llm
    llm.shutdown()


def test_cancel_storm(llm):
    """Abort a random half of 24 in-flight requests mid-stream; the
    rest must complete normally and the pool must fully recover."""
    rng = random.Random(0)
    sp = SamplingParams(max_tokens=24, top_k=1, end_id=-1)
    futs = [llm.generate_async(
        [rng.randrange(2, 60) for _ in range(rng.randrange(4, 16))], sp)
        for _ in range(24)]
    time.sleep(0.3)
    doomed = set(rng.sample(range(24), 12))
    for i in doomed:
        llm.abort_request(futs[i].request_id)
    survivors = 0
    for i, f in enumerate(futs):
        if i in doomed:
            continue
        out = f.result(180)
        assert len(out.outputs[0].token_ids) > 0
        survivors += 1
    assert survivors == 12
    # pool fully recovers: a fresh full-size request succeeds
    out = llm.generate([5] * 32, SamplingParams(max_tokens=16, top_k=1,
                                                end_id=-1))
    assert len(out.outputs[0].token_ids) == 16


def test_kv_pool_backpressure(llm):
    """More concurrent tokens than the pool holds: requests must queue
    and ALL complete (capacity scheduler backpressure, not OOM)."""
    sp = SamplingParams(max_tokens=32, top_k=1, end_id=-1)
    futs = [llm.generate_async([3 + (i % 50)] * 40, sp)
            for i in range(24)]
    for f in futs:
        out = f.result(300)
        assert len(out.outputs[0].token_ids) == 32


def test_allocator_churn_with_reuse(llm):
    """Repeated alloc/free with shared prefixes: radix reuse must not
    leak blocks across 60 short generations."""
    sp = SamplingParams(max_tokens=4, top_k=1, end_id=-1)
    prefix = [7, 9, 11, 13, 15, 17, 19, 21]
    free0 = None
    for round_i in range(60):
        suffix = [23 + (round_i % 30)]
        out = llm.generate(prefix + suffix, sp)
        assert len(out.outputs[0].token_ids) == 4
        stats = llm.executor.stats_history[-1]
        if round_i == 5:
            free0 = stats.kv_cache_free_blocks
    # free-block count must not trend to zero (leak) — allow reuse
    # retention but demand at least half of the early-round free level
    assert stats.kv_cache_free_blocks >= (free0 or 1) // 2


def test_concurrent_submit_threads(llm):
    """8 threads submitting concurrently: the executor queue must
    serialize intake without deadlock or lost results."""
    sp = SamplingParams(max_tokens=6, top_k=1, end_id=-1)
    results = [None] * 8
    errors = []

    def worker(i):
        try:
            out = llm.generate([2 + i, 3 + i, 5 + i], sp)
            results[i] = out.outputs[0].token_ids
        except Exception as e:      # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(120)
    assert not errors
    assert all(r is not None and len(r) == 6 for r in results)
