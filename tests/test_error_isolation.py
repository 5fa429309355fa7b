"""Per-request error isolation + error budget (VERDICT r4 #4).

Reference semantics: _torch/pyexecutor/error_classification.py:44,72 —
a recoverable error fails only the implicated request(s); the
token-bucket budget promotes repeated/unrecoverable errors to fatal.
Here: a poison logits_processor mid-batch must fail ONLY its request
while every other in-flight request completes, and the executor loop
must stay alive for requests submitted afterwards.
"""
import numpy as np
import pytest

from tensorrt_llm_tpu import LLM, KvCacheConfig, SamplingParams
from tensorrt_llm_tpu.runtime.error_isolation import (
    ErrorBudget, RequestError, classify_error, explain_stage_oom)


def _model():
    import torch
    from transformers import LlamaConfig, LlamaForCausalLM
    torch.manual_seed(0)
    cfg = LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512)
    return LlamaForCausalLM(cfg).eval()


@pytest.fixture(scope="module")
def llm_sync():
    llm = LLM(model=_model(), skip_tokenizer_init=True, dtype="float32",
              max_batch_size=8, max_input_len=64, max_seq_len=160,
              max_num_tokens=256, disable_overlap_scheduler=True,
              kv_cache_config=KvCacheConfig(tokens_per_block=16,
                                            max_tokens=2048))
    yield llm
    llm.shutdown()


def _poison(*a, **kw):
    raise ValueError("poison processor")


def test_poison_request_mid_batch_isolated(llm_sync):
    """One poison request fails; the 5 others in the same batch finish."""
    prompts = [list(np.random.default_rng(i).integers(1, 127, size=8))
               for i in range(6)]
    futs = []
    for i, p in enumerate(prompts):
        sp = SamplingParams(max_tokens=6, top_k=1, ignore_eos=True,
                            logits_processor=_poison if i == 2 else None)
        futs.append(llm_sync.generate_async(p, sp))
    # poison request errors out with RequestError
    with pytest.raises(RequestError):
        futs[2].result(timeout=120)
    # everyone else completes normally
    for i, f in enumerate(futs):
        if i == 2:
            continue
        out = f.result(timeout=120)
        assert len(out.outputs[0].token_ids) == 6, f"request {i} broke"


def test_loop_survives_for_later_requests(llm_sync):
    """After a poison request, the executor still serves new work."""
    bad = llm_sync.generate_async(
        [1, 2, 3, 4], SamplingParams(max_tokens=4, top_k=1,
                                     ignore_eos=True,
                                     logits_processor=_poison))
    with pytest.raises(RequestError):
        bad.result(timeout=120)
    good = llm_sync.generate_async(
        [5, 6, 7, 8], SamplingParams(max_tokens=5, top_k=1,
                                     ignore_eos=True))
    out = good.result(timeout=120)
    assert len(out.outputs[0].token_ids) == 5
    # the poison request is fully evicted from the loop
    ex = llm_sync.executor
    assert all(r.request_id != bad.request_id for r in ex._active)


def test_slot_and_kv_released_on_abort(llm_sync):
    ex = llm_sync.executor
    free_blocks = ex.kv.get_num_free_blocks()
    free_slots = len(ex._free_slots)
    bad = llm_sync.generate_async(
        [9, 8, 7, 6, 5], SamplingParams(max_tokens=8, top_k=1,
                                        ignore_eos=True,
                                        logits_processor=_poison))
    with pytest.raises(RequestError):
        bad.result(timeout=120)
    # resources return to the pool (poll: release is loop-async)
    import time
    for _ in range(100):
        if (ex.kv.get_num_free_blocks() == free_blocks
                and len(ex._free_slots) == free_slots):
            break
        time.sleep(0.05)
    assert ex.kv.get_num_free_blocks() == free_blocks
    assert len(ex._free_slots) == free_slots


# ---------------------------------------------------------------- #
# unit: classification + budget semantics
# ---------------------------------------------------------------- #
def test_classify_error():
    assert classify_error("RESOURCE_EXHAUSTED: out of memory") == "severe"
    assert classify_error("XLA runtime error: dead") == "immediate_fatal"
    assert classify_error("ValueError: bad schema") == "transient"


def test_error_budget_token_bucket():
    b = ErrorBudget(budget=1.0, recovery_rate=0.1, cost=0.1)
    t = 100.0
    # ~10 transient errors at the same instant exhaust the bucket
    n = 0
    while not b.consume("boom", now=t):
        n += 1
        assert n < 20
    assert 9 <= n <= 11
    # error-free time refills
    b2 = ErrorBudget(budget=0.0, recovery_rate=0.5, cost=0.1)
    b2.last_error_time = 0.0
    assert not b2.consume("boom", now=10.0)   # refilled to 1.0 first


def test_budget_severe_costs_5x():
    b = ErrorBudget()
    t = 50.0
    for _ in range(2):
        assert not b.consume("cuda OOM: resource exhausted", now=t)
    assert b.consume("resource exhausted", now=t)


def test_budget_immediate_fatal_bypasses():
    b = ErrorBudget()
    assert b.consume("XLA runtime error: client terminated")


def test_explain_stage_oom():
    msg = explain_stage_oom("kv_pool", RuntimeError("RESOURCE_EXHAUSTED"))
    assert "KV-cache" in msg and "free_gpu_memory_fraction" in msg
